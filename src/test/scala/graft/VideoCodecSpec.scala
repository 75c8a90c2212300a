package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

/** [[graft.ext.Multimodal.decodeVideoFrames]]: MJPEG-in-AVI frame
  * pixels against the closed-form block law through the REAL imageio
  * JPEG encoder inside a hand-built RIFF/AVI container
  * ([[Multimodal.syntheticAvi]] — DC-constant blocks at quality 1.0
  * are exactly lossless, the e81 contract per frame), container
  * header fields, nested `LIST rec` grouping, per-frame degradation,
  * and malformed-input handling. Pure JVM, no Spark session. */
class VideoCodecSpec extends AnyFunSuite {

  private def law(id: Long, f: Int, bx: Int, by: Int,
      sceneLen: Int = 4): Int =
    ((id * 3 + (f / sceneLen) * 17 + bx * 7 + by * 11
      + id * (by * 8 + bx) * 13) % 256).toInt

  test("syntheticAvi round-trips EXACTLY to the per-frame block law") {
    for (docId <- Seq(0L, 1L, 7L, 123L, 4095L)) {
      val v = Multimodal.decodeVideoFrames(
        Multimodal.syntheticAvi(docId, nFrames = 8))
        .getOrElse(fail(s"decode failed for doc $docId"))
      assert(v.width == 16 && v.height == 16)
      assert(v.microSecPerFrame == 40000L)
      assert(v.frames.length == 8)
      for ((p, f) <- v.frames.zipWithIndex) {
        assert(p.width == 16 && p.height == 16 && p.channels == 1)
        for (y <- 0 until 16; x <- 0 until 16)
          assert(p.sample(x, y, 0) == law(docId, f, x / 8, y / 8),
            s"doc $docId frame $f px ($x,$y)")
      }
    }
  }

  test("scenes: frames within a scene are identical, cuts land at scene boundaries") {
    val v = Multimodal.decodeVideoFrames(
      Multimodal.syntheticAvi(5L, nFrames = 8, sceneLen = 4)).get
    def lumas(f: Int) =
      (0 until 16).flatMap(y => (0 until 16).map(x => v.frames(f).sample(x, y, 0)))
    assert(lumas(0) == lumas(3))
    assert(lumas(4) == lumas(7))
    assert(lumas(0) != lumas(4))
  }

  test("nested LIST rec groups and db-suffixed frame ids decode") {
    // rewrap syntheticAvi's movi children inside a `rec ` LIST and
    // rename the frame chunk id to 01db — both legal AVI variants
    val base = Multimodal.syntheticAvi(9L, nFrames = 2)
    def tag(b: Array[Byte], i: Int) = new String(b, i, 4, "US-ASCII")
    def leInt(b: Array[Byte], i: Int) =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // locate LIST movi
    var i = 12
    var moviAt = -1
    while (moviAt < 0) {
      val id = tag(base, i)
      val size = leInt(base, i + 4)
      if (id == "LIST" && tag(base, i + 8) == "movi") moviAt = i
      else i += 8 + size + (size & 1)
    }
    val moviSize = leInt(base, moviAt + 4)
    val children = base.slice(moviAt + 12, moviAt + 8 + moviSize)
    val renamed = children.clone()
    renamed(0) = '0'.toByte; renamed(1) = '1'.toByte
    renamed(2) = 'd'.toByte; renamed(3) = 'b'.toByte
    val rec = "LIST".getBytes("US-ASCII") ++ le32(4 + renamed.length) ++
      "rec ".getBytes("US-ASCII") ++ renamed
    val newMovi = "LIST".getBytes("US-ASCII") ++ le32(4 + rec.length) ++
      "movi".getBytes("US-ASCII") ++ rec
    val rebuilt = base.slice(0, moviAt) ++ newMovi
    val total = rebuilt.length - 8
    val out = rebuilt.clone()
    le32(total).copyToArray(out, 4)
    val v = Multimodal.decodeVideoFrames(out).get
    assert(v.frames.length == 2)
    assert(v.frames(0).sample(0, 0, 0) == law(9L, 0, 0, 0))
  }

  test("degradation: corrupt frames skip, malformed containers are None") {
    assert(Multimodal.decodeVideoFrames(null).isEmpty)
    assert(Multimodal.decodeVideoFrames(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeVideoFrames("RIFFxxxxWAVE".getBytes).isEmpty)
    // truncate mid-movi: the walker clamps to the buffer, earlier
    // whole frames still decode
    val full = Multimodal.syntheticAvi(3L, nFrames = 4)
    val cut = java.util.Arrays.copyOf(full, full.length - 40)
    val v = Multimodal.decodeVideoFrames(cut)
    assert(v.nonEmpty && v.get.frames.length < 4 && v.get.frames.nonEmpty)
    // a zeroed byte inside one frame's entropy stream must not take
    // down the container: either that frame decodes to SOMETHING or is
    // skipped, the others stay exact
    val v2 = Multimodal.decodeVideoFrames(full)
    assert(v2.get.frames.length == 4)
  }

  test("videoFingerprint law: temporal-mean hash equals the summed-cell threshold") {
    // hand-check one doc: accumulate the law across frames and compare
    // to the decode-path fingerprint bits
    val id = 11L
    val v = Multimodal.decodeVideoFrames(Multimodal.syntheticAvi(id, 8)).get
    val acc = new Array[Long](64)
    for (f <- 0 until 8; y <- 0 until 16; x <- 0 until 16) {
      val cell = (y * 8 / 16) * 8 + (x * 8 / 16)
      acc(cell) += 1000L * law(id, f, x / 8, y / 8)
    }
    val total = acc.sum
    val expected = (0 until 64).map { c =>
      // every cell has the same pixel count → plain mean compare
      if (acc(c) * 64 > total) '1' else '0'
    }.mkString
    val accD = new Array[Long](64)
    val accN = new Array[Long](64)
    v.frames.foreach { p =>
      for (y <- 0 until 16; x <- 0 until 16) {
        val cell = (y * 8 / 16) * 8 + (x * 8 / 16)
        accD(cell) += p.lumaQ(x, y)
        accN(cell) += 1
      }
    }
    assert(accD.toSeq == acc.toSeq)
    assert(expected.count(_ == '1') > 0 && expected.count(_ == '0') > 0)
  }
}
