package graft

import java.nio.charset.StandardCharsets.UTF_8

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.HFileV3
import graft.codec.HFileV3.HCell

/** Randomized roundtrip properties of the HFile v3 codec: arbitrary
  * cell content (unicode rows, empty/emoji values, empty qualifiers —
  * the DeleteFamily shape, extreme timestamps, every type code) across
  * random block sizes must decode bit-identically, and the structural
  * invariants (entry count, index coverage, trailer offsets) must hold
  * for every generated file. Seeded — deterministic. Pure JVM.
  */
class HFilePropertySpec extends AnyFunSuite {

  private val rnd = new Random(20260814)

  private val alphabets = Array(
    "abcdefgh", "日本語テキスト", "πρστυφ", "x", "émoji🙂", "0123456789")

  private def randomString(maxLen: Int): String = {
    val a = alphabets(rnd.nextInt(alphabets.length))
    (0 until rnd.nextInt(maxLen + 1)).map(_ => a(rnd.nextInt(a.length))).mkString
  }

  private val types = Seq(HFileV3.TypePut, HFileV3.TypeDelete,
    HFileV3.TypeDeleteFamilyVersion, HFileV3.TypeDeleteColumn,
    HFileV3.TypeDeleteFamily)

  private def randomCells(n: Int): Seq[HCell] =
    (0 until n).map { _ =>
      val ts = rnd.nextInt(5) match {
        case 0 => Long.MaxValue - rnd.nextInt(3)
        case 1 => 0L
        case _ => rnd.nextLong().abs % 1000000L
      }
      HCell(
        (randomString(12) + rnd.nextInt(100)).getBytes(UTF_8),
        randomString(3).getBytes(UTF_8),
        randomString(8).getBytes(UTF_8), // may be empty (DeleteFamily shape)
        ts,
        types(rnd.nextInt(types.length)),
        randomString(50).getBytes(UTF_8))
    }.distinctBy(c => (new String(c.row, UTF_8), new String(c.family, UTF_8),
      new String(c.qualifier, UTF_8), c.ts, c.typ))
      .sortWith((a, b) => HFileV3.compareCells(a, b) < 0)

  test("random files roundtrip bit-identically across block sizes") {
    for (trial <- 0 until 25) {
      val cells = randomCells(1 + rnd.nextInt(300))
      val blockSize = Seq(1, 64, 512, 4096, 65536)(rnd.nextInt(5))
      val bytes = HFileV3.writeBytes(cells.iterator, blockSize)
      val back = HFileV3.readCells(bytes).toSeq
      assert(back.size == cells.size, s"trial $trial count")
      cells.zip(back).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a.row, b.row), s"trial $trial row")
        assert(java.util.Arrays.equals(a.family, b.family), s"trial $trial fam")
        assert(java.util.Arrays.equals(a.qualifier, b.qualifier), s"trial $trial qual")
        assert(a.ts == b.ts && a.typ == b.typ, s"trial $trial ts/type")
        assert(java.util.Arrays.equals(a.value, b.value), s"trial $trial value")
      }
      // structural invariants on every generated file
      val trailer = HFileV3.readTrailer(bytes)
      assert(trailer.entryCount == cells.size.toLong)
      val idx = HFileV3.readRootIndex(bytes, trailer)
      assert(idx.size == trailer.dataIndexCount)
      val dataBlocks = HFileV3.readAllBlocks(bytes).filter(_.magic == "DATABLK*")
      assert(idx.map(_._1) == dataBlocks.map(_.offset),
        s"trial $trial index offsets must cover exactly the data blocks")
      assert(trailer.loadOnOpenOffset > trailer.lastDataBlockOffset)
      assert(trailer.fileInfoOffset > trailer.loadOnOpenOffset)
    }
  }

  test("single-byte corruption anywhere in the scanned section is detected") {
    val cells = randomCells(120)
    val bytes = HFileV3.writeBytes(cells.iterator, blockSize = 256)
    val end = HFileV3.readTrailer(bytes).loadOnOpenOffset.toInt
    for (_ <- 0 until 20) {
      val pos = rnd.nextInt(end)
      val corrupted = bytes.clone()
      corrupted(pos) = (corrupted(pos) ^ (1 + rnd.nextInt(255))).toByte
      // either the checksum rejects it, or (if the flip lands in a
      // size/len field before checksum verification) parsing fails —
      // silent acceptance is the only failure
      val outcome = scala.util.Try(HFileV3.readCells(corrupted).toSeq)
      outcome match {
        case scala.util.Success(got) =>
          fail(s"corruption at $pos silently accepted (${got.size} cells)")
        case scala.util.Failure(_) => // detected
      }
    }
  }
}
