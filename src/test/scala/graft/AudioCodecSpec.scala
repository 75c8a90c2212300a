package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

/** [[graft.ext.Multimodal.decodeAudio]]: sample equality against the
  * closed-form law through the REAL javax.sound.sampled WAVE
  * encoder/decoder pair ([[Multimodal.syntheticWav]] — PCM-in-WAV is
  * lossless, the e59/e81 contract for sound), 8-bit and big-endian
  * variants, hand-computable step/sine-like feature fixtures, and
  * malformed-input degradation. Pure JVM, no Spark session. */
class AudioCodecSpec extends AnyFunSuite {

  private def law(id: Long, c: Int, t: Int): Int =
    (((id * 7919 + c * 104729L + t.toLong * 31337 + id * t * 271) % 65536)
      - 32768).toInt

  test("syntheticWav round-trips EXACTLY to the closed-form sample law") {
    for (docId <- Seq(0L, 1L, 7L, 123L, 4095L)) {
      val channels = 1 + (docId % 2).toInt
      val a = Multimodal.decodeAudio(
        Multimodal.syntheticWav(docId, nSamples = 512, channels = channels))
        .getOrElse(fail(s"decode failed for doc $docId"))
      assert(a.sampleRate == 8000 && a.channels == channels)
      assert(a.samples.forall(_.length == 512))
      for (c <- 0 until channels; t <- 0 until 512)
        assert(a.samples(c)(t) == law(docId, c, t),
          s"doc $docId ch $c t $t")
    }
  }

  private def encodeWav(samples: Array[Array[Int]], bits: Int,
      signed: Boolean, bigEndian: Boolean, rate: Int = 8000): Array[Byte] = {
    val ch = samples.length
    val n = samples(0).length
    val bps = bits / 8
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, bits, ch, signed, bigEndian)
    val data = new Array[Byte](n * ch * bps)
    for (t <- 0 until n; c <- 0 until ch) {
      val off = (t * ch + c) * bps
      val v = samples(c)(t)
      if (bits == 8) {
        data(off) = (if (signed) v else v + 128).toByte
      } else {
        val raw = if (signed) v else v + 32768
        if (bigEndian) {
          data(off) = ((raw >> 8) & 0xff).toByte
          data(off + 1) = (raw & 0xff).toByte
        } else {
          data(off) = (raw & 0xff).toByte
          data(off + 1) = ((raw >> 8) & 0xff).toByte
        }
      }
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  test("8-bit PCM decodes centered on zero") {
    val s = Array(Array(-128, -1, 0, 1, 127, 64, -64))
    val a = Multimodal.decodeAudio(encodeWav(s, bits = 8, signed = true,
      bigEndian = false)).getOrElse(fail("8-bit decode failed"))
    assert(a.channels == 1 && a.samples(0).toSeq == s(0).toSeq)
  }

  test("16-bit big-endian PCM decodes to the same samples") {
    val s = Array(Array(-32768, -1, 0, 1, 32767, 12345, -12345),
      Array(5, -5, 100, -100, 0, 32767, -32768))
    val a = Multimodal.decodeAudio(encodeWav(s, bits = 16, signed = true,
      bigEndian = true)).getOrElse(fail("BE decode failed"))
    assert(a.channels == 2)
    assert(a.samples(0).toSeq == s(0).toSeq)
    assert(a.samples(1).toSeq == s(1).toSeq)
  }

  test("feature math on a hand-built step signal") {
    // step: 4 samples at +100 then 4 at -100 → one sign transition,
    // energy 8·10000, peak 100
    val step = Array(Array(100, 100, 100, 100, -100, -100, -100, -100))
    val blob = encodeWav(step, bits = 16, signed = true, bigEndian = false)
    val a = Multimodal.decodeAudio(blob).get
    val s = a.samples(0)
    var energy = 0L; var zc = 0
    for (t <- s.indices) {
      energy += s(t).toLong * s(t)
      if (t > 0 && ((s(t) >= 0) != (s(t - 1) >= 0))) zc += 1
    }
    assert(energy == 8L * 10000 && zc == 1 && s.map(math.abs).max == 100)
  }

  test("malformed and non-audio payloads degrade to None") {
    assert(Multimodal.decodeAudio(null).isEmpty)
    assert(Multimodal.decodeAudio(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeAudio("not a wav at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(
      Multimodal.syntheticPng(7L)).isEmpty) // a PNG is not audio
    // a truncated WAV header (magic only) must not throw
    assert(Multimodal.decodeAudio(
      Multimodal.syntheticWav(1L).take(20)).isEmpty)
  }

  test("audio fingerprint: re-uploads collide, window energies drive bits") {
    val a = Multimodal.decodeAudio(
      Multimodal.syntheticWav(6L, channels = 1)).get
    val b = Multimodal.decodeAudio(
      Multimodal.syntheticWav(6L, channels = 1)).get
    assert(Multimodal.audioFingerprintBits(a.samples(0)) ==
      Multimodal.audioFingerprintBits(b.samples(0)))
    val c = Multimodal.decodeAudio(
      Multimodal.syntheticWav(7L, channels = 1)).get
    assert(Multimodal.audioFingerprintBits(a.samples(0)) !=
      Multimodal.audioFingerprintBits(c.samples(0)))
    assert(Multimodal.audioFingerprintBits(new Array[Int](63)).isEmpty)
    // hand-built: 64 one-sample windows, one loud — exactly one 1-bit
    val hand = new Array[Int](64)
    hand(5) = 100
    val f = Multimodal.audioFingerprintBits(hand).get
    assert(f.length == 64 && f.count(_ == '1') == 1 && f(5) == '1')
  }

  test("decodeAudio agrees with parseAudioHeader metadata") {
    val blob = Multimodal.syntheticWav(42L, nSamples = 256, channels = 2,
      sampleRate = 16000)
    val meta = Multimodal.parseAudioHeader(blob).get
    val a = Multimodal.decodeAudio(blob).get
    assert(meta.sampleRate == a.sampleRate && meta.channels == a.channels)
    assert(meta.dataBytes == 256L * 2 * 2)
    assert(meta.bitsPerSample == 16)
  }
}
