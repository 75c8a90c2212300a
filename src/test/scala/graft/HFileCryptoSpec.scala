package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{BlockEncoding, HCrypto, HFileV3}
import graft.codec.HFileV3.HCell

/** HFile transparent-encryption contract ([[graft.codec.HCrypto]]):
  * WrappedKey wrap/unwrap with hash verification, encrypted-block
  * roundtrips across every compression/encoding composition,
  * ciphertext opacity, tamper detection through the checksum layer,
  * and the point-get path against fully-encrypted files (index and
  * bloom blocks are encrypted too, like the reference's generic
  * block-writer path).
  */
class HFileCryptoSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(11)

  private def cell(row: String, qual: String, v: String, ts: Long = 1L): HCell =
    HCell(row.getBytes(UTF_8), "d".getBytes(UTF_8), qual.getBytes(UTF_8),
      ts, HFileV3.TypePut, v.getBytes(UTF_8))

  private def randomCells(n: Int, marker: String = ""): Seq[HCell] =
    (0 until n).map { i =>
      cell(f"row-${rnd.nextInt(1000)}%04d", s"q${rnd.nextInt(5)}",
        marker + rnd.alphanumeric.take(20).mkString, 1 + rnd.nextInt(5).toLong)
    }.sortWith((a, b) => HFileV3.compareCells(a, b) < 0)

  private val ctx = HCrypto.Ctx("graft", (1 to 16).map(_.toByte).toArray)

  private def writeEnc(cells: Seq[HCell], compression: Int = HFileV3.CompressionNone,
      encoding: Int = 0, blockSize: Int = 512,
      rowColBloom: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    HFileV3.write(bos, cells.iterator, blockSize = blockSize,
      compression = compression, encoding = encoding,
      rowColBloom = rowColBloom, encryption = Some(ctx))
    bos.toByteArray
  }

  private def assertSameCells(a: Seq[HCell], b: Seq[HCell]): Unit = {
    assert(a.size == b.size)
    a.zip(b).foreach { case (x, y) =>
      assert(new String(x.row, UTF_8) == new String(y.row, UTF_8))
      assert(new String(x.qualifier, UTF_8) == new String(y.qualifier, UTF_8))
      assert(x.ts == y.ts && x.typ == y.typ)
      assert(new String(x.value, UTF_8) == new String(y.value, UTF_8))
    }
  }

  test("WrappedKey wrap/unwrap roundtrip; wrong subject fails the key hash") {
    val key = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
    val wrapped = HCrypto.wrapKey("alice", key)
    assert(java.util.Arrays.equals(HCrypto.unwrapKey("alice", wrapped), key))
    // random wrap IV: two wraps of the same key differ on the wire
    assert(!java.util.Arrays.equals(wrapped, HCrypto.wrapKey("alice", key)))
    val e = intercept[IllegalArgumentException] {
      HCrypto.unwrapKey("mallory", wrapped)
    }
    assert(e.getMessage.contains("hash mismatch"))
  }

  test("encrypted roundtrip across compression x encoding compositions") {
    val cells = randomCells(400)
    for ((comp, enc) <- Seq(
        (HFileV3.CompressionNone, 0),
        (HFileV3.CompressionGz, 0),
        (HFileV3.CompressionZstd, 0),
        (HFileV3.CompressionZstd, BlockEncoding.IdFastDiff),
        (HFileV3.CompressionLz4, BlockEncoding.IdPrefix))) {
      val bytes = writeEnc(cells, comp, enc)
      val back = HFileV3.readCells(bytes).toSeq
      assertSameCells(cells, back)
    }
  }

  test("trailer carries the wrapped key; plaintext file does not") {
    val cells = randomCells(50)
    val enc = writeEnc(cells)
    assert(HFileV3.readTrailer(enc).encryptionKey.isDefined)
    val plain = HFileV3.writeBytes(cells.iterator, blockSize = 512)
    assert(HFileV3.readTrailer(plain).encryptionKey.isEmpty)
  }

  test("ciphertext opacity: the marker value never appears in encrypted bytes") {
    val marker = "TOPSECRETPAYLOADMARKER"
    val cells = randomCells(200, marker = marker)
    val plain = HFileV3.writeBytes(cells.iterator, blockSize = 512)
    val enc = writeEnc(cells)
    def contains(hay: Array[Byte], needle: Array[Byte]): Boolean =
      hay.indices.exists(i => i + needle.length <= hay.length &&
        java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(hay, i, i + needle.length), needle))
    val needle = marker.getBytes(UTF_8)
    assert(contains(plain, needle), "sanity: plaintext file holds the marker")
    assert(!contains(enc, needle), "encrypted file must not leak plaintext")
    // row keys live in data + index blocks — both must be opaque too
    val rowNeedle = cells.head.row
    assert(!contains(enc, rowNeedle), "encrypted file must not leak row keys")
  }

  test("a flipped ciphertext byte fails the checksum before decryption") {
    val cells = randomCells(100)
    val bytes = writeEnc(cells)
    // flip one byte inside the first data block's payload (after the
    // 33-byte header + 1 iv-length byte + 16 iv bytes)
    val tampered = bytes.clone()
    tampered(33 + 17 + 5) = (tampered(33 + 17 + 5) ^ 0x5a).toByte
    val e = intercept[IllegalStateException] {
      HFileV3.readCells(tampered).toSeq
    }
    assert(e.getMessage.contains("checksum mismatch"))
  }

  test("point gets descend encrypted index and bloom blocks") {
    val cells = (0 until 300).map(i =>
      cell(f"k$i%05d", "q0", s"v$i", 1L))
    val bytes = writeEnc(cells, blockSize = 256, rowColBloom = true)
    val handle = new HFileV3.HFileHandle(
      (off, len) => java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len),
      bytes.length.toLong)
    val hit = handle.get("k00042".getBytes(UTF_8), "q0".getBytes(UTF_8))
    assert(hit.size == 1 && new String(hit.head.value, UTF_8) == "v42")
    assert(handle.get("k99999".getBytes(UTF_8)).isEmpty)
    // absent qualifier on a present row: ROWCOL bloom reject
    assert(handle.get("k00042".getBytes(UTF_8), "zz".getBytes(UTF_8)).isEmpty)
  }

  test("wrong master key fails loudly at open, not as garbage cells") {
    val cells = randomCells(50)
    val bytes = writeEnc(cells)
    val e = intercept[IllegalArgumentException] {
      HFileV3.readCells(bytes, subject = "wrong-subject").toSeq
    }
    assert(e.getMessage.contains("hash mismatch"))
  }
}
