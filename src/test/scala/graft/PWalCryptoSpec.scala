package graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{HFileV3, PWal}
import graft.codec.HFileV3.HCell
import graft.codec.PWal.WalEntry

/** Encrypted WAL segment contract (SecureProtobufLogWriter /
  * SecureWALCellCodec parity in [[graft.codec.PWal]]): per-cell
  * AES-CTR frames under a header-wrapped per-segment data key,
  * ciphertext opacity, wrong-subject failure at open, the
  * no-composition-with-compression rule, and the reference reader's
  * writer-class SIMPLE-NAME whitelist
  * (AbstractProtobufWALReader.java:85-87).
  */
class PWalCryptoSpec extends AnyFunSuite {

  private def cell(row: String, qual: String, v: String, ts: Long = 1L,
      typ: Byte = HFileV3.TypePut): HCell =
    HCell(row.getBytes(UTF_8), "d".getBytes(UTF_8), qual.getBytes(UTF_8),
      ts, typ, v.getBytes(UTF_8))

  private val rnd = new scala.util.Random(29)

  private def entries(n: Int, marker: String = ""): Seq[WalEntry] =
    (0 until n).map { i =>
      val cells = (0 to rnd.nextInt(3)).map { j =>
        cell(f"row-$i%05d", s"q$j",
          marker + rnd.alphanumeric.take(rnd.nextInt(30)).mkString,
          ts = 1000L + i,
          typ = if (rnd.nextInt(10) == 0) HFileV3.TypeDeleteColumn else HFileV3.TypePut)
      }
      WalEntry("r0".getBytes(UTF_8), "tbl".getBytes(UTF_8),
        seq = 100L + i, writeTime = 1000L + i, cells.toIndexedSeq)
    }

  private def assertSameEntries(got: Seq[WalEntry], want: Seq[WalEntry]): Unit = {
    assert(got.size == want.size)
    got.zip(want).foreach { case (b, a) =>
      assert(java.util.Arrays.equals(a.region, b.region))
      assert(java.util.Arrays.equals(a.table, b.table))
      assert(a.seq == b.seq && a.writeTime == b.writeTime)
      assert(a.cells.size == b.cells.size)
      a.cells.zip(b.cells).foreach { case (x, y) =>
        assert(java.util.Arrays.equals(x.row, y.row))
        assert(java.util.Arrays.equals(x.family, y.family))
        assert(java.util.Arrays.equals(x.qualifier, y.qualifier))
        assert(x.ts == y.ts && x.typ == y.typ)
        assert(java.util.Arrays.equals(x.value, y.value))
      }
    }
  }

  /** Parse WALHeader string fields (writer cls = 4, codec cls = 5). */
  private def headerStrings(bytes: Array[Byte]): Map[Int, String] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.position(4) // PWAL
    def varint(): Long = {
      var v = 0L; var s = 0; var b = 0
      do { b = bb.get() & 0xff; v |= (b & 0x7fL) << s; s += 7 } while ((b & 0x80) != 0)
      v
    }
    val end = varint().toInt + bb.position()
    val out = scala.collection.mutable.Map.empty[Int, String]
    while (bb.position() < end) {
      val tag = varint()
      val field = (tag >> 3).toInt
      (tag & 7).toInt match {
        case 0 => varint()
        case 2 =>
          val len = varint().toInt
          val b = new Array[Byte](len); bb.get(b)
          if (field == 4 || field == 5) out(field) = new String(b, UTF_8)
        case w => fail(s"unexpected wire type $w")
      }
    }
    out.toMap
  }

  test("encrypted roundtrip, with and without trailer") {
    val es = entries(120)
    for (trailer <- Seq(true, false)) {
      val bytes = PWal.writeBytes2(es.iterator, withTrailer = trailer,
        encryptSubject = Some("graft"))
      assertSameEntries(PWal.readBytes(bytes).toSeq, es)
    }
  }

  test("header declares the secure writer/codec by the reference's names") {
    // the reader whitelist holds class SIMPLE names (ImmutableList.of(
    // ProtobufLogWriter.class.getSimpleName(), ..., "SecureProtobufLogWriter"))
    // — an FQCN writer_cls_name would be rejected with "Got unknown
    // writer class" by a real cluster's reader
    val plain = PWal.writeBytes(entries(2).iterator)
    assert(headerStrings(plain)(4) == "ProtobufLogWriter")
    assert(headerStrings(plain)(5) ==
      "org.apache.hadoop.hbase.regionserver.wal.WALCellCodec")
    val enc = PWal.writeBytes2(entries(2).iterator, encryptSubject = Some("graft"))
    assert(headerStrings(enc)(4) == "SecureProtobufLogWriter")
    assert(headerStrings(enc)(5) ==
      "org.apache.hadoop.hbase.regionserver.wal.SecureWALCellCodec")
  }

  test("ciphertext opacity: values and row keys never appear on the wire") {
    val marker = "TOPSECRETWALPAYLOAD"
    val es = entries(60, marker = marker)
    val plain = PWal.writeBytes(es.iterator)
    val enc = PWal.writeBytes2(es.iterator, encryptSubject = Some("graft"))
    def contains(hay: Array[Byte], needle: Array[Byte]): Boolean =
      hay.indices.exists(i => i + needle.length <= hay.length &&
        java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(hay, i, i + needle.length), needle))
    assert(contains(plain, marker.getBytes(UTF_8)), "sanity: plain leaks")
    assert(!contains(enc, marker.getBytes(UTF_8)), "encrypted must not leak values")
    assert(!contains(enc, "row-00000".getBytes(UTF_8)),
      "encrypted must not leak row keys")
    // WALKey stays plaintext (the reference encrypts WALEdits, not keys)
    assert(contains(enc, "tbl".getBytes(UTF_8)))
  }

  test("per-cell IVs are distinct (fresh CTR stream per cell)") {
    // two cells with identical plaintext must not produce identical
    // ciphertext frames — the encoder advances the IV per cell
    val es = Seq(WalEntry("r0".getBytes(UTF_8), "tbl".getBytes(UTF_8), 1L, 1L,
      IndexedSeq(cell("same", "q", "samevalue"), cell("same", "q", "samevalue"))))
    val enc = PWal.writeBytes2(es.iterator, encryptSubject = Some("graft"))
    // parse out the two cell frames: skip header + WALKey, then
    // [vint ivLen][iv][vint len][cipher] twice
    val bb = ByteBuffer.wrap(enc)
    bb.position(4)
    def varint(): Int = {
      var v = 0; var s = 0; var b = 0
      do { b = bb.get() & 0xff; v |= (b & 0x7f) << s; s += 7 } while ((b & 0x80) != 0)
      v
    }
    val hdrLen = varint(); bb.position(bb.position() + hdrLen)
    val keyLen = varint(); bb.position(bb.position() + keyLen)
    def frame(): (Array[Byte], Array[Byte]) = {
      val iv = new Array[Byte](varint()); bb.get(iv)
      val ct = new Array[Byte](varint()); bb.get(ct)
      (iv, ct)
    }
    val (iv1, ct1) = frame()
    val (iv2, ct2) = frame()
    assert(!java.util.Arrays.equals(iv1, iv2), "IV must advance per cell")
    assert(!java.util.Arrays.equals(ct1, ct2),
      "identical plaintext cells must encrypt differently")
  }

  test("wrong subject fails the key hash at open, not as garbage cells") {
    val bytes = PWal.writeBytes2(entries(5).iterator, encryptSubject = Some("graft"))
    val e = intercept[IllegalArgumentException] {
      PWal.readBytes(bytes, subject = "mallory").toSeq
    }
    assert(e.getMessage.contains("hash mismatch"))
  }

  test("encryption does not compose with dictionary compression") {
    assertThrows[IllegalArgumentException] {
      PWal.writeBytes2(entries(2).iterator, compressed = true,
        encryptSubject = Some("graft"))
    }
  }
}
