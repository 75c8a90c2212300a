package graft.codec

import java.io.{ByteArrayOutputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import graft.codec.HFileV3.HCell

/** The reference's WAL wire format ("PWAL") — a pure-JVM writer/reader
  * pair so graft's WAL flows (S9 source, D7 WALPlayer, D9 incremental
  * backup) can consume and produce a live cluster's actual log
  * segments, not just graft's parquet log.
  *
  * Layout (AbstractProtobufWALReader.java:73-76,216-247,
  * ProtobufLogWriter.java:142-159, WAL.proto:29-77,183):
  *  - "PWAL" magic, then a varint-delimited WALHeader proto
  *    (has_compression=1, has_tag_compression=3, writer_cls_name=4,
  *    cell_codec_cls_name=5).
  *  - Entries: varint-delimited WALKey proto (encoded_region_name=1,
  *    table_name=2, log_sequence_number=3, write_time=4, scopes=6,
  *    following_kv_count=7, cluster_ids=8, ...), then
  *    following_kv_count cells, each a 4-byte big-endian length +
  *    KeyValue bytes WITH tags (WALCellCodec.EnsureKvEncoder:
  *    `putInt(serializedSize(true)); cell.write(out, true)`;
  *    KeyValueUtil.createKeyValueFromInputStream).
  *  - Optional trailer: WALTrailer proto bytes (currently empty), a
  *    4-byte int = its serialized size, then "LAWP"
  *    (PB_WAL_COMPLETE_MAGIC). The reader derives walEditsStopOffset
  *    from the tail exactly like AbstractProtobufWALReader.
  *
  * Scope: plain, dictionary-compressed ([[WalCompression]]), and
  * encrypted (SecureProtobufLogWriter / SecureWALCellCodec — per-cell
  * AES-CTR frames under a trailer-style WrappedKey in header field 2,
  * [[HCrypto]]) segments, both sides; encryption and compression are
  * mutually exclusive like the reference. Unknown WALKey fields
  * (scopes, cluster_ids, extended attributes) are skipped by wire
  * type, so segments from a real cluster parse.
  */
object PWal {

  /** One WAL entry: a WALKey + its WALEdit's cells. */
  final case class WalEntry(
      region: Array[Byte], table: Array[Byte], seq: Long, writeTime: Long,
      cells: IndexedSeq[HCell])

  private val Magic = "PWAL".getBytes(StandardCharsets.US_ASCII)
  private val CompleteMagic = "LAWP".getBytes(StandardCharsets.US_ASCII)
  /** The reference reader whitelists writer class SIMPLE names — not
    * FQCNs (AbstractProtobufWALReader.java:85-87 builds the list from
    * `class.getSimpleName()`, and AbstractProtobufLogWriter
    * .getWriterClassName emits the short form for hbase-1.x compat) —
    * emit exactly those so a reference cluster accepts graft segments. */
  private val WriterClsName = "ProtobufLogWriter"
  private val SecureWriterClsName = "SecureProtobufLogWriter"
  private val CellCodecClsName = "org.apache.hadoop.hbase.regionserver.wal.WALCellCodec"
  private val SecureCellCodecClsName =
    "org.apache.hadoop.hbase.regionserver.wal.SecureWALCellCodec"

  // --- minimal protobuf wire helpers ---

  private def writeVarint(out: OutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def readVarint(bb: ByteBuffer): Long = {
    var v = 0L
    var shift = 0
    var b = 0
    do {
      b = bb.get() & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v
  }

  private def pbVarintField(out: OutputStream, field: Int, v: Long): Unit = {
    writeVarint(out, (field.toLong << 3) | 0)
    writeVarint(out, v)
  }

  private def pbBytesField(out: OutputStream, field: Int, v: Array[Byte]): Unit = {
    writeVarint(out, (field.toLong << 3) | 2)
    writeVarint(out, v.length.toLong)
    out.write(v, 0, v.length)
  }

  /** Skip one field of unknown semantics by wire type — how real
    * segments with scopes / cluster_ids / attributes stay parseable. */
  private def skipField(bb: ByteBuffer, wire: Int): Unit = wire match {
    case 0 => readVarint(bb)
    case 1 => bb.position(bb.position() + 8)
    case 2 => val len = readVarint(bb).toInt; bb.position(bb.position() + len)
    case 5 => bb.position(bb.position() + 4)
    case w => throw new IllegalArgumentException(s"bad pb wire type $w")
  }

  // --- writer ---

  /** Serialize `entries` as one complete PB WAL segment. Cells carry
    * their tag sections (raw, or dictionary-coded per
    * TagCompressionContext when `tagCompression` — the
    * hbase.regionserver.wal.tags.enablecompression twin, a sub-feature
    * of WAL compression with a segment-lifetime Short.MaxValue
    * dictionary); `withTrailer=false`
    * emulates an in-flight segment (writer crashed before close) —
    * the reader handles both. With `compressed=true` the segment uses
    * the reference's WAL dictionary compression ([[WalCompression]]):
    * WALKey region/table and every cell's row/family/qualifier code
    * through the shared LRU dictionaries
    * (WALCellCodec.CompressedKvEncoder). With `encryptSubject` set the
    * segment is a SecureProtobufLogWriter twin: WALHeader field 2
    * carries the per-segment data key wrapped under the subject's
    * master key (same WrappedKey proto as HFile trailers —
    * AbstractProtobufLogWriter.buildSecureWALHeader), the cell codec
    * becomes SecureWALCellCodec, and every cell is an independently
    * IV-framed AES-CTR unit; the reference does not compose WAL
    * encryption with dictionary compression
    * (AbstractProtobufWALReader.initWALCellCodec zeroes the
    * compression context when the secure codec is named) and neither
    * does graft. Returns the entry count. */
  def write(out: OutputStream, entries: Iterator[WalEntry],
      withTrailer: Boolean = true, compressed: Boolean = false,
      valueCompression: Int = 0,
      encryptSubject: Option[String] = None,
      tagCompression: Boolean = false): Long = {
    require(!tagCompression || compressed,
      "WAL tag compression is a sub-feature of WAL compression " +
        "(hbase.regionserver.wal.tags.enablecompression rides the context)")
    require(valueCompression == 0 || compressed,
      "WAL value compression is a sub-feature of WAL compression " +
        "(WALHeader.has_value_compression implies has_compression)")
    require(encryptSubject.isEmpty || !compressed,
      "WAL encryption does not compose with WAL compression " +
        "(AbstractProtobufWALReader forces compression off for the secure codec)")
    val secure: Option[(Array[Byte], Array[Byte])] = encryptSubject.map { _ =>
      val key = new Array[Byte](16)
      val iv = new Array[Byte](HCrypto.IvLength)
      val rnd = new java.security.SecureRandom()
      rnd.nextBytes(key); rnd.nextBytes(iv)
      (key, iv) // iv = the EncryptedKvEncoder ThreadLocal, advanced per cell
    }
    out.write(Magic)
    val hdr = new ByteArrayOutputStream()
    pbVarintField(hdr, 1, if (compressed) 1L else 0L)
    for ((key, _) <- secure)
      pbBytesField(hdr, 2, HCrypto.wrapKey(encryptSubject.get, key))
    pbVarintField(hdr, 3, if (tagCompression) 1L else 0L)
    pbBytesField(hdr, 4,
      (if (secure.isDefined) SecureWriterClsName else WriterClsName)
        .getBytes(StandardCharsets.UTF_8))
    pbBytesField(hdr, 5,
      (if (secure.isDefined) SecureCellCodecClsName else CellCodecClsName)
        .getBytes(StandardCharsets.UTF_8))
    if (valueCompression != 0) {
      pbVarintField(hdr, 6, 1L) // has_value_compression
      pbVarintField(hdr, 7, valueCompression.toLong)
    }
    writeVarint(out, hdr.size().toLong)
    hdr.writeTo(out)
    val ctx = if (compressed) new WalCompression.Ctx else null
    val valueComp =
      if (valueCompression != 0) new WalCompression.ValueCompressor(valueCompression)
      else null
    var n = 0L
    for (e <- entries) {
      val key = new ByteArrayOutputStream()
      if (compressed) {
        val rb = new ByteArrayOutputStream()
        WalCompression.writeCoded(rb, e.region, ctx.region)
        pbBytesField(key, 1, rb.toByteArray)
        val tb = new ByteArrayOutputStream()
        WalCompression.writeCoded(tb, e.table, ctx.table)
        pbBytesField(key, 2, tb.toByteArray)
      } else {
        pbBytesField(key, 1, e.region)
        pbBytesField(key, 2, e.table)
      }
      pbVarintField(key, 3, e.seq)
      pbVarintField(key, 4, e.writeTime)
      pbVarintField(key, 7, e.cells.size.toLong)
      writeVarint(out, key.size().toLong)
      key.writeTo(out)
      for (c <- e.cells) {
        if (secure.isDefined) {
          // SecureWALCellCodec.EncryptedKvEncoder.write: per-cell
          // [vint ivLen][iv][vint cipherLen][AES-CTR(plain body)],
          // body = vint keyLen / vint vLen / vint tagsLen, then
          // vint-len row / family / qualifier, 8B BE ts, type byte,
          // value (+ tags); IV advances 1 + cipherLen/16 per cell
          val (key, iv) = secure.get
          val body = new ByteArrayOutputStream()
          def vint(v: Int): Unit = {
            var x = v
            while ((x & ~0x7f) != 0) { body.write((x & 0x7f) | 0x80); x >>>= 7 }
            body.write(x)
          }
          val kLen = 2 + c.row.length + 1 + c.family.length + c.qualifier.length + 9
          vint(kLen)
          vint(c.value.length)
          vint(c.tags.length)
          vint(c.row.length); body.write(c.row, 0, c.row.length)
          vint(c.family.length); body.write(c.family, 0, c.family.length)
          vint(c.qualifier.length); body.write(c.qualifier, 0, c.qualifier.length)
          val tb = ByteBuffer.allocate(9)
          tb.putLong(c.ts)
          tb.put(c.typ)
          body.write(tb.array(), 0, 9)
          body.write(c.value, 0, c.value.length)
          if (c.tags.length > 0) body.write(c.tags, 0, c.tags.length)
          val cellIv = iv.clone()
          val cipher = HCrypto.ctr(key, cellIv, body.toByteArray)
          HCrypto.incrementIv(iv, 1 + cipher.length / 16)
          writeVarint(out, cellIv.length.toLong)
          out.write(cellIv)
          writeVarint(out, cipher.length.toLong)
          out.write(cipher, 0, cipher.length)
        } else if (compressed) {
          // CompressedKvEncoder: varint klen/vlen/tagslen, dict-coded
          // row/family/qualifier, 8B ts, type byte, raw value
          val cell = new ByteArrayOutputStream()
          def vint(v: Int): Unit = {
            var x = v
            while ((x & ~0x7f) != 0) { cell.write((x & 0x7f) | 0x80); x >>>= 7 }
            cell.write(x)
          }
          val kLen = 2 + c.row.length + 1 + c.family.length + c.qualifier.length + 9
          vint(kLen)
          vint(c.value.length)
          vint(c.tags.length)
          WalCompression.writeCoded(cell, c.row, ctx.row)
          WalCompression.writeCoded(cell, c.family, ctx.family)
          WalCompression.writeCoded(cell, c.qualifier, ctx.qualifier)
          val tb = ByteBuffer.allocate(9)
          tb.putLong(c.ts)
          tb.put(c.typ)
          cell.write(tb.array(), 0, 9)
          if (valueComp != null) {
            // writeCompressedValue: varint segment length + the bytes
            // the shared stream flushed for this value
            val seg = valueComp.compress(c.value)
            var x = seg.length
            while ((x & ~0x7f) != 0) { cell.write((x & 0x7f) | 0x80); x >>>= 7 }
            cell.write(x)
            cell.write(seg, 0, seg.length)
          } else {
            cell.write(c.value, 0, c.value.length)
          }
          if (c.tags.length > 0) {
            // CompressedKvEncoder:257 — dictionary-coded when the
            // header declares tag compression, raw section otherwise
            if (tagCompression)
              WalCompression.compressTagsSection(cell, c.tags, ctx.tags)
            else cell.write(c.tags, 0, c.tags.length)
          }
          cell.writeTo(out)
        } else {
          // KeyValue bytes, trailing [2B tagsLen][tags] iff tags exist
          val keyBytes = HFileV3.cellKeyBytes(c)
          val tagged = c.tags.length > 0
          val kvLen = 4 + 4 + keyBytes.length + c.value.length +
            (if (tagged) 2 + c.tags.length else 0)
          val bb = ByteBuffer.allocate(4 + kvLen)
          bb.putInt(kvLen)
          bb.putInt(keyBytes.length)
          bb.putInt(c.value.length)
          bb.put(keyBytes)
          bb.put(c.value)
          if (tagged) {
            bb.putShort(c.tags.length.toShort)
            bb.put(c.tags)
          }
          out.write(bb.array())
        }
      }
      n += 1
    }
    if (withTrailer) {
      // WALTrailer is an empty message: zero proto bytes, size int 0
      val t = ByteBuffer.allocate(4 + 4)
      t.putInt(0)
      t.put(CompleteMagic)
      out.write(t.array())
    }
    n
  }

  def writeBytes(entries: Iterator[WalEntry], withTrailer: Boolean = true): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    write(bos, entries, withTrailer)
    bos.toByteArray
  }

  /** [[writeBytes]] with the compression/encryption knobs exposed. */
  def writeBytes2(entries: Iterator[WalEntry], withTrailer: Boolean = true,
      compressed: Boolean = false, valueCompression: Int = 0,
      encryptSubject: Option[String] = None,
      tagCompression: Boolean = false): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    write(bos, entries, withTrailer, compressed, valueCompression,
      encryptSubject, tagCompression)
    bos.toByteArray
  }

  // --- reader ---

  /** Parse a complete segment held in `bytes`. Mirrors the reference's
    * open sequence: magic, WALHeader, trailer probe from the tail for
    * the edits stop offset, then WALKey+cells until that offset (or
    * clean EOF for a trailer-less in-flight segment). An encrypted
    * header (field 2) unwraps the per-segment data key under `subject`
    * and switches the cell decode to the SecureWALCellCodec frame;
    * like the reference, the secure codec forces the compression
    * context off (AbstractProtobufWALReader.initWALCellCodec). */
  def readBytes(bytes: Array[Byte],
      subject: String = HCrypto.DefaultSubject): Iterator[WalEntry] = {
    val bb = ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(java.util.Arrays.equals(magic, Magic),
      "not a PB WAL segment (bad PWAL magic)")
    // header
    val hdrLen = readVarint(bb).toInt
    val hdrEnd = bb.position() + hdrLen
    var compressed = false
    var tagCompressed = false
    var valueCompression = 0
    var hasValueCompression = false
    var dataKey: Option[Array[Byte]] = None
    while (bb.position() < hdrEnd) {
      val tag = readVarint(bb)
      val field = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      field match {
        case 1 => compressed = readVarint(bb) != 0L
        case 2 =>
          val len = readVarint(bb).toInt
          val wrapped = new Array[Byte](len)
          bb.get(wrapped)
          dataKey = Some(HCrypto.unwrapKey(subject, wrapped))
        case 3 => tagCompressed = readVarint(bb) != 0L
        case 6 => hasValueCompression = readVarint(bb) != 0L
        case 7 => valueCompression = readVarint(bb).toInt
        case _ => skipField(bb, wire)
      }
    }
    if (dataKey.isDefined) { // secure codec: no compression context
      compressed = false
      hasValueCompression = false
    }
    val ctx = if (compressed) new WalCompression.Ctx else null
    val valueDecomp =
      if (hasValueCompression) new WalCompression.ValueDecompressor(valueCompression)
      else null
    // trailer probe (AbstractProtobufWALReader.setTrailerIfPresent):
    // last 4 bytes LAWP, int before it = trailer size
    var stopOffset = bytes.length.toLong
    if (bytes.length >= hdrEnd + 8) {
      val tailMagic = java.util.Arrays.copyOfRange(bytes, bytes.length - 4, bytes.length)
      if (java.util.Arrays.equals(tailMagic, CompleteMagic)) {
        val tsz = ByteBuffer.wrap(bytes, bytes.length - 8, 4).getInt
        if (tsz >= 0 && bytes.length - 8L - tsz >= hdrEnd)
          stopOffset = bytes.length - 8L - tsz
      }
    }
    Iterator.continually {
      if (bb.position() >= stopOffset) None
      else {
        val keyLen = readVarint(bb).toInt
        val keyEnd = bb.position() + keyLen
        var region: Array[Byte] = Array.emptyByteArray
        var table: Array[Byte] = Array.emptyByteArray
        var seq = 0L
        var writeTime = 0L
        var kvCount = 0
        while (bb.position() < keyEnd) {
          val tag = readVarint(bb)
          val field = (tag >> 3).toInt
          val wire = (tag & 7).toInt
          (field, wire) match {
            case (1, 2) =>
              val len = readVarint(bb).toInt
              if (compressed) {
                val sub = bb.duplicate(); sub.limit(bb.position() + len)
                region = WalCompression.readCoded(sub, ctx.region)
                bb.position(bb.position() + len)
              } else {
                region = new Array[Byte](len); bb.get(region)
              }
            case (2, 2) =>
              val len = readVarint(bb).toInt
              if (compressed) {
                val sub = bb.duplicate(); sub.limit(bb.position() + len)
                table = WalCompression.readCoded(sub, ctx.table)
                bb.position(bb.position() + len)
              } else {
                table = new Array[Byte](len); bb.get(table)
              }
            case (3, 0) => seq = readVarint(bb)
            case (4, 0) => writeTime = readVarint(bb)
            case (7, 0) => kvCount = readVarint(bb).toInt
            case (6, 2) if compressed =>
              // scopes run their family through the SHARED FAMILY dict
              // (WALKeyImpl.java:542) — must parse, or the dictionaries
              // desynchronize after the first scope entry
              val len = readVarint(bb).toInt
              val end = bb.position() + len
              while (bb.position() < end) {
                val t2 = readVarint(bb)
                ((t2 >> 3).toInt, (t2 & 7).toInt) match {
                  case (1, 2) =>
                    val fl = readVarint(bb).toInt
                    val sub = bb.duplicate(); sub.limit(bb.position() + fl)
                    WalCompression.readCoded(sub, ctx.family)
                    bb.position(bb.position() + fl)
                  case (_, w) => skipField(bb, w)
                }
              }
            case (12, 2) if compressed =>
              // extended-attribute values go through the TABLE dict
              // (WALKeyImpl.java:550)
              val len = readVarint(bb).toInt
              val end = bb.position() + len
              while (bb.position() < end) {
                val t2 = readVarint(bb)
                ((t2 >> 3).toInt, (t2 & 7).toInt) match {
                  case (2, 2) =>
                    val vl = readVarint(bb).toInt
                    val sub = bb.duplicate(); sub.limit(bb.position() + vl)
                    WalCompression.readCoded(sub, ctx.table)
                    bb.position(bb.position() + vl)
                  case (_, w) => skipField(bb, w)
                }
              }
            case _ => skipField(bb, wire) // cluster_ids, …
          }
        }
        val cells = (0 until kvCount).map { _ =>
          if (dataKey.isDefined) {
            // SecureWALCellCodec.EncryptedKvDecoder.parseCell: read the
            // per-cell IV frame, decrypt, then parse the vint body
            val ivLen = readVarint(bb).toInt
            require(ivLen == HCrypto.IvLength,
              s"incorrect WAL cell IV length: expected ${HCrypto.IvLength}, have $ivLen")
            val iv = new Array[Byte](ivLen)
            bb.get(iv)
            val cipherLen = readVarint(bb).toInt
            val plain = HCrypto.ctr(dataKey.get, iv, bytes,
              bb.arrayOffset() + bb.position(), cipherLen)
            bb.position(bb.position() + cipherLen)
            val cb = ByteBuffer.wrap(plain)
            def vint(): Int = {
              var v = 0; var shift = 0; var b = 0
              do { b = cb.get() & 0xff; v |= (b & 0x7f) << shift; shift += 7 } while ((b & 0x80) != 0)
              v
            }
            vint() // key length (reconstructable)
            val vLen = vint()
            val tagsLen = vint()
            val row = new Array[Byte](vint()); cb.get(row)
            val fam = new Array[Byte](vint()); cb.get(fam)
            val qual = new Array[Byte](vint()); cb.get(qual)
            val ts = cb.getLong
            val typ = cb.get()
            val value = new Array[Byte](vLen); cb.get(value)
            val tags = new Array[Byte](tagsLen); cb.get(tags)
            HCell(row, fam, qual, ts, typ, value, tags = tags)
          } else if (compressed) {
            // CompressedKvDecoder (WALCellCodec.java:291-352)
            def vint(): Int = {
              var v = 0; var shift = 0; var b = 0
              do { b = bb.get() & 0xff; v |= (b & 0x7f) << shift; shift += 7 } while ((b & 0x80) != 0)
              v
            }
            vint() // key length (reconstructable; parsed for position only)
            val vLen = vint()
            val tagsLen = vint()
            val row = WalCompression.readCoded(bb, ctx.row)
            val fam = WalCompression.readCoded(bb, ctx.family)
            val qual = WalCompression.readCoded(bb, ctx.qualifier)
            val ts = bb.getLong
            val typ = bb.get()
            val value =
              if (valueDecomp != null) {
                // readCompressedValue: varint segment length, feed the
                // continuous stream, pull exactly vLen bytes
                val segLen = vint()
                valueDecomp.addSegment(bb.array(),
                  bb.arrayOffset() + bb.position(), segLen)
                bb.position(bb.position() + segLen)
                valueDecomp.read(vLen)
              } else {
                val v = new Array[Byte](vLen); bb.get(v); v
              }
            val tags =
              if (tagsLen == 0) Array.emptyByteArray
              else if (tagCompressed)
                WalCompression.uncompressTagsSection(bb, tagsLen, ctx.tags)
              else { val t = new Array[Byte](tagsLen); bb.get(t); t }
            HCell(row, fam, qual, ts, typ, value, tags = tags)
          } else {
            val kvLen = bb.getInt
            val kvEnd = bb.position() + kvLen
            val kLen = bb.getInt
            val vLen = bb.getInt
            val key = new Array[Byte](kLen); bb.get(key)
            val value = new Array[Byte](vLen); bb.get(value)
            var tags = Array.emptyByteArray
            if (bb.position() < kvEnd) {
              val tagsLen = bb.getShort & 0xffff // trailing tags section
              tags = new Array[Byte](tagsLen); bb.get(tags)
            }
            require(bb.position() == kvEnd, "KeyValue length mismatch")
            val kb = ByteBuffer.wrap(key)
            val rowLen = kb.getShort & 0xffff
            val row = new Array[Byte](rowLen); kb.get(row)
            val famLen = kb.get() & 0xff
            val fam = new Array[Byte](famLen); kb.get(fam)
            val qual = new Array[Byte](kLen - 2 - rowLen - 1 - famLen - 8 - 1)
            kb.get(qual)
            val ts = kb.getLong
            val typ = kb.get()
            HCell(row, fam, qual, ts, typ, value, tags = tags)
          }
        }
        Some(WalEntry(region, table, seq, writeTime, cells.toIndexedSeq))
      }
    }.takeWhile(_.isDefined).map(_.get)
  }
}
