package graft.codec

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import graft.codec.HFileV3.HCell

/** HFile data-block encodings — the reference's in-block key
  * compression formats, re-implemented from scratch as a pure-JVM
  * encoder/decoder pair so graft can exchange ENCODED_DATA
  * ("DATABLKE") blocks with a live reference cluster. FAST_DIFF is
  * the common production default; a real cluster's store files are
  * overwhelmingly written with one of these.
  *
  * Formats (verified against the reference sources):
  *  - Block payload = 2-byte big-endian encoding id
  *    (`DataBlockEncoding.java:37-43` — PREFIX=2, DIFF=3, FAST_DIFF=4,
  *    ROW_INDEX_V1=7), then the per-encoder stream.
  *  - PREFIX/DIFF/FAST_DIFF (BufferedDataBlockEncoder subclasses)
  *    start with a 4-byte int: total UNENCODED cell-data size
  *    (`BufferedDataBlockEncoder.java:1244` writes the dummy,
  *    `endBlockEncoding` back-patches it), then one entry per cell,
  *    each optionally followed by compressed-int tags length + tags
  *    and a Hadoop-vlong mvcc (`afterEncodingKeyValue`).
  *  - PREFIX (`PrefixKeyDeltaEncoder.java:44-66`): cInt(keyRestLen),
  *    cInt(valLen), cInt(commonPrefix) over the FLAT key (ts+type
  *    included in the prefix scan), key rest, value.
  *  - DIFF (`DiffKeyDeltaEncoder.java:38-44,185-292`): family written
  *    once before the first cell; per cell a flag byte (same-key-len /
  *    same-value-len / same-type bits, 3-bit timestamp byte-length,
  *    ts-is-diff, ts sign), optional cInt lengths, cInt(commonPrefix)
  *    over the flat key EXCLUDING ts/type, row rest + qualifier
  *    (family skipped — constant per file), little-endian
  *    minimal-length timestamp or diff-vs-previous, optional type,
  *    value.
  *  - FAST_DIFF (`FastDiffDeltaEncoder.java:47-55,228-311`): like DIFF
  *    but the first cell carries the full flat key, the timestamp is
  *    stored as its big-endian suffix after the shared prefix with the
  *    previous cell's ts (3 bits of the flag), and a SAME_VALUE bit
  *    elides a repeated value entirely.
  *  - ROW_INDEX_V1 (`RowIndexCodecV1.java:41-46`,
  *    `RowIndexEncoderV1.java:50-100`): unencoded NoneEncoder cell
  *    stream, then int rowCount, one int offset per distinct row,
  *    and a final int = cell-stream byte size (the decoder reads that
  *    last int and re-parses the stream — `RowIndexCodecV1.java:96`).
  *
  * The three delta encoders assume ONE column family per file (the
  * reference writes one store file per family; DIFF/FAST_DIFF
  * reconstruct the family from the first cell, and all three compute
  * the common prefix with `bypassFamilyCheck=true` —
  * `PrivateCellUtil.findCommonPrefixInFlatKey`): [[encodePayload]]
  * enforces it.
  */
object BlockEncoding {

  val IdNone = 0
  val IdPrefix = 2
  val IdDiff = 3
  val IdFastDiff = 4
  val IdRowIndexV1 = 7

  /** DataBlockEncoding enum names — the FILE_INFO value under
    * "DATA_BLOCK_ENCODING" (HFileDataBlockEncoderImpl.java:69). */
  def nameOf(id: Int): String = id match {
    case IdNone => "NONE"
    case IdPrefix => "PREFIX"
    case IdDiff => "DIFF"
    case IdFastDiff => "FAST_DIFF"
    case IdRowIndexV1 => "ROW_INDEX_V1"
    case other => throw new IllegalArgumentException(s"unknown encoding id $other")
  }

  def idOf(name: String): Int = name match {
    case "NONE" => IdNone
    case "PREFIX" => IdPrefix
    case "DIFF" => IdDiff
    case "FAST_DIFF" => IdFastDiff
    case "ROW_INDEX_V1" => IdRowIndexV1
    case other => throw new IllegalArgumentException(s"unknown encoding $other")
  }

  // --- primitive codecs (ByteBufferUtils.java:550,644,668,726) ---

  /** 7-bit little-endian group varint (putCompressedInt). */
  private[graft] def putCInt(out: java.io.OutputStream, value: Int): Unit = {
    var v = value
    var continue = true
    while (continue) {
      var b = v & 0x7f
      v >>>= 7
      if (v != 0) b |= 0x80
      out.write(b)
      continue = v != 0
    }
  }

  private[codec] def readCInt(bb: ByteBuffer): Int = {
    var result = 0
    var shift = 0
    var b = 0
    do {
      b = bb.get() & 0xff
      result += (b & 0x7f) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    result
  }

  /** Minimal byte count holding a non-negative long (longFitsIn). */
  private def longFitsIn(value: Long): Int = {
    if (value < 0) return 8
    var v = value
    var n = 1
    while (v >= (1L << 8)) { v >>>= 8; n += 1 }
    n
  }

  /** Little-endian minimal-length long (ByteBufferUtils.putLong). */
  private def putLongLE(out: ByteSink, value: Long, fitInBytes: Int): Unit = {
    var v = value
    var i = 0
    while (i < fitInBytes) { out.write((v & 0xff).toInt); v >>>= 8; i += 1 }
  }

  private def readLongLE(bb: ByteBuffer, fitInBytes: Int): Long = {
    var v = 0L
    var i = 0
    while (i < fitInBytes) { v |= (bb.get() & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def commonLen(a: Array[Byte], ao: Int, b: Array[Byte], bo: Int, max: Int): Int = {
    var i = 0
    while (i < max && a(ao + i) == b(bo + i)) i += 1
    i
  }

  /** findCommonPrefixInFlatKey(cur, prev, bypassFamilyCheck = true,
    * withTsType) — NOT a plain byte prefix: the family section is
    * credited without comparison (constant per file), and the scan
    * only enters ts/type when both qualifiers are fully equal
    * (PrivateCellUtil.java:1082-1176). */
  private def commonPrefixFlat(cur: HCell, prev: HCell, withTsType: Boolean): Int = {
    if (cur.row.length != prev.row.length) {
      // rowLen shorts differ: common prefix of the two 2-byte lengths
      val a = ByteBuffer.allocate(2).putShort(cur.row.length.toShort).array()
      val b = ByteBuffer.allocate(2).putShort(prev.row.length.toShort).array()
      return commonLen(a, 0, b, 0, 2)
    }
    var common = 2 + commonLen(cur.row, 0, prev.row, 0, cur.row.length)
    if (common != 2 + cur.row.length) return common
    common += 1 + cur.family.length // bypassFamilyCheck
    val qc = commonLen(cur.qualifier, 0, prev.qualifier, 0,
      math.min(cur.qualifier.length, prev.qualifier.length))
    common += qc
    if (!withTsType || math.max(cur.qualifier.length, prev.qualifier.length) != qc)
      return common
    val ta = ByteBuffer.allocate(8).putLong(cur.ts).array()
    val tb = ByteBuffer.allocate(8).putLong(prev.ts).array()
    val tc = commonLen(ta, 0, tb, 0, 8)
    common += tc
    if (tc != 8) return common
    if (cur.typ == prev.typ) common + 1 else common
  }

  private def keyLenOf(c: HCell): Int =
    2 + c.row.length + 1 + c.family.length + c.qualifier.length + 8 + 1

  /** Writes flatKey[from, keyLen-9) minus the family section — i.e.
    * the row part from `from` (if any remains) then the qualifier from
    * the right offset, mirroring writeRowKeyExcludingCommon +
    * writeQualifier(SkippingBytes). `from` = the common prefix. */
  private def writeKeyRestSkippingFamily(out: ByteSink, c: HCell, common: Int): Unit = {
    val rowWithSize = 2 + c.row.length
    if (common < rowWithSize) {
      if (common < 2) {
        val lenBytes = ByteBuffer.allocate(2).putShort(c.row.length.toShort).array()
        out.write(lenBytes, common, 2 - common)
        out.write(c.row, 0, c.row.length)
      } else {
        out.write(c.row, common - 2, c.row.length - (common - 2))
      }
      out.write(c.qualifier, 0, c.qualifier.length)
    } else {
      val commonQual = common - rowWithSize - (1 + c.family.length)
      out.write(c.qualifier, commonQual, c.qualifier.length - commonQual)
    }
  }

  // ------------------------------------------------------------------
  // Encoders (write side: no tags, no mvcc — the graft writer's wire)
  // ------------------------------------------------------------------

  /** Full ENCODED_DATA payload (2-byte id + encoder stream) for one
    * block's cells, in [[HFileV3.compareCells]] order. With `withTags`
    * each cell carries its tag section after key+value — raw for
    * ROW_INDEX_V1 (NoneEncoder short framing), cInt-framed for the
    * buffered encoders, and dictionary-compressed there when
    * `compressTags` (the per-block LRU dictionary; no mvcc on the
    * write side, matching the NONE writer). */
  def encodePayload(id: Int, cells: IndexedSeq[HCell],
      withTags: Boolean = false, compressTags: Boolean = false): Array[Byte] = {
    require(cells.nonEmpty, "empty encoded block")
    if (id == IdPrefix || id == IdDiff || id == IdFastDiff) {
      val fam0 = cells.head.family
      require(cells.forall(c => java.util.Arrays.equals(c.family, fam0)),
        s"${nameOf(id)} requires a single column family per file " +
          "(the reference writes one store file per family)")
    }
    val out = new ByteSink(8192)
    out.write(id >> 8); out.write(id & 0xff)
    id match {
      case IdPrefix => encodeBuffered(out, cells, withTags, compressTags)(encodePrefixCell)
      case IdDiff => encodeBuffered(out, cells, withTags, compressTags)(encodeDiffCell)
      case IdFastDiff => encodeBuffered(out, cells, withTags, compressTags)(encodeFastDiffCell)
      case IdRowIndexV1 => encodeRowIndex(out, cells, withTags)
      case other => throw new IllegalArgumentException(s"unsupported encoding id $other")
    }
    out.toByteArray
  }

  /** The BufferedDataBlockEncoder frame: int unencoded-size, then one
    * entry per cell via `enc(out, cell, prevOrNull)`, each followed by
    * its tag section when the file carries tags
    * (afterEncodingKeyValue — the unencoded size counts the 2-byte
    * length prefix + raw tag bytes per cell). */
  private def encodeBuffered(out: ByteSink, cells: IndexedSeq[HCell],
      withTags: Boolean, compressTags: Boolean)(
      enc: (ByteSink, HCell, HCell) => Unit): Unit = {
    var unencoded = 0L
    cells.foreach { c =>
      unencoded += 8 + keyLenOf(c) + c.value.length
      if (withTags) unencoded += 2 + c.tags.length
    }
    val sz = ByteBuffer.allocate(4).putInt(unencoded.toInt).array()
    out.write(sz, 0, 4)
    val dict = if (withTags && compressTags) newTagDict() else null
    var prev: HCell = null
    cells.foreach { c =>
      enc(out, c, prev)
      if (withTags) writeTagsSection(out, c.tags, dict)
      prev = c
    }
  }

  private def encodePrefixCell(out: ByteSink, c: HCell, prev: HCell): Unit = {
    val kLen = keyLenOf(c)
    val common = if (prev == null) 0 else commonPrefixFlat(c, prev, withTsType = true)
    putCInt(out, kLen - common)
    putCInt(out, c.value.length)
    putCInt(out, common)
    val key = HFileV3.cellKeyBytes(c)
    out.write(key, common, kLen - common)
    out.write(c.value, 0, c.value.length)
  }

  // Diff flag bits (DiffKeyDeltaEncoder.java:47-53)
  private val DiffSameKeyLen = 1
  private val DiffSameValLen = 1 << 1
  private val DiffSameType = 1 << 2
  private val DiffTsIsDiff = 1 << 3
  private val DiffShiftTsLen = 4
  private val DiffTsSign = 1 << 7

  private def encodeDiffCell(out: ByteSink, c: HCell, prev: HCell): Unit = {
    val kLen = keyLenOf(c)
    var flag = 0
    var tsToWrite = 0L
    var tsBytes = 0
    var common = 0
    if (prev == null) {
      var ts = c.ts
      if (ts < 0) { flag |= DiffTsSign; ts = -ts }
      tsBytes = longFitsIn(ts)
      tsToWrite = ts
      flag |= (tsBytes - 1) << DiffShiftTsLen
      out.write(c.family.length)
      out.write(c.family, 0, c.family.length)
    } else {
      common = commonPrefixFlat(c, prev, withTsType = false)
      if (kLen == keyLenOf(prev)) flag |= DiffSameKeyLen
      if (c.value.length == prev.value.length) flag |= DiffSameValLen
      if (c.typ == prev.typ) flag |= DiffSameType
      var ts = c.ts
      val negativeTs = ts < 0
      if (negativeTs) ts = -ts
      val fullTsBytes = longFitsIn(ts)
      var diff = prev.ts - c.ts
      val minusDiff = diff < 0
      if (minusDiff) diff = -diff
      val diffBytes = longFitsIn(diff)
      if (diffBytes < fullTsBytes) {
        flag |= (diffBytes - 1) << DiffShiftTsLen
        flag |= DiffTsIsDiff
        if (minusDiff) flag |= DiffTsSign
        tsToWrite = diff; tsBytes = diffBytes
      } else {
        flag |= (fullTsBytes - 1) << DiffShiftTsLen
        if (negativeTs) flag |= DiffTsSign
        tsToWrite = ts; tsBytes = fullTsBytes
      }
    }
    out.write(flag)
    if ((flag & DiffSameKeyLen) == 0) putCInt(out, kLen)
    if ((flag & DiffSameValLen) == 0) putCInt(out, c.value.length)
    putCInt(out, common)
    writeKeyRestSkippingFamily(out, c, common)
    putLongLE(out, tsToWrite, tsBytes)
    if ((flag & DiffSameType) == 0) out.write(c.typ)
    out.write(c.value, 0, c.value.length)
  }

  // FastDiff flag bits (FastDiffDeltaEncoder.java:49-55)
  private val FastMaskTsLen = 7
  private val FastSameKeyLen = 1 << 3
  private val FastSameValLen = 1 << 4
  private val FastSameType = 1 << 5
  private val FastSameValue = 1 << 6

  private def encodeFastDiffCell(out: ByteSink, c: HCell, prev: HCell): Unit = {
    val kLen = keyLenOf(c)
    if (prev == null) {
      out.write(0) // flag
      putCInt(out, kLen)
      putCInt(out, c.value.length)
      putCInt(out, 0)
      val key = HFileV3.cellKeyBytes(c)
      out.write(key, 0, key.length)
      out.write(c.value, 0, c.value.length)
    } else {
      var flag = 0
      val common = commonPrefixFlat(c, prev, withTsType = false)
      if (kLen == keyLenOf(prev)) flag |= FastSameKeyLen
      if (c.value.length == prev.value.length) flag |= FastSameValLen
      if (c.typ == prev.typ) flag |= FastSameType
      val curTs = ByteBuffer.allocate(8).putLong(c.ts).array()
      val prevTs = ByteBuffer.allocate(8).putLong(prev.ts).array()
      val ctsp = commonLen(curTs, 0, prevTs, 0, 7) // at most 7
      flag |= ctsp
      if (c.value.length == prev.value.length &&
          java.util.Arrays.equals(c.value, prev.value)) flag |= FastSameValue
      out.write(flag)
      if ((flag & FastSameKeyLen) == 0) putCInt(out, kLen)
      if ((flag & FastSameValLen) == 0) putCInt(out, c.value.length)
      putCInt(out, common)
      writeKeyRestSkippingFamily(out, c, common)
      out.write(curTs, ctsp, 8 - ctsp)
      if ((flag & FastSameType) == 0) out.write(c.typ)
      if ((flag & FastSameValue) == 0) out.write(c.value, 0, c.value.length)
    }
  }

  private def encodeRowIndex(out: ByteSink, cells: IndexedSeq[HCell],
      withTags: Boolean): Unit = {
    val cellStream = new ByteSink(8192)
    val offsets = new ByteSink(256)
    var prevRow: Array[Byte] = null
    cells.foreach { c =>
      if (prevRow == null || !java.util.Arrays.equals(prevRow, c.row)) {
        offsets.writeInt(cellStream.size())
        prevRow = c.row
      }
      // key fields stream straight into the sink — byte-identical to
      // materializing cellKeyBytes(c) first
      cellStream.writeInt(keyLenOf(c))
      cellStream.writeInt(c.value.length)
      cellStream.writeShort(c.row.length)
      cellStream.write(c.row)
      cellStream.write(c.family.length)
      cellStream.write(c.family)
      cellStream.write(c.qualifier)
      cellStream.writeLong(c.ts)
      cellStream.write(c.typ.toInt)
      cellStream.write(c.value)
      if (withTags) {
        // NoneEncoder raw short framing — never dictionary-compressed
        cellStream.writeShort(c.tags.length)
        cellStream.write(c.tags)
      }
    }
    val dataSize = cellStream.size()
    cellStream.writeTo(out)
    out.writeInt(offsets.size() / 4)
    offsets.writeTo(out)
    out.writeInt(dataSize)
  }

  // ------------------------------------------------------------------
  // Tag dictionary (TagCompressionContext.java + LRUDictionary.java)
  // ------------------------------------------------------------------

  /** HFile encoded blocks build their tag dictionary with capacity
    * Byte.MAX_VALUE and reset it at every block boundary
    * (BufferedDataBlockEncoder.java:76,818,1236). The dictionary
    * discipline (access-order LRU, index recycling, add-on-miss) is
    * the same LRUDictionary the WAL uses — [[WalCompression.LruDict]]
    * is the one twin for both. */
  private[codec] type TagDict = WalCompression.LruDict
  private def newTagDict(): TagDict = new WalCompression.LruDict(Byte.MaxValue)

  /** Per-cell tag section, encode side (afterEncodingKeyValue):
    * cInt(UNCOMPRESSED tag-section length) then either the raw section
    * or, with a dictionary, per tag a status byte — -1 + varint32 len
    * (StreamUtils.writeRawVInt32 — same 7-bit groups as cInt) + bytes
    * for a miss (which adds the entry), or the 2-byte big-endian index
    * for a hit (TagCompressionContext.compressTags / Dictionary.write;
    * capacity 127 keeps the index's high byte < 0xff, so the status
    * byte disambiguates). */
  private def writeTagsSection(out: ByteSink, tags: Array[Byte],
      dict: TagDict): Unit = {
    putCInt(out, tags.length)
    if (tags.length == 0) ()
    else if (dict == null) out.write(tags, 0, tags.length)
    else {
      var pos = 0
      while (pos < tags.length) {
        val tagLen = ((tags(pos) & 0xff) << 8) | (tags(pos + 1) & 0xff)
        pos += 2
        val t = java.util.Arrays.copyOfRange(tags, pos, pos + tagLen)
        val idx = dict.findOrAdd(t)
        if (idx == -1) {
          out.write(0xff) // Dictionary.NOT_IN_DICTIONARY
          putCInt(out, tagLen)
          out.write(t, 0, tagLen)
        } else {
          out.write((idx >> 8) & 0xff)
          out.write(idx & 0xff)
        }
        pos += tagLen
      }
    }
  }

  /** Per-cell tag section, decode side: reproduces exactly `tagsLen`
    * uncompressed bytes (TagCompressionContext.uncompressTags — each
    * literal re-enters the dictionary, each 2-byte index replays a
    * stored entry with its 2-byte length prefix re-synthesized). */
  private def readTagsSection(bb: ByteBuffer, dict: TagDict): Array[Byte] = {
    val tagsLen = readCInt(bb)
    if (tagsLen == 0) Array.emptyByteArray
    else if (dict == null) {
      val t = new Array[Byte](tagsLen)
      bb.get(t)
      t
    } else {
      val dest = new Array[Byte](tagsLen)
      var off = 0
      while (off < tagsLen) {
        val status = bb.get()
        if (status == -1) {
          val tagLen = readCInt(bb)
          dest(off) = ((tagLen >> 8) & 0xff).toByte
          dest(off + 1) = (tagLen & 0xff).toByte
          off += 2
          bb.get(dest, off, tagLen)
          dict.put(java.util.Arrays.copyOfRange(dest, off, off + tagLen))
          off += tagLen
        } else {
          val entry = dict.get(
            (((status & 0xff) << 8) | (bb.get() & 0xff)).toShort)
          dest(off) = ((entry.length >> 8) & 0xff).toByte
          dest(off + 1) = (entry.length & 0xff).toByte
          off += 2
          System.arraycopy(entry, 0, dest, off, entry.length)
          off += entry.length
        }
      }
      dest
    }
  }

  // ------------------------------------------------------------------
  // Decoders (read side: accepts reference files — tags + mvcc)
  // ------------------------------------------------------------------

  /** Decode a full ENCODED_DATA payload (starting at the 2-byte id)
    * into cells. `withTags`/`withMvcc`/`compressTags` come from
    * FILE_INFO exactly as for unencoded blocks; tags land on the
    * decoded cells. Dictionary-compressed tags apply to the buffered
    * delta encoders only — ROW_INDEX_V1 goes through NoneEncoder,
    * which always writes tags raw, and its codec ignores the
    * compress-tags flag (RowIndexCodecV1 never consults
    * TagCompressionContext), so the flag is ignored there too. */
  def decodePayload(payload: Array[Byte], withMvcc: Boolean, withTags: Boolean,
      compressTags: Boolean = false): Iterator[HCell] = {
    require(payload.length >= 2, "encoded block too short")
    val id = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
    val bb = ByteBuffer.wrap(payload, 2, payload.length - 2).slice()
    val dict =
      if (withTags && compressTags && id != IdRowIndexV1) newTagDict()
      else null
    id match {
      case IdPrefix => decodePrefix(bb, withMvcc, withTags, dict)
      case IdDiff => decodeDiff(bb, withMvcc, withTags, dict)
      case IdFastDiff => decodeFastDiff(bb, withMvcc, withTags, dict)
      case IdRowIndexV1 => decodeRowIndex(bb, withMvcc, withTags)
      case other =>
        throw new IllegalArgumentException(s"unsupported data block encoding id $other")
    }
  }

  private def readHadoopVLong(bb: ByteBuffer): Long = {
    val first = bb.get()
    val len = HadoopVLong.decodeVIntSize(first)
    if (len == 1) return first.toLong
    var v = 0L
    var i = 0
    while (i < len - 1) { v = (v << 8) | (bb.get() & 0xffL); i += 1 }
    if (HadoopVLong.isNegative(first)) ~v else v
  }

  /** The per-cell trailer after key+value: tag section (raw or
    * dictionary-compressed) then the mvcc vlong. Returns (tags, mvcc). */
  private def afterCell(bb: ByteBuffer, withMvcc: Boolean, withTags: Boolean,
      dict: TagDict): (Array[Byte], Long) = {
    val tags =
      if (withTags) readTagsSection(bb, dict) else Array.emptyByteArray
    (tags, if (withMvcc) readHadoopVLong(bb) else 0L)
  }

  private def splitKey(key: Array[Byte], value: Array[Byte], mvcc: Long,
      tags: Array[Byte] = Array.emptyByteArray): HCell = {
    val rowLen = ((key(0) & 0xff) << 8) | (key(1) & 0xff)
    val row = java.util.Arrays.copyOfRange(key, 2, 2 + rowLen)
    val famLen = key(2 + rowLen) & 0xff
    val fam = java.util.Arrays.copyOfRange(key, 3 + rowLen, 3 + rowLen + famLen)
    val qual = java.util.Arrays.copyOfRange(key, 3 + rowLen + famLen, key.length - 9)
    var ts = 0L
    var i = key.length - 9
    while (i < key.length - 1) { ts = (ts << 8) | (key(i) & 0xffL); i += 1 }
    HCell(row, fam, qual, ts, key(key.length - 1), value, mvcc, tags)
  }

  private def decodePrefix(bb: ByteBuffer, withMvcc: Boolean, withTags: Boolean,
      dict: TagDict): Iterator[HCell] = {
    bb.getInt // unencoded size (allocation hint only)
    var prevKey: Array[Byte] = Array.emptyByteArray
    new Iterator[HCell] {
      def hasNext: Boolean = bb.hasRemaining
      def next(): HCell = {
        val restLen = readCInt(bb)
        val vLen = readCInt(bb)
        val common = readCInt(bb)
        val key = new Array[Byte](common + restLen)
        System.arraycopy(prevKey, 0, key, 0, common)
        bb.get(key, common, restLen)
        val value = new Array[Byte](vLen)
        bb.get(value)
        val (tags, mvcc) = afterCell(bb, withMvcc, withTags, dict)
        prevKey = key
        splitKey(key, value, mvcc, tags)
      }
    }
  }

  private def decodeDiff(bb: ByteBuffer, withMvcc: Boolean, withTags: Boolean,
      dict: TagDict): Iterator[HCell] = {
    bb.getInt // unencoded size
    var famWithSize: Array[Byte] = null
    var prevKey: Array[Byte] = null
    var prevKeyLen = 0
    var prevValLen = 0
    var prevTs = 0L
    var prevType: Byte = 0
    var prevRowLen = 0
    new Iterator[HCell] {
      def hasNext: Boolean = bb.hasRemaining
      def next(): HCell = {
        val first = prevKey == null
        if (first) {
          val famLen = bb.get() & 0xff
          famWithSize = new Array[Byte](1 + famLen)
          famWithSize(0) = famLen.toByte
          bb.get(famWithSize, 1, famLen)
        }
        val flag = bb.get() & 0xff
        val keyLen = if ((flag & DiffSameKeyLen) != 0) prevKeyLen else readCInt(bb)
        val valLen = if ((flag & DiffSameValLen) != 0) prevValLen else readCInt(bb)
        val common = readCInt(bb)
        val key = new Array[Byte](keyLen)
        if (common > 0) System.arraycopy(prevKey, 0, key, 0, common)
        var pos = common
        var rowLen = 0
        if (first || common < prevRowLen + 2) {
          if (common < 2) {
            bb.get(key, pos, 2 - common)
            pos = 2
            rowLen = ((key(0) & 0xff) << 8) | (key(1) & 0xff)
            // whole row still to come
            bb.get(key, pos, rowLen)
            pos += rowLen
          } else {
            rowLen = ((key(0) & 0xff) << 8) | (key(1) & 0xff)
            val rowRest = rowLen + 2 - common
            bb.get(key, pos, rowRest)
            pos += rowRest
          }
          System.arraycopy(famWithSize, 0, key, pos, famWithSize.length)
          pos += famWithSize.length
          val keyRest = keyLen - pos - 9
          bb.get(key, pos, keyRest)
          pos += keyRest
        } else {
          rowLen = prevRowLen
          val keyRest = keyLen - common - 9
          bb.get(key, pos, keyRest)
          pos += keyRest
        }
        val tsLen = ((flag & (7 << DiffShiftTsLen)) >>> DiffShiftTsLen) + 1
        var ts = readLongLE(bb, tsLen)
        if ((flag & DiffTsSign) != 0) ts = -ts
        if ((flag & DiffTsIsDiff) != 0) ts = prevTs - ts
        ByteBuffer.wrap(key, pos, 8).putLong(ts)
        pos += 8
        val typ = if ((flag & DiffSameType) != 0) prevType else bb.get()
        key(pos) = typ
        val value = new Array[Byte](valLen)
        bb.get(value)
        val (tags, mvcc) = afterCell(bb, withMvcc, withTags, dict)
        prevKey = key; prevKeyLen = keyLen; prevValLen = valLen
        prevTs = ts; prevType = typ; prevRowLen = rowLen
        splitKey(key, value, mvcc, tags)
      }
    }
  }

  private def decodeFastDiff(bb: ByteBuffer, withMvcc: Boolean, withTags: Boolean,
      dict: TagDict): Iterator[HCell] = {
    bb.getInt // unencoded size
    var prevKey: Array[Byte] = null
    var prevVal: Array[Byte] = null
    var keyLenState = 0
    var valLenState = 0
    var prevRowLen = 0
    var prevFamLen = 0
    new Iterator[HCell] {
      def hasNext: Boolean = bb.hasRemaining
      def next(): HCell = {
        val flag = bb.get() & 0xff
        if ((flag & FastSameKeyLen) == 0) keyLenState = readCInt(bb)
        if ((flag & FastSameValLen) == 0) valLenState = readCInt(bb)
        val common = readCInt(bb)
        val first = prevKey == null
        val key = new Array[Byte](keyLenState)
        var value: Array[Byte] = null
        if (first) {
          bb.get(key)
          value = new Array[Byte](valLenState)
          bb.get(value)
          prevRowLen = ((key(0) & 0xff) << 8) | (key(1) & 0xff)
          prevFamLen = key(2 + prevRowLen) & 0xff
        } else {
          System.arraycopy(prevKey, 0, key, 0, common)
          var pos = common
          var rowLen = prevRowLen
          if (common < prevRowLen + 2) {
            if (common < 2) {
              bb.get(key, pos, 2 - common)
              pos = 2
              rowLen = ((key(0) & 0xff) << 8) | (key(1) & 0xff)
              bb.get(key, pos, rowLen)
              pos += rowLen
            } else {
              rowLen = ((key(0) & 0xff) << 8) | (key(1) & 0xff)
              val rowRest = rowLen + 2 - common
              bb.get(key, pos, rowRest)
              pos += rowRest
            }
            // copy the family (with its length byte) from the previous key
            System.arraycopy(prevKey, 2 + prevRowLen, key, pos, 1 + prevFamLen)
            pos += 1 + prevFamLen
            val keyRest = keyLenState - pos - 9
            bb.get(key, pos, keyRest)
            pos += keyRest
            prevRowLen = rowLen
          } else {
            val keyRest = keyLenState - common - 9
            bb.get(key, pos, keyRest)
            pos += keyRest
          }
          // timestamp: shared big-endian prefix with previous + suffix
          val prefixTs = flag & FastMaskTsLen
          System.arraycopy(prevKey, prevKey.length - 9, key, pos, prefixTs)
          bb.get(key, pos + prefixTs, 8 - prefixTs)
          pos += 8
          // type then value, eliding what the flags share
          if ((flag & FastSameType) != 0) {
            key(pos) = prevKey(prevKey.length - 1)
            value =
              if ((flag & FastSameValue) != 0) prevVal
              else { val v = new Array[Byte](valLenState); bb.get(v); v }
          } else {
            key(pos) = bb.get()
            value =
              if ((flag & FastSameValue) != 0) prevVal
              else { val v = new Array[Byte](valLenState); bb.get(v); v }
          }
        }
        val (tags, mvcc) = afterCell(bb, withMvcc, withTags, dict)
        prevKey = key; prevVal = value
        splitKey(key, value, mvcc, tags)
      }
    }
  }

  private def decodeRowIndex(bb: ByteBuffer, withMvcc: Boolean, withTags: Boolean): Iterator[HCell] = {
    // last int of the payload = byte size of the flat cell stream
    // (RowIndexCodecV1.decodeKeyValues reads it the same way)
    val dataSize = bb.getInt(bb.limit() - 4)
    val cellEnd = bb.position() + dataSize
    new Iterator[HCell] {
      def hasNext: Boolean = bb.position() < cellEnd
      def next(): HCell = {
        val keyLen = bb.getInt
        val valLen = bb.getInt
        val key = new Array[Byte](keyLen)
        bb.get(key)
        val value = new Array[Byte](valLen)
        bb.get(value)
        var mvcc = 0L
        var tags = Array.emptyByteArray
        if (withTags) {
          val tagsLen = bb.getShort & 0xffff // NoneEncoder short framing
          if (tagsLen > 0) { tags = new Array[Byte](tagsLen); bb.get(tags) }
        }
        if (withMvcc) mvcc = readHadoopVLong(bb)
        splitKey(key, value, mvcc, tags)
      }
    }
  }
}

/** Hadoop WritableUtils vlong helpers (readVLong's first-byte rules). */
private[codec] object HadoopVLong {
  def decodeVIntSize(first: Byte): Int = {
    if (first >= -112) 1
    else if (first >= -120) -111 - first
    else -119 - first
  }
  def isNegative(first: Byte): Boolean = first < -120
}
