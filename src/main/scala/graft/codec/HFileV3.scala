package graft.codec

import java.io.{ByteArrayOutputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, CRC32C}

/** HFile version-3 byte format — the reference's on-disk store-file
  * layout, re-implemented as a pure-JVM writer/reader pair so graft's
  * export / bulk-load flows can exchange files with a live reference
  * cluster.
  *
  * Layout (all sizes/offsets verified against the reference sources):
  *  - Blocks: 33-byte header (`HFileBlock.java:132-148` — 8B magic,
  *    int onDiskSizeWithoutHeader (incl. checksums), int
  *    uncompressedSizeWithoutHeader, long prevBlockOffset, byte
  *    checksumType, int bytesPerChecksum, int onDiskDataSizeWithHeader)
  *    + payload + one 4-byte checksum per `bytesPerChecksum` chunk of
  *    header-plus-payload (`HFileBlock.java:80-106`).
  *  - Cells in a DATA block: int keyLen, int valLen, key(short rowLen,
  *    row, byte famLen, fam, qual, long ts, byte type), value,
  *    optional short tagsLen + tags, optional Hadoop-vlong mvcc
  *    (`NoneEncoder.java:39-58`, KeyValue wire format).
  *  - Load-on-open: single-level ROOT_INDEX (entries = long offset,
  *    int onDiskSizeWithHeader, Hadoop-vint key length + key bytes —
  *    `HFileBlockIndex.java:844-858`), an empty meta ROOT_INDEX,
  *    FILE_INFO = "PBUF" magic + varint-delimited FileInfoProto of
  *    BytesBytesPair entries (`HFileInfo.java:274-275`).
  *  - Trailer: fixed 4096 bytes (`FixedFileTrailer.java:164-175`) =
  *    "TRABLK\"$" + varint-delimited FileTrailerProto (HFile.proto) +
  *    zero padding + int (major | minor<<24)
  *    (`FixedFileTrailer.java:202-215,727-729`).
  *
  * Scope: block compression NONE / GZ / SNAPPY / LZ4 / BZIP2 / ZSTD /
  * LZMA on both sides (Compression.Algorithm ordinals 2/1/3/4/5/6/7;
  * GZ and BZIP2 = the Hadoop GzipCodec / BZip2Codec STREAM forms — one
  * gzip/bzip2 stream per block body, Hadoop treats both as stream
  * codecs — the others = Hadoop BlockCompressorStream framing
  * over raw snappy / lz4-block / zstd-frame / lzma-alone chunks,
  * exactly what the hbase-compression codecs put on disk; LZMA is the
  * historical hbase-compression-xz form — a .lzma-alone stream with
  * explicit size per chunk via org.tukaani.xz, which ships on Spark's
  * classpath; LZO/BROTLI sit outside Spark's classpath — a classpath
  * boundary, not a format one),
  * compound
  * ROW blooms ([[HBloom]]), and CRC32C checksums on the write side; the
  * reader additionally accepts CRC32 and NULL checksum files,
  * multi-level-index files (it walks the scanned section
  * block-by-block, so index depth is irrelevant), and per-cell
  * mvcc/tags when the FILE_INFO declares them — i.e. it reads
  * default-configuration reference files as well as GZ-compressed ones.
  * Data-block encodings (PREFIX / DIFF / FAST_DIFF / ROW_INDEX_V1 —
  * "DATABLKE" blocks) are supported on BOTH sides via
  * [[BlockEncoding]], including dictionary-compressed tags
  * (COMPRESS_TAGS + encoding — per-block LRU dictionaries,
  * TagCompressionContext.java). Transparent block encryption
  * (AES-128-CTR frames + trailer-wrapped per-file data keys,
  * [[HCrypto]]) is supported on both sides and composes with any
  * compression/encoding.
  */
object HFileV3 {

  /** One cell in reference wire terms. `typ` uses the public KeyValue
    * type codes (Put=4, Delete=8, DeleteFamilyVersion=10,
    * DeleteColumn=12, DeleteFamily=14). */
  final case class HCell(
      row: Array[Byte], family: Array[Byte], qualifier: Array[Byte],
      ts: Long, typ: Byte, value: Array[Byte], mvcc: Long = 0L,
      tags: Array[Byte] = Array.emptyByteArray)

  /** Serialize tags the KeyValue way: repeated
    * [2B BE tagLen][1B type][data], tagLen counting type + data
    * (ArrayBackedTag / TagUtil.fromList). */
  def tagBytes(tags: Seq[(Byte, Array[Byte])]): Array[Byte] = {
    val out = ByteBuffer.allocate(tags.map(3 + _._2.length).sum)
    for ((typ, data) <- tags) {
      out.putShort((1 + data.length).toShort)
      out.put(typ)
      out.put(data)
    }
    out.array()
  }

  /** Parse a cell's tag section back to (type, data) pairs. */
  def parseTags(tags: Array[Byte]): Seq[(Byte, Array[Byte])] = {
    val bb = ByteBuffer.wrap(tags)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Byte, Array[Byte])]
    while (bb.remaining() >= 3) {
      val len = bb.getShort & 0xffff
      val typ = bb.get()
      val data = new Array[Byte](len - 1)
      bb.get(data)
      out += ((typ, data))
    }
    out.toSeq
  }

  // --- public KeyValue type codes ---
  val TypePut: Byte = 4
  val TypeDelete: Byte = 8
  val TypeDeleteFamilyVersion: Byte = 10
  val TypeDeleteColumn: Byte = 12
  val TypeDeleteFamily: Byte = 14

  private val MagicData = "DATABLK*".getBytes(StandardCharsets.US_ASCII)
  private val MagicDataEncoded = "DATABLKE".getBytes(StandardCharsets.US_ASCII)
  private val MagicRootIdx = "IDXROOT2".getBytes(StandardCharsets.US_ASCII)
  private val MagicLeafIdx = "IDXLEAF2".getBytes(StandardCharsets.US_ASCII)
  private val MagicInterIdx = "IDXINTE2".getBytes(StandardCharsets.US_ASCII)
  private val MagicBloom = "BLMFBLK2".getBytes(StandardCharsets.US_ASCII)
  private val MagicBloomMeta = "BLMFMET2".getBytes(StandardCharsets.US_ASCII)
  private val MagicMeta = "METABLKc".getBytes(StandardCharsets.US_ASCII)
  private val MagicFileInfo = "FILEINF2".getBytes(StandardCharsets.US_ASCII)
  private val MagicTrailer = "TRABLK\"$".getBytes(StandardCharsets.US_ASCII)
  private val PbMagic = "PBUF".getBytes(StandardCharsets.US_ASCII)

  private val HeaderSize = 33
  private[graft] val TrailerSize = 4096 // FixedFileTrailer.java:171 — v3 fixed size
  private val MajorVersion = 3
  private val MinorVersion = 3 // HFileReaderImpl.MAX_MINOR_VERSION
  // Compression.Algorithm ordinals (Compression.java:149-…: LZO=0,
  // GZ=1, NONE=2, SNAPPY=3, LZ4=4, BZIP2=5, ZSTD=6, LZMA=7) — the
  // trailer's compression_codec field stores the ordinal.
  val CompressionGz = 1
  val CompressionNone = 2
  val CompressionSnappy = 3
  val CompressionLz4 = 4
  val CompressionBzip2 = 5
  val CompressionZstd = 6
  val CompressionLzma = 7
  private val ChecksumNull: Byte = 0
  private val ChecksumCrc32: Byte = 1
  private val ChecksumCrc32C: Byte = 2
  private val ComparatorName = "org.apache.hadoop.hbase.CellComparatorImpl"

  /** CellComparatorImpl order: row asc, family asc, qualifier asc,
    * timestamp DESC, type code DESC (deletes sort before puts at the
    * same ts). Returns <0 if a before b. */
  def compareCells(a: HCell, b: HCell): Int = {
    val r = compareBytes(a.row, b.row)
    if (r != 0) return r
    val f = compareBytes(a.family, b.family)
    if (f != 0) return f
    val q = compareBytes(a.qualifier, b.qualifier)
    if (q != 0) return q
    val t = java.lang.Long.compare(b.ts, a.ts)
    if (t != 0) return t
    java.lang.Integer.compare(b.typ & 0xff, a.typ & 0xff)
  }

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  // ------------------------------------------------------------------
  // Low-level encoders
  // ------------------------------------------------------------------

  /** Hadoop WritableUtils.writeVLong wire format (public Hadoop API). */
  private[graft] def writeVLong(out: OutputStream, v: Long): Unit = {
    if (v >= -112 && v <= 127) { out.write(v.toInt & 0xff); return }
    var len = -112
    var i = v
    if (i < 0) { i = ~i; len = -120 }
    var tmp = i
    while (tmp != 0) { tmp >>= 8; len -= 1 }
    out.write(len & 0xff)
    val n = if (len < -120) -(len + 120) else -(len + 112)
    var idx = n
    while (idx != 0) {
      val shift = (idx - 1) * 8
      out.write(((i >> shift) & 0xff).toInt)
      idx -= 1
    }
  }

  private[graft] def readVLong(in: InputStream): Long = {
    val first = in.read()
    if (first < 0) throw new EOFException("vlong")
    val b = first.toByte
    if (b >= -112) return b.toLong
    val negative = b < -120
    val n = if (negative) -(b + 120) else -(b + 112)
    var v = 0L
    var i = 0
    while (i < n) {
      val nb = in.read()
      if (nb < 0) throw new EOFException("vlong body")
      v = (v << 8) | (nb & 0xff)
      i += 1
    }
    if (negative) ~v else v
  }

  /** Protobuf base-128 varint (uint64). */
  private def writeVarint(out: OutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt & 0x7f)
  }

  /** Parse the TIMERANGE FILE_INFO entry to (minTs, maxTs). Accepts
    * both wire forms TimeRangeTracker.parseFrom does: the HBASE-21012
    * DataOutput form (two big-endian longs) and the older "PBUF"-magic
    * protobuf TimeRangeTracker {uint64 from=1; uint64 to=2}. */
  def parseTimeRange(fi: Map[String, Array[Byte]]): Option[(Long, Long)] =
    fi.get("TIMERANGE").map { data =>
      if (data.length >= 4 && data(0) == 'P' && data(1) == 'B' &&
          data(2) == 'U' && data(3) == 'F') {
        val bb = ByteBuffer.wrap(data, 4, data.length - 4).slice()
        var from = 0L
        var to = 0L
        while (bb.hasRemaining) {
          val tag = readVarint(bb)
          require((tag & 7) == 0, "unexpected TimeRangeTracker wire type")
          val v = readVarint(bb)
          if ((tag >> 3) == 1) from = v else if ((tag >> 3) == 2) to = v
        }
        (from, to)
      } else {
        val bb = ByteBuffer.wrap(data)
        (bb.getLong, bb.getLong)
      }
    }

  private def readVarint(buf: ByteBuffer): Long = {
    var shift = 0
    var v = 0L
    var b = 0
    do {
      b = buf.get() & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v
  }

  /** Serialized byte count of a Hadoop vlong. */
  private def vlongSize(v: Long): Int = {
    if (v >= -112 && v <= 127) return 1
    var i = if (v < 0) ~v else v
    var n = 1
    while (i != 0) { i >>>= 8; n += 1 }
    n
  }

  /** Non-root index block payload (NoOpIndexBlockEncoder.writeNonRoot):
    * int numEntries, numEntries secondary-index ints (entry offsets
    * within the entries area), one extra int (total entries-area
    * size), then {long offset, int onDiskSize, raw key} per entry —
    * key lengths derive from consecutive secondary-index values. */
  private def nonRootIndexPayload(entries: Seq[BlockRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    dos.writeInt(entries.size)
    var off = 0
    for (e <- entries) { dos.writeInt(off); off += 12 + e.firstKey.length }
    dos.writeInt(off)
    for (e <- entries) {
      dos.writeLong(e.offset)
      dos.writeInt(e.onDiskSizeWithHeader)
      dos.write(e.firstKey)
    }
    bos.toByteArray
  }

  /** Parse a non-root (leaf / intermediate) index block payload. */
  private def parseNonRootIndex(payload: Array[Byte]): IndexedSeq[(Long, Int, Array[Byte])] = {
    val bb = ByteBuffer.wrap(payload)
    val n = bb.getInt
    val sec = new Array[Int](n + 1)
    var i = 0
    while (i <= n) { sec(i) = bb.getInt; i += 1 }
    val base = bb.position()
    (0 until n).map { j =>
      bb.position(base + sec(j))
      val off = bb.getLong
      val sz = bb.getInt
      val key = new Array[Byte](sec(j + 1) - sec(j) - 12)
      bb.get(key)
      (off, sz, key)
    }
  }

  private def pbVarintField(out: OutputStream, field: Int, v: Long): Unit = {
    writeVarint(out, (field << 3) | 0) // wire type 0
    writeVarint(out, v)
  }

  private def pbBytesField(out: OutputStream, field: Int, v: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2) // wire type 2
    writeVarint(out, v.length.toLong)
    out.write(v)
  }

  /** Serialized cell KEY (the index / comparator unit): short rowLen +
    * row + byte famLen + fam + qual + long ts + type byte. */
  private[graft] def cellKeyBytes(c: HCell): Array[Byte] = {
    val keyLen = 2 + c.row.length + 1 + c.family.length + c.qualifier.length + 8 + 1
    val bb = ByteBuffer.allocate(keyLen)
    bb.putShort(c.row.length.toShort)
    bb.put(c.row)
    bb.put(c.family.length.toByte)
    bb.put(c.family)
    bb.put(c.qualifier)
    bb.putLong(c.ts)
    bb.put(c.typ)
    bb.array()
  }

  // ------------------------------------------------------------------
  // Writer
  // ------------------------------------------------------------------

  /** Accumulates the file; tracks offsets like the reference's
    * FSDataOutputStream position. */
  private final class CountingOutput(val under: OutputStream) extends OutputStream {
    var pos: Long = 0L
    override def write(b: Int): Unit = { under.write(b); pos += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      under.write(b, off, len); pos += len
    }
  }

  private final case class BlockRecord(
      offset: Long, onDiskSizeWithHeader: Int, firstKey: Array[Byte])

  /** Hadoop BlockCompressorStream chunk size — the hbase-compression
    * codecs' shared default (ZstdCodec.ZSTD_BUFFER_SIZE_DEFAULT etc.,
    * 256 KiB): each raw chunk lands as [int rawLen][int compLen][comp
    * bytes], possibly repeated, which is what a reference
    * BlockDecompressorStream expects back. */
  private val CompressChunk = 256 * 1024

  private def compressPayload(codec: Int, payload: Array[Byte]): Array[Byte] = codec match {
    case CompressionNone => payload
    case CompressionGz =>
      val bos = new ByteArrayOutputStream(payload.length / 2 + 64)
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(payload); g.finish(); g.close()
      bos.toByteArray
    case CompressionBzip2 =>
      // Hadoop's BZip2Codec is a STREAM codec like GzipCodec: the
      // block body is one bzip2 stream, no chunk framing
      // (commons-compress ships on Spark's classpath)
      val bos = new ByteArrayOutputStream(payload.length / 2 + 64)
      val z = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorOutputStream(bos)
      // close() finishes; an explicit finish()+close() double-finishes
      // and NPEs in commons-compress
      z.write(payload); z.close()
      bos.toByteArray
    case CompressionSnappy | CompressionLz4 | CompressionZstd | CompressionLzma =>
      // empty payload: BlockCompressorStream.finish() with no input
      // writes nothing (the empty meta-index block stays 0 bytes)
      if (payload.isEmpty) return payload
      val bos = new ByteArrayOutputStream(payload.length / 2 + 64)
      val dos = new DataOutputStream(bos)
      var off = 0
      while (off < payload.length) {
        val rawLen = math.min(CompressChunk, payload.length - off)
        dos.writeInt(rawLen)
        val comp = codec match {
          case CompressionSnappy =>
            val dst = new Array[Byte](
              org.xerial.snappy.Snappy.maxCompressedLength(rawLen))
            val n = org.xerial.snappy.Snappy.rawCompress(payload, off, rawLen, dst, 0)
            java.util.Arrays.copyOf(dst, n)
          case CompressionLz4 =>
            val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
            val dst = new Array[Byte](c.maxCompressedLength(rawLen))
            val n = c.compress(payload, off, rawLen, dst, 0, dst.length)
            java.util.Arrays.copyOf(dst, n)
          case CompressionLzma =>
            // the historical hbase-compression-xz LzmaCompressor form:
            // one .lzma-alone stream per chunk, explicit uncompressed
            // size in the header (LZMAOutputStream(out, opts, size)).
            // Preset 1: the LEVEL is a writer knob, not a format
            // property (the codec's conf default is 6; any preset
            // decodes identically) — preset 1 compresses ~10× faster
            // at mildly lower ratio, the right trade for store files
            val cbos = new ByteArrayOutputStream(rawLen / 2 + 64)
            val lz = new org.tukaani.xz.LZMAOutputStream(
              cbos, new org.tukaani.xz.LZMA2Options(1), rawLen.toLong)
            lz.write(payload, off, rawLen); lz.finish()
            cbos.toByteArray
          case _ =>
            com.github.luben.zstd.Zstd.compress(
              java.util.Arrays.copyOfRange(payload, off, off + rawLen), 3)
        }
        dos.writeInt(comp.length)
        dos.write(comp)
        off += rawLen
      }
      bos.toByteArray
    case other =>
      throw new IllegalArgumentException(s"unsupported compression ordinal $other")
  }

  private def decompressPayload(codec: Int, body: Array[Byte], off: Int, len: Int,
      uncompressedSize: Int): Array[Byte] = codec match {
    case CompressionGz =>
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(body, off, len))
      val outBuf = new Array[Byte](uncompressedSize)
      var read = 0
      while (read < uncompressedSize) {
        val n = in.read(outBuf, read, uncompressedSize - read)
        require(n > 0, "truncated gzip block")
        read += n
      }
      require(in.read() < 0, "gzip block longer than declared")
      outBuf
    case CompressionBzip2 =>
      val in = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorInputStream(
          new java.io.ByteArrayInputStream(body, off, len))
      val outBuf = new Array[Byte](uncompressedSize)
      var read = 0
      while (read < uncompressedSize) {
        val n = in.read(outBuf, read, uncompressedSize - read)
        require(n > 0, "truncated bzip2 block")
        read += n
      }
      require(in.read() < 0, "bzip2 block longer than declared")
      outBuf
    case CompressionSnappy | CompressionLz4 | CompressionZstd | CompressionLzma =>
      val outBuf = new Array[Byte](uncompressedSize)
      var outPos = 0
      val bb = ByteBuffer.wrap(body, off, len).slice()
      while (outPos < uncompressedSize) {
        val rawLen = bb.getInt
        var produced = 0
        while (produced < rawLen) {
          val compLen = bb.getInt
          val srcOff = off + bb.position()
          val n = codec match {
            case CompressionSnappy =>
              org.xerial.snappy.Snappy.rawUncompress(body, srcOff, compLen, outBuf, outPos)
            case CompressionLz4 =>
              net.jpountz.lz4.LZ4Factory.fastestInstance().safeDecompressor()
                .decompress(body, srcOff, compLen, outBuf, outPos)
            case CompressionLzma =>
              val in = new org.tukaani.xz.LZMAInputStream(
                new java.io.ByteArrayInputStream(body, srcOff, compLen))
              try {
                var got = 0
                var r = in.read(outBuf, outPos, uncompressedSize - outPos)
                while (r > 0) {
                  got += r
                  r = in.read(outBuf, outPos + got, uncompressedSize - outPos - got)
                }
                got
              } finally in.close()
            case _ =>
              com.github.luben.zstd.Zstd.decompressByteArray(
                outBuf, outPos, uncompressedSize - outPos,
                body, srcOff, compLen).toInt
          }
          require(n > 0 || rawLen == 0, "empty compressed chunk")
          bb.position(bb.position() + compLen)
          produced += n
          outPos += n
        }
        // a truncated or oversized stream must fail HERE as a clear
        // chunk error, not later as a confusing chunk desync: produced
        // overshooting rawLen means this chunk wrote into the next
        // chunk's territory of the output buffer
        require(produced == rawLen,
          s"chunk produced $produced bytes, declared rawLen $rawLen")
      }
      outBuf
    case other =>
      throw new IllegalArgumentException(s"unsupported compression ordinal $other")
  }

  /** Write one block: header + (optionally compressed, then optionally
    * encrypted) payload + per-chunk CRC32C checksums over the on-disk
    * bytes. `crypto` = (dataKey, mutable ivState): the on-disk payload
    * becomes [1B ivLen][iv][AES-CTR ciphertext] with compression
    * applied BEFORE encryption and the header left plaintext
    * (HFileBlockDefaultEncodingContext.compressAfterEncoding). Returns
    * the on-disk size including header and checksums. */
  private def writeBlock(out: CountingOutput, magic: Array[Byte],
      payload: Array[Byte], prevOffsetSameType: Long,
      bytesPerChecksum: Int, codec: Int = CompressionNone,
      crypto: Option[(Array[Byte], Array[Byte])] = None): Int = {
    val plainOnDisk = compressPayload(codec, payload)
    val onDisk = crypto match {
      case None => plainOnDisk
      case Some((key, iv)) =>
        if (plainOnDisk.isEmpty) Array[Byte](0)
        else {
          val framed = new ByteArrayOutputStream(plainOnDisk.length + 17)
          framed.write(iv.length)
          framed.write(iv, 0, iv.length)
          val ct = HCrypto.ctr(key, iv, plainOnDisk)
          framed.write(ct, 0, ct.length)
          // reference increments by 1 + cryptoStream.size/16 where the
          // stream holds header + frame at that point
          HCrypto.incrementIv(iv, 1 + (HeaderSize + framed.size()) / 16)
          framed.toByteArray
        }
    }
    val onDiskDataSizeWithHeader = HeaderSize + onDisk.length
    val nChunks =
      (onDiskDataSizeWithHeader + bytesPerChecksum - 1) / bytesPerChecksum
    val checksumBytes = nChunks * 4
    val header = ByteBuffer.allocate(HeaderSize)
    header.put(magic)
    header.putInt(onDisk.length + checksumBytes)  // onDiskSizeWithoutHeader
    header.putInt(payload.length)                 // uncompressedSizeWithoutHeader
    header.putLong(prevOffsetSameType)
    header.put(ChecksumCrc32C)
    header.putInt(bytesPerChecksum)
    header.putInt(onDiskDataSizeWithHeader)
    val headerArr = header.array()

    val body = new Array[Byte](onDiskDataSizeWithHeader)
    System.arraycopy(headerArr, 0, body, 0, HeaderSize)
    System.arraycopy(onDisk, 0, body, HeaderSize, onDisk.length)

    out.write(body)
    var chunk = 0
    val sums = ByteBuffer.allocate(checksumBytes)
    while (chunk < nChunks) {
      val start = chunk * bytesPerChecksum
      val len = math.min(bytesPerChecksum, onDiskDataSizeWithHeader - start)
      val crc = new CRC32C
      crc.update(body, start, len)
      sums.putInt(crc.getValue.toInt)
      chunk += 1
    }
    out.write(sums.array())
    onDiskDataSizeWithHeader + checksumBytes
  }

  /** Stream `cells` (must already be in [[compareCells]] order — an
    * out-of-order cell raises, mirroring HFileWriterImpl.checkKey) into
    * a complete v3 file on `out`. With `rowBloom` (the reference's
    * default BLOOMFILTER => 'ROW'), compound Bloom chunks land as
    * BLMFBLK2 blocks with a BLMFMET2 load-on-open meta — byte-faithful
    * CompoundBloomFilterWriter output ([[HBloom]]). Returns the cell
    * count. */
  /** ROWCOL bloom key for one cell (RowColBloomHashKey.java:28-46 —
    * "KeyValue serialization format with empty column family"):
    * 2B rowLen, row, 1B famLen=0, qualifier, 8B LATEST_TIMESTAMP
    * (Long.MaxValue), 1B Type.Maximum (0xff). The probe side builds
    * the identical bytes (createFirstOnRow with empty family,
    * StoreFileReader.java:241). */
  private[graft] def rowColBloomKey(row: Array[Byte], qualifier: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(2 + row.length + 1 + qualifier.length + 9)
    bb.putShort(row.length.toShort)
    bb.put(row)
    bb.put(0.toByte)
    bb.put(qualifier)
    bb.putLong(Long.MaxValue)
    bb.put(0xff.toByte)
    bb.array()
  }

  def write(out: OutputStream, cells: Iterator[HCell],
      blockSize: Int = 65536, bytesPerChecksum: Int = 16384,
      rowBloom: Boolean = true, gz: Boolean = false,
      encoding: Int = BlockEncoding.IdNone,
      compression: Int = CompressionNone,
      indexMaxChunk: Int = 128 * 1024,
      rowColBloom: Boolean = false,
      encryption: Option[HCrypto.Ctx] = None,
      withTags: Boolean = false,
      compressTags: Boolean = false,
      rowPrefixBloom: Option[Int] = None,
      extraFileInfo: => Seq[(String, Array[Byte])] = Nil): Long = {
    require(bytesPerChecksum >= HeaderSize, "bytesPerChecksum too small")
    require(!(rowColBloom && rowPrefixBloom.isDefined),
      "ROWCOL and ROWPREFIX_FIXED_LENGTH blooms are mutually exclusive")
    rowPrefixBloom.foreach(n =>
      require(n > 0, s"rowprefix bloom length must be positive: $n"))
    require(!(gz && compression != CompressionNone && compression != CompressionGz),
      "pass either gz=true or a compression ordinal, not both")
    // TAGS_COMPRESSED is only effective with an encoding
    // (HFileWriterImpl.java:873: encoding != NONE && compressTags)
    require(!compressTags || (withTags && encoding != BlockEncoding.IdNone),
      "compressTags requires withTags and a data block encoding")
    val codec = if (gz) CompressionGz else compression
    // per-file random starting IV, advancing per block (the reference
    // draws Bytes.secureRandom once at encoding-context init)
    val crypto: Option[(Array[Byte], Array[Byte])] = encryption.map { e =>
      val iv = new Array[Byte](HCrypto.IvLength)
      new java.security.SecureRandom().nextBytes(iv)
      (e.key, iv)
    }
    val encoded = encoding != BlockEncoding.IdNone
    val co = new CountingOutput(out)
    val dataBlocks = scala.collection.mutable.ArrayBuffer.empty[BlockRecord]
    var prevDataOffset = -1L
    var entryCount = 0L
    var totalUncompressed = 0L
    var keyLenSum = 0L
    var valLenSum = 0L
    var maxTagsLen = 0
    // TimeRangeTracker's initial state (min=MAX, max=-1); every cell's
    // ts folds in — the TIMERANGE FILE_INFO entry readers prune
    // timerange scans with (HStoreFile.java:109,516)
    var trMin = Long.MaxValue
    var trMax = -1L
    var lastCell: HCell = null
    var firstKeyOfBlock: Array[Byte] = null
    val buf = new ByteSink(blockSize + 4096)
    // encoded path: cells accumulate per block and encode at close
    // (the reference likewise encodes through the block writer's
    // in-memory stream before the on-disk compress/checksum step)
    val encCells = scala.collection.mutable.ArrayBuffer.empty[HCell]
    var encUnencodedSize = 0
    // compound ROW bloom state (one key per distinct row)
    val bloomChunks = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Array[Byte], HBloom.Chunk)] // offset, size, firstRow, chunk
    var bloomChunk: HBloom.Chunk = null
    var bloomPrev: HBloom.Chunk = null
    var bloomFirstRow: Array[Byte] = null
    var bloomKeyCount = 0L
    var prevBloomOffset = -1L

    def flushBloomChunk(): Unit = if (bloomChunk != null && bloomChunk.keyCount > 0) {
      bloomChunk.compact()
      val offset = co.pos
      val onDisk = writeBlock(co, MagicBloom, bloomChunk.bits,
        prevBloomOffset, bytesPerChecksum, codec, crypto)
      prevBloomOffset = offset
      totalUncompressed += HeaderSize + bloomChunk.bits.length
      bloomChunks += ((offset, onDisk, bloomFirstRow, bloomChunk))
      bloomPrev = bloomChunk
      bloomChunk = null
      bloomFirstRow = null
    }

    // multi-level index state (HFileBlockIndex.BlockIndexWriter):
    // data-block entries accumulate in an inline leaf chunk; when its
    // NON-ROOT serialized size passes indexMaxChunk the chunk lands
    // inline as an IDXLEAF2 block and becomes one entry of the next
    // level up. Small files never flush a leaf and stay single-level.
    val curLeaf = scala.collection.mutable.ArrayBuffer.empty[BlockRecord]
    var curLeafSize = 8 // int numEntries + the extra secondary-index int
    val leafBlocks = scala.collection.mutable.ArrayBuffer.empty[BlockRecord]
    val leafSubCounts = scala.collection.mutable.ArrayBuffer.empty[Long]
    var prevLeafOffset = -1L

    def flushLeafChunk(): Unit = if (curLeaf.nonEmpty) {
      val payload = nonRootIndexPayload(curLeaf.toSeq)
      val offset = co.pos
      val onDisk = writeBlock(co, MagicLeafIdx, payload,
        prevLeafOffset, bytesPerChecksum, codec, crypto)
      prevLeafOffset = offset
      totalUncompressed += HeaderSize + payload.length
      leafBlocks += BlockRecord(offset, onDisk, curLeaf.head.firstKey)
      leafSubCounts += curLeaf.size.toLong
      curLeaf.clear()
      curLeafSize = 8
    }

    def closeDataBlock(): Unit = if (buf.size() > 0 || encCells.nonEmpty) {
      val payload =
        if (encoded) BlockEncoding.encodePayload(encoding, encCells.toIndexedSeq,
          withTags, compressTags)
        else buf.toByteArray
      val offset = co.pos
      val onDisk = writeBlock(co, if (encoded) MagicDataEncoded else MagicData,
        payload, prevDataOffset, bytesPerChecksum, codec, crypto)
      dataBlocks += BlockRecord(offset, onDisk, firstKeyOfBlock)
      curLeaf += BlockRecord(offset, onDisk, firstKeyOfBlock)
      curLeafSize += 4 + 12 + firstKeyOfBlock.length // secondary-index int + entry
      prevDataOffset = offset
      totalUncompressed += HeaderSize + payload.length
      buf.reset()
      encCells.clear()
      encUnencodedSize = 0
      firstKeyOfBlock = null
      if (curLeafSize >= indexMaxChunk) flushLeafChunk()
    }

    for (c <- cells) {
      if (lastCell != null && compareCells(lastCell, c) > 0)
        throw new IllegalArgumentException(
          s"cells out of order: ${new String(lastCell.row, StandardCharsets.UTF_8)} > " +
            new String(c.row, StandardCharsets.UTF_8))
      // ROWPREFIX_FIXED_LENGTH key: the row's first min(n, rowLen)
      // bytes (RowPrefixFixedLengthBloomContext.java:55 —
      // getRowPrefixCell truncates with Math.min)
      def prefixKey(row: Array[Byte]): Array[Byte] = {
        val n = rowPrefixBloom.get
        if (row.length <= n) row else java.util.Arrays.copyOf(row, n)
      }
      val isNewBloomKey =
        if (!rowBloom) false
        else if (rowColBloom)
          lastCell == null || compareBytes(lastCell.row, c.row) != 0 ||
            compareBytes(lastCell.qualifier, c.qualifier) != 0
        else if (rowPrefixBloom.isDefined)
          lastCell == null ||
            compareBytes(prefixKey(lastCell.row), prefixKey(c.row)) != 0
        else lastCell == null || compareBytes(lastCell.row, c.row) != 0
      if (isNewBloomKey) {
        val bloomKey =
          if (rowColBloom) rowColBloomKey(c.row, c.qualifier)
          else if (rowPrefixBloom.isDefined) prefixKey(c.row)
          else c.row
        if (bloomChunk == null) {
          bloomChunk =
            if (bloomPrev != null) bloomPrev.createAnother()
            else HBloom.createBySize()
          bloomFirstRow = bloomKey
        }
        bloomChunk.add(bloomKey)
        bloomKeyCount += 1
        if (bloomChunk.keyCount >= bloomChunk.maxKeys) {
          // chunk full: flush inline (blooms may interleave with data
          // blocks — readers locate them via the meta's own index)
          closeDataBlock()
          flushBloomChunk()
        }
      }
      lastCell = c
      if (c.ts < trMin) trMin = c.ts
      if (c.ts > trMax) trMax = c.ts
      val keyLen = 2 + c.row.length + 1 + c.family.length + c.qualifier.length + 9
      if (firstKeyOfBlock == null) firstKeyOfBlock = cellKeyBytes(c)
      if (encoded) {
        // split on UNENCODED size like the reference's
        // blockSizeWritten check — block boundaries are free
        encCells += c
        encUnencodedSize += 8 + keyLen + c.value.length
        if (withTags) {
          encUnencodedSize += 2 + c.tags.length
          if (c.tags.length > maxTagsLen) maxTagsLen = c.tags.length
        }
      } else {
        // NoneEncoder wire format (no mvcc on the write side; tags iff
        // the file declares them — KeyValue trailing tag section); the
        // key fields stream straight into the sink, byte-identical to
        // writing cellKeyBytes(c)
        buf.writeInt(keyLen)
        buf.writeInt(c.value.length)
        buf.writeShort(c.row.length)
        buf.write(c.row)
        buf.write(c.family.length)
        buf.write(c.family)
        buf.write(c.qualifier)
        buf.writeLong(c.ts)
        buf.write(c.typ.toInt)
        buf.write(c.value)
        if (withTags) {
          buf.writeShort(c.tags.length)
          buf.write(c.tags)
          if (c.tags.length > maxTagsLen) maxTagsLen = c.tags.length
        }
      }
      keyLenSum += keyLen
      valLenSum += c.value.length
      entryCount += 1
      if ((if (encoded) encUnencodedSize else buf.size()) >= blockSize)
        closeDataBlock()
    }
    closeDataBlock()
    flushBloomChunk()

    val firstDataOffset = if (dataBlocks.nonEmpty) dataBlocks.head.offset else -1L
    val lastDataOffset = if (dataBlocks.nonEmpty) dataBlocks.last.offset else -1L

    // --- data index: single-level root, or leaf chunks + optional
    // intermediate levels + root (HFileBlockIndex.writeIndexBlocks) ---
    def rootFormatSize(entries: Seq[BlockRecord]): Int =
      entries.map(e => 8 + 4 + vlongSize(e.firstKey.length) + e.firstKey.length).sum
    var numLevels = 1
    var rootEntries: Seq[BlockRecord] = dataBlocks.toSeq
    var midKeyMeta: Array[Byte] = null
    if (leafBlocks.nonEmpty) {
      flushLeafChunk() // the tail leaf
      rootEntries = leafBlocks.toSeq
      numLevels = 2
      // mid-key metadata: the leaf holding the middle data block +
      // the in-leaf index of that block (getMidKeyMetadata)
      val totalSub = leafSubCounts.sum
      val midSub = (totalSub - 1) / 2
      var acc = 0L
      var leafIdx = 0
      while (acc + leafSubCounts(leafIdx) <= midSub) {
        acc += leafSubCounts(leafIdx); leafIdx += 1
      }
      val mm = ByteBuffer.allocate(16)
      mm.putLong(leafBlocks(leafIdx).offset)
      mm.putInt(leafBlocks(leafIdx).onDiskSizeWithHeader)
      mm.putInt((midSub - acc).toInt)
      midKeyMeta = mm.array()
      // intermediate levels until the root fits (min 16 entries —
      // the HBASE-16288 floor)
      while (rootFormatSize(rootEntries) > indexMaxChunk &&
          rootEntries.size > 16 && numLevels < 16) {
        val parent = scala.collection.mutable.ArrayBuffer.empty[BlockRecord]
        val chunk = scala.collection.mutable.ArrayBuffer.empty[BlockRecord]
        var chunkSize = 8
        var prevInterOffset = -1L
        def flushInter(): Unit = if (chunk.nonEmpty) {
          val payload = nonRootIndexPayload(chunk.toSeq)
          val offset = co.pos
          val onDisk = writeBlock(co, MagicInterIdx, payload,
            prevInterOffset, bytesPerChecksum, codec, crypto)
          prevInterOffset = offset
          totalUncompressed += HeaderSize + payload.length
          parent += BlockRecord(offset, onDisk, chunk.head.firstKey)
          chunk.clear()
          chunkSize = 8
        }
        for ((e, i) <- rootEntries.zipWithIndex) {
          chunk += e
          chunkSize += 4 + 12 + e.firstKey.length
          if (i >= 16 && chunkSize >= indexMaxChunk) flushInter()
        }
        flushInter()
        rootEntries = parent.toSeq
        numLevels += 1
      }
    }
    val rootIndexOffset = co.pos
    val idxBuf = new ByteArrayOutputStream()
    val idxDos = new DataOutputStream(idxBuf)
    for (b <- rootEntries) {
      idxDos.writeLong(b.offset)
      idxDos.writeInt(b.onDiskSizeWithHeader)
      writeVLong(idxDos, b.firstKey.length.toLong) // Bytes.writeByteArray
      idxDos.write(b.firstKey)
    }
    if (midKeyMeta != null) idxDos.write(midKeyMeta)
    val rootPayload = idxBuf.toByteArray
    writeBlock(co, MagicRootIdx, rootPayload, -1L, bytesPerChecksum, codec, crypto)
    totalUncompressed += HeaderSize + rootPayload.length

    // --- meta index (empty single-level root) ---
    writeBlock(co, MagicRootIdx, Array.emptyByteArray, rootIndexOffset, bytesPerChecksum, codec, crypto)
    totalUncompressed += HeaderSize

    // --- file info ---
    val fileInfoOffset = co.pos
    val fiEntries = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])]
    def i32(v: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(v).array()
    if (lastCell != null)
      fiEntries += (("hfile.LASTKEY".getBytes(StandardCharsets.US_ASCII),
        cellKeyBytes(lastCell)))
    if (lastCell != null) {
      // HBASE-21012 DataOutput form: two big-endian longs (min, max) —
      // TimeRangeTracker.toByteArray; readers also accept the PB form
      fiEntries += (("TIMERANGE".getBytes(StandardCharsets.US_ASCII),
        ByteBuffer.allocate(16).putLong(trMin).putLong(trMax).array()))
    }
    val avgK = if (entryCount == 0) 0 else (keyLenSum / entryCount).toInt
    val avgV = if (entryCount == 0) 0 else (valLenSum / entryCount).toInt
    fiEntries += (("hfile.AVG_KEY_LEN".getBytes(StandardCharsets.US_ASCII), i32(avgK)))
    fiEntries += (("hfile.AVG_VALUE_LEN".getBytes(StandardCharsets.US_ASCII), i32(avgV)))
    if (withTags) {
      // HFileWriterImpl.finishFileInfo when isIncludesTags: the reader
      // keys per-cell tag parsing off MAX_TAGS_LEN's presence
      fiEntries += (("hfile.MAX_TAGS_LEN".getBytes(StandardCharsets.US_ASCII),
        i32(maxTagsLen)))
      // Bytes.toBytes(boolean): one byte, -1 for true
      fiEntries += (("hfile.TAGS_COMPRESSED".getBytes(StandardCharsets.US_ASCII),
        Array[Byte](if (compressTags && encoded) -1 else 0)))
    }
    for ((k, v) <- extraFileInfo)
      fiEntries += ((k.getBytes(StandardCharsets.US_ASCII), v))
    if (bloomChunks.nonEmpty) {
      fiEntries += (("BLOOM_FILTER_TYPE".getBytes(StandardCharsets.US_ASCII),
        (if (rowColBloom) "ROWCOL"
         else if (rowPrefixBloom.isDefined) "ROWPREFIX_FIXED_LENGTH"
         else "ROW").getBytes(StandardCharsets.US_ASCII)))
      // BLOOM_FILTER_PARAM: the prefix length as a 4-byte big-endian
      // int (BloomFilterUtil.getBloomFilterParam → Bytes.toBytes(int);
      // read back by StoreFileReader.loadFileInfo's Bytes.toInt)
      for (n <- rowPrefixBloom)
        fiEntries += (("BLOOM_FILTER_PARAM".getBytes(StandardCharsets.US_ASCII),
          ByteBuffer.allocate(4).putInt(n).array()))
      // LAST_BLOOM_KEY (BloomContext.addLastBloomKey /
      // RowColBloomContext.java:44): the last bloom key written
      if (lastCell != null)
        fiEntries += (("LAST_BLOOM_KEY".getBytes(StandardCharsets.US_ASCII),
          if (rowColBloom) rowColBloomKey(lastCell.row, lastCell.qualifier)
          else if (rowPrefixBloom.isDefined) {
            val n = rowPrefixBloom.get
            if (lastCell.row.length <= n) lastCell.row
            else java.util.Arrays.copyOf(lastCell.row, n)
          } else lastCell.row))
    }
    if (encoded)
      fiEntries += (("DATA_BLOCK_ENCODING".getBytes(StandardCharsets.US_ASCII),
        BlockEncoding.nameOf(encoding).getBytes(StandardCharsets.US_ASCII)))
    // FileInfoProto { repeated BytesBytesPair map_entry = 1 }; pairs
    // sorted by key bytes (HFileInfo is a sorted map)
    val fiBody = new ByteArrayOutputStream()
    for ((k, v) <- fiEntries.sortWith((a, b) => compareBytes(a._1, b._1) < 0)) {
      val pair = new ByteArrayOutputStream()
      pbBytesField(pair, 1, k)
      pbBytesField(pair, 2, v)
      pbBytesField(fiBody, 1, pair.toByteArray)
    }
    val fiPayload = new ByteArrayOutputStream()
    fiPayload.write(PbMagic)
    writeVarint(fiPayload, fiBody.size().toLong) // writeDelimitedTo framing
    fiBody.writeTo(fiPayload)
    val fiBytes = fiPayload.toByteArray
    writeBlock(co, MagicFileInfo, fiBytes, -1L, bytesPerChecksum, codec, crypto)
    totalUncompressed += HeaderSize + fiBytes.length

    // --- general bloom meta (load-on-open, after file info — the
    // additionalLoadOnOpenData slot, HFileWriterImpl.java:716-719) ---
    if (bloomChunks.nonEmpty) {
      val bm = new ByteArrayOutputStream()
      val bmd = new DataOutputStream(bm)
      bmd.writeInt(HBloom.Version)
      bmd.writeLong(bloomChunks.map(_._4.byteSize.toLong).sum)
      bmd.writeInt(bloomChunks.head._4.hashCount)
      bmd.writeInt(HBloom.HashTypeMurmur)
      bmd.writeLong(bloomKeyCount)
      bmd.writeLong(bloomChunks.map(_._4.maxKeys).sum)
      bmd.writeInt(bloomChunks.size)
      if (rowColBloom) {
        // ROWCOL chunks index by CELL keys: the meta names the
        // comparator class (CompoundBloomFilterWriter.MetaWriter:254)
        val cmp = ComparatorName.getBytes(StandardCharsets.UTF_8)
        writeVLong(bmd, cmp.length.toLong)
        bmd.write(cmp)
      } else {
        writeVLong(bmd, 0L) // null comparator = vint 0 (raw ROW keys)
      }
      for ((offset, onDisk, firstRow, _) <- bloomChunks) {
        bmd.writeLong(offset)
        bmd.writeInt(onDisk)
        writeVLong(bmd, firstRow.length.toLong)
        bmd.write(firstRow)
      }
      val bmBytes = bm.toByteArray
      writeBlock(co, MagicBloomMeta, bmBytes, -1L, bytesPerChecksum, codec, crypto)
      totalUncompressed += HeaderSize + bmBytes.length
    }

    // --- trailer ---
    val pb = new ByteArrayOutputStream()
    pbVarintField(pb, 1, fileInfoOffset)
    pbVarintField(pb, 2, rootIndexOffset) // load_on_open_data_offset
    pbVarintField(pb, 3, (HeaderSize + rootPayload.length).toLong) // uncompr. index size
    pbVarintField(pb, 4, totalUncompressed)
    pbVarintField(pb, 5, rootEntries.size.toLong) // data_index_count (root level)
    pbVarintField(pb, 6, 0L)                     // meta_index_count
    pbVarintField(pb, 7, entryCount)
    pbVarintField(pb, 8, numLevels.toLong)       // num_data_index_levels
    pbVarintField(pb, 9, firstDataOffset)
    pbVarintField(pb, 10, lastDataOffset)
    pbBytesField(pb, 11, ComparatorName.getBytes(StandardCharsets.UTF_8))
    pbVarintField(pb, 12, codec.toLong)
    // encryption_key (field 13): the per-file data key wrapped under
    // the subject master key (HFileWriterImpl.finishClose)
    for (e <- encryption)
      pbBytesField(pb, 13, HCrypto.wrapKey(e.subject, e.key))
    val pbBytes = pb.toByteArray
    val trailer = new ByteArrayOutputStream()
    trailer.write(MagicTrailer)
    writeVarint(trailer, pbBytes.length.toLong)
    trailer.write(pbBytes)
    val padding = TrailerSize - 8 - 4 - (trailer.size() - 8)
    require(padding >= 0, "trailer pb exceeded fixed size")
    trailer.write(new Array[Byte](padding))
    val verInt = (MajorVersion & 0x00ffffff) | (MinorVersion << 24)
    trailer.write(ByteBuffer.allocate(4).putInt(verInt).array())
    co.write(trailer.toByteArray)
    entryCount
  }

  /** Convenience: whole file as a byte array. */
  def writeBytes(cells: Iterator[HCell], blockSize: Int = 65536): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    write(bos, cells, blockSize)
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Reader
  // ------------------------------------------------------------------

  final case class Trailer(
      fileInfoOffset: Long, loadOnOpenOffset: Long, entryCount: Long,
      dataIndexCount: Int, metaIndexCount: Int, numDataIndexLevels: Int,
      firstDataBlockOffset: Long, lastDataBlockOffset: Long,
      comparatorClassName: String, compressionCodec: Int,
      majorVersion: Int, minorVersion: Int,
      encryptionKey: Option[Array[Byte]] = None)

  /** Parse the fixed trailer from the last [[TrailerSize]] bytes. */
  def readTrailer(tail: Array[Byte]): Trailer = {
    require(tail.length >= TrailerSize, s"need $TrailerSize trailer bytes")
    val t = ByteBuffer.wrap(tail, tail.length - TrailerSize, TrailerSize).slice()
    val magic = new Array[Byte](8)
    t.get(magic)
    require(java.util.Arrays.equals(magic, MagicTrailer),
      "not an HFile v2/v3 trailer (bad magic)")
    val verInt = t.getInt(TrailerSize - 4)
    val major = verInt & 0x00ffffff
    val minor = verInt >>> 24
    require(major == 2 || major == 3, s"unsupported HFile major version $major")
    val pbLen = readVarint(t).toInt
    var fileInfoOffset = 0L; var loadOnOpen = 0L; var entryCount = 0L
    var dataIdxCount = 0; var metaIdxCount = 0; var levels = 1
    var firstData = -1L; var lastData = -1L
    var comparator = ""; var codec = CompressionNone
    var encKey: Option[Array[Byte]] = None
    val end = t.position() + pbLen
    while (t.position() < end) {
      val tag = readVarint(t)
      val field = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      wire match {
        case 0 =>
          val v = readVarint(t)
          field match {
            case 1 => fileInfoOffset = v
            case 2 => loadOnOpen = v
            case 5 => dataIdxCount = v.toInt
            case 6 => metaIdxCount = v.toInt
            case 7 => entryCount = v
            case 8 => levels = v.toInt
            case 9 => firstData = v
            case 10 => lastData = v
            case 12 => codec = v.toInt
            case _ => // 3,4,16: sizes/checksum we don't need
          }
        case 2 =>
          val len = readVarint(t).toInt
          val b = new Array[Byte](len)
          t.get(b)
          field match {
            case 11 => comparator = new String(b, StandardCharsets.UTF_8)
            case 13 => encKey = Some(b) // wrapped per-file data key
            case _ => // key namespaces — unsupported, ignored
          }
        case 5 => t.getInt
        case 1 => t.getLong
        case w => throw new IllegalArgumentException(s"bad pb wire type $w")
      }
    }
    Trailer(fileInfoOffset, loadOnOpen, entryCount, dataIdxCount, metaIdxCount,
      levels, firstData, lastData, comparator, codec, major, minor, encKey)
  }

  /** Unwrap the trailer's per-file data key under `subject` (None for
    * unencrypted files) — resolve once per file, pass to every
    * [[readBlockAt]]. */
  def dataKeyOf(trailer: Trailer,
      subject: String = HCrypto.DefaultSubject): Option[Array[Byte]] =
    trailer.encryptionKey.map(HCrypto.unwrapKey(subject, _))

  final case class RawBlock(offset: Long, magic: String, payload: Array[Byte],
      onDiskSizeWithHeader: Int)

  /** Positional read: `pread(offset, len)` returns exactly `len` bytes.
    * The whole reader runs against this, so an executor can stream a
    * multi-GB HFile from any Hadoop FileSystem holding ONE block in
    * memory at a time (FSDataInputStream pread — the same access shape
    * HFileBlock.FSReaderImpl uses). */
  type PRead = (Long, Int) => Array[Byte]

  private def preadOf(bytes: Array[Byte]): PRead = (off, len) =>
    java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len)

  /** Read-ahead wrapper for SEQUENTIAL block walks ([[readCellsFrom]]):
    * serves each request from a `chunk`-sized window, refilling from
    * the underlying `pread` only when the request leaves it. A 4 KiB
    * block walk over a Hadoop FileSystem otherwise pays two positional
    * reads per block (header probe + body) — each a pread syscall plus
    * the ChecksumFileSystem's `.crc` sidecar verification. Window size
    * amortizes that to one underlying read per `chunk`. Random access
    * still works (any miss just refills), it is merely unbuffered. */
  def bufferedPRead(pread: PRead, fileLen: Long, chunk: Int = 1 << 20): PRead = {
    var bufOff = 0L
    var buf: Array[Byte] = Array.emptyByteArray
    (off, len) => {
      if (off < bufOff || off + len > bufOff + buf.length) {
        val want = math.max(len.toLong, math.min(chunk.toLong, fileLen - off)).toInt
        buf = pread(off, want)
        bufOff = off
      }
      if (off == bufOff && len == buf.length) buf
      else {
        val rel = (off - bufOff).toInt
        java.util.Arrays.copyOfRange(buf, rel, rel + len)
      }
    }
  }

  /** Read one block at `pos`, verifying checksums. `codec` is the
    * trailer's compression ordinal — blocks do not self-describe their
    * codec, exactly like the reference (HFileBlock.FSReaderImpl gets
    * it from the reader context). Returns the block and the position
    * just after it. */
  private def readBlockAt(pread: PRead, pos: Long, codec: Int,
      key: Option[Array[Byte]] = None): (RawBlock, Long) = {
    val bytes = pread(pos, HeaderSize)
    val bb = ByteBuffer.wrap(bytes, 0, HeaderSize).slice()
    val magic = new Array[Byte](8)
    bb.get(magic)
    val onDiskSizeWithoutHeader = bb.getInt
    val uncompressedSize = bb.getInt
    bb.getLong // prevBlockOffset
    val checksumType = bb.get()
    val bytesPerChecksum = bb.getInt
    val onDiskDataSizeWithHeader = bb.getInt
    val totalOnDisk = HeaderSize + onDiskSizeWithoutHeader
    val checksumBytes = totalOnDisk - onDiskDataSizeWithHeader
    require(checksumBytes >= 0, "negative checksum section")
    val body = pread(pos, totalOnDisk)
    if (checksumType != ChecksumNull && checksumBytes > 0) {
      val nChunks = checksumBytes / 4
      var chunk = 0
      while (chunk < nChunks) {
        val start = chunk * bytesPerChecksum
        val len = math.min(bytesPerChecksum, onDiskDataSizeWithHeader - start)
        val crc = if (checksumType == ChecksumCrc32C) new CRC32C else new CRC32
        crc.update(body, start, len)
        val stored = ByteBuffer
          .wrap(body, onDiskDataSizeWithHeader + chunk * 4, 4).getInt
        if (stored != crc.getValue.toInt)
          throw new IllegalStateException(
            s"checksum mismatch in block at $pos chunk $chunk")
        chunk += 1
      }
    }
    val payloadLen = onDiskDataSizeWithHeader - HeaderSize
    val payload = key match {
      case Some(k) =>
        // encrypted frame: [1B ivLen][iv][AES-CTR((compressed) payload)]
        require(payloadLen >= 1, "encrypted block with empty frame")
        val ivLen = body(HeaderSize) & 0xff
        require(payloadLen >= 1 + ivLen, "encrypted block frame truncated")
        val plain =
          if (payloadLen == 1 && ivLen == 0) Array.emptyByteArray
          else {
            val iv = java.util.Arrays.copyOfRange(
              body, HeaderSize + 1, HeaderSize + 1 + ivLen)
            HCrypto.ctr(k, iv, body, HeaderSize + 1 + ivLen,
              payloadLen - 1 - ivLen)
          }
        if (codec == CompressionNone) {
          require(plain.length == uncompressedSize,
            "decrypted block size != declared uncompressed size")
          plain
        } else decompressPayload(codec, plain, 0, plain.length, uncompressedSize)
      case None =>
        if (codec == CompressionNone) {
          require(payloadLen == uncompressedSize,
            "NONE-codec block with payload size != uncompressed size")
          java.util.Arrays.copyOfRange(body, HeaderSize, onDiskDataSizeWithHeader)
        } else decompressPayload(codec, body, HeaderSize, payloadLen, uncompressedSize)
    }
    (RawBlock(pos, new String(magic, StandardCharsets.US_ASCII),
      payload, totalOnDisk), pos + totalOnDisk)
  }

  /** File-info map (key string → bytes) from the FILE_INFO block. */
  def readFileInfo(pread: PRead, trailer: Trailer,
      subject: String = HCrypto.DefaultSubject): Map[String, Array[Byte]] = {
    val (blk, _) = readBlockAt(pread, trailer.fileInfoOffset,
      trailer.compressionCodec, dataKeyOf(trailer, subject))
    require(blk.magic == "FILEINF2", s"expected FILEINF2, got ${blk.magic}")
    val bb = ByteBuffer.wrap(blk.payload)
    val pbm = new Array[Byte](4)
    bb.get(pbm)
    require(java.util.Arrays.equals(pbm, PbMagic), "missing PBUF magic")
    val len = readVarint(bb).toInt
    val end = bb.position() + len
    val entries = scala.collection.mutable.Map.empty[String, Array[Byte]]
    while (bb.position() < end) {
      val tag = readVarint(bb)
      require((tag >> 3) == 1 && (tag & 7) == 2, "unexpected FileInfoProto field")
      val plen = readVarint(bb).toInt
      val pend = bb.position() + plen
      var k: Array[Byte] = null; var v: Array[Byte] = null
      while (bb.position() < pend) {
        val ptag = readVarint(bb)
        val flen = readVarint(bb).toInt
        val b = new Array[Byte](flen)
        bb.get(b)
        if ((ptag >> 3) == 1) k = b else v = b
      }
      entries += new String(k, StandardCharsets.UTF_8) -> v
    }
    entries.toMap
  }

  /** Root data index entries: (offset, onDiskSizeWithHeader, firstKey). */
  def readRootIndex(bytes: Array[Byte], trailer: Trailer): Seq[(Long, Int, Array[Byte])] =
    readRootIndex(preadOf(bytes), trailer)

  /** The file's mid split ROW — the per-file half of
    * HStore.getSplitPoint: reader.midKey()
    * (HFileBlockIndex.BlockIndexReader.midkey — the middle root
    * entry's key for a single-level index, the mid-key metadata's
    * leaf entry for multi-level) reduced to its row, with the
    * degenerate guard of StoreUtils.getFileSplitPoint: a mid key
    * sharing its ROW with the file's first or last key means a split
    * would leave one daughter empty → None. */
  def midKeyRow(pread: PRead, fileLen: Long,
      subject: String = HCrypto.DefaultSubject): Option[Array[Byte]] = {
    val trailer = readTrailer(pread(fileLen - TrailerSize, TrailerSize))
    if (trailer.dataIndexCount == 0) return None
    val key = dataKeyOf(trailer, subject)
    val (blk, _) = readBlockAt(pread, trailer.loadOnOpenOffset,
      trailer.compressionCodec, key)
    require(blk.magic == "IDXROOT2", s"expected IDXROOT2, got ${blk.magic}")
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(blk.payload))
    val entries = (0 until trailer.dataIndexCount).map { _ =>
      val off = in.readLong()
      in.readInt()
      val klen = readVLong(in).toInt
      val k = new Array[Byte](klen)
      in.readFully(k)
      (off, k)
    }
    val midKey: Array[Byte] =
      if (trailer.numDataIndexLevels > 1) {
        // the 16-byte mid-key metadata after the root entries:
        // leaf offset + on-disk size + in-leaf entry index
        // (BlockIndexReader.readMultiLevelIndexRoot)
        val leafOff = in.readLong()
        in.readInt()
        val midIdx = in.readInt()
        val (leaf, _) = readBlockAt(pread, leafOff, trailer.compressionCodec, key)
        require(leaf.magic == "IDXLEAF2", s"expected IDXLEAF2, got ${leaf.magic}")
        parseNonRootIndex(leaf.payload)(midIdx)._3
      } else entries(trailer.dataIndexCount / 2)._2
    val midRow = decodeKey(midKey)._1
    val firstRow = decodeKey(entries.head._2)._1
    val lastRow = readFileInfo(pread, trailer, subject).get("hfile.LASTKEY")
      .map(decodeKey(_)._1)
    if (java.util.Arrays.equals(midRow, firstRow) ||
        lastRow.exists(java.util.Arrays.equals(midRow, _))) None
    else Some(midRow)
  }

  def readRootIndex(pread: PRead, trailer: Trailer,
      subject: String = HCrypto.DefaultSubject): Seq[(Long, Int, Array[Byte])] = {
    val (blk, _) = readBlockAt(pread, trailer.loadOnOpenOffset,
      trailer.compressionCodec, dataKeyOf(trailer, subject))
    require(blk.magic == "IDXROOT2", s"expected IDXROOT2, got ${blk.magic}")
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(blk.payload))
    (0 until trailer.dataIndexCount).map { _ =>
      val off = in.readLong()
      val sz = in.readInt()
      val klen = readVLong(in).toInt
      val key = new Array[Byte](klen)
      in.readFully(key)
      (off, sz, key)
    }
  }

  private def decodeKey(key: Array[Byte]): (Array[Byte], Array[Byte], Array[Byte], Long, Byte) = {
    val kb = ByteBuffer.wrap(key)
    val rowLen = kb.getShort & 0xffff
    val row = new Array[Byte](rowLen)
    kb.get(row)
    val famLen = kb.get() & 0xff
    val fam = new Array[Byte](famLen)
    kb.get(fam)
    val qual = new Array[Byte](key.length - 2 - rowLen - 1 - famLen - 8 - 1)
    kb.get(qual)
    val ts = kb.getLong
    val typ = kb.get()
    (row, fam, qual, ts, typ)
  }

  /** Per-file cell-decode settings, derived from FILE_INFO
    * (MAX_MEMSTORE_TS_KEY / hfile.MAX_TAGS_LEN /
    * hfile.TAGS_COMPRESSED — HFileWriterImpl:705,875,
    * HFileInfo.java:76-79). */
  private final case class DecodeCtx(withMvcc: Boolean, withTags: Boolean,
      compressTags: Boolean)

  private def decodeCtxOf(fi: Map[String, Array[Byte]]): DecodeCtx = DecodeCtx(
    withMvcc = fi.contains("MAX_MEMSTORE_TS_KEY"),
    withTags = fi.contains("hfile.MAX_TAGS_LEN"),
    compressTags = fi.get("hfile.TAGS_COMPRESSED").exists(b => b.nonEmpty && b(0) != 0))

  /** Decode one DATA / ENCODED_DATA block's cells — the dispatch
    * point between the NoneEncoder wire format and [[BlockEncoding]]'s
    * DATABLKE formats. */
  private def cellsOfDataBlock(blk: RawBlock, ctx: DecodeCtx): Iterator[HCell] =
    if (blk.magic == "DATABLKE")
      BlockEncoding.decodePayload(blk.payload, ctx.withMvcc, ctx.withTags, ctx.compressTags)
    else cellsOfNoneBlock(blk.payload, ctx)

  /** Decode every cell of a complete in-memory v3 file, walking the
    * scanned section sequentially (LEAF_INDEX / BLOOM_CHUNK blocks from
    * multi-level reference files are skipped by magic, so index depth
    * never matters). mvcc / tags presence comes from FILE_INFO
    * (MAX_MEMSTORE_TS_KEY / hfile.MAX_TAGS_LEN — HFileWriterImpl:705,
    * HFileInfo.java:79). */
  def readCells(bytes: Array[Byte],
      subject: String = HCrypto.DefaultSubject): Iterator[HCell] =
    readCellsFrom(preadOf(bytes), bytes.length.toLong, subject)

  /** Streaming decode against a positional reader — the executor-side
    * import path: at most one block is resident at a time. */
  def readCellsFrom(pread: PRead, fileLen: Long,
      subject: String = HCrypto.DefaultSubject): Iterator[HCell] = {
    // the walk is strictly sequential — buffer the positional reads so
    // small-block files (4 KiB store blocks) cost one underlying read
    // per megabyte instead of two per block
    val bp = bufferedPRead(pread, fileLen)
    val trailer = readTrailer(bp(fileLen - TrailerSize, TrailerSize))
    if (trailer.firstDataBlockOffset < 0) return Iterator.empty
    val key = dataKeyOf(trailer, subject)
    val ctx = decodeCtxOf(readFileInfo(bp, trailer, subject))
    val endPos = trailer.loadOnOpenOffset
    val blocks = Iterator.unfold(trailer.firstDataBlockOffset) { p =>
      if (p >= endPos) None
      else {
        val (blk, next) = readBlockAt(bp, p, trailer.compressionCodec, key)
        Some((blk, next))
      }
    }
    blocks.filter(b => b.magic == "DATABLK*" || b.magic == "DATABLKE")
      .flatMap(cellsOfDataBlock(_, ctx))
  }

  /** NoneEncoder cell stream, parsed with a plain array cursor — the
    * per-cell hot loop of every unencoded block read. (The previous
    * DataInputStream-over-ByteArrayInputStream form paid synchronized
    * single-byte reads plus an Option per cell.) */
  private def cellsOfNoneBlock(payload: Array[Byte], ctx: DecodeCtx): Iterator[HCell] =
    new Iterator[HCell] {
      private var pos = 0
      def hasNext: Boolean = pos < payload.length
      def next(): HCell = {
        val a = payload
        val keyLen = ((a(pos) & 0xff) << 24) | ((a(pos + 1) & 0xff) << 16) |
          ((a(pos + 2) & 0xff) << 8) | (a(pos + 3) & 0xff)
        val valLen = ((a(pos + 4) & 0xff) << 24) | ((a(pos + 5) & 0xff) << 16) |
          ((a(pos + 6) & 0xff) << 8) | (a(pos + 7) & 0xff)
        var p = pos + 8
        val keyEnd = p + keyLen
        val rowLen = ((a(p) & 0xff) << 8) | (a(p + 1) & 0xff)
        val row = java.util.Arrays.copyOfRange(a, p + 2, p + 2 + rowLen)
        p += 2 + rowLen
        val famLen = a(p) & 0xff
        val fam = java.util.Arrays.copyOfRange(a, p + 1, p + 1 + famLen)
        p += 1 + famLen
        val qual = java.util.Arrays.copyOfRange(a, p, keyEnd - 9)
        var ts = 0L
        var i = keyEnd - 9
        while (i < keyEnd - 1) { ts = (ts << 8) | (a(i) & 0xffL); i += 1 }
        val typ = a(keyEnd - 1)
        val value = java.util.Arrays.copyOfRange(a, keyEnd, keyEnd + valLen)
        p = keyEnd + valLen
        var tags = Array.emptyByteArray
        if (ctx.withTags) {
          val tagsLen = ((a(p) & 0xff) << 8) | (a(p + 1) & 0xff)
          p += 2
          if (tagsLen > 0) {
            tags = java.util.Arrays.copyOfRange(a, p, p + tagsLen)
            p += tagsLen
          }
        }
        var mvcc = 0L
        if (ctx.withMvcc) {
          val first = a(p)
          p += 1
          if (first >= -112) mvcc = first.toLong
          else {
            val n = HadoopVLong.decodeVIntSize(first) - 1
            var j = 0
            while (j < n) { mvcc = (mvcc << 8) | (a(p) & 0xffL); p += 1; j += 1 }
            if (HadoopVLong.isNegative(first)) mvcc = ~mvcc
          }
        }
        pos = p
        HCell(row, fam, qual, ts, typ, value, mvcc, tags)
      }
    }

  /** Opened file for point reads — the reference's open-once Reader:
    * trailer + file-info load eagerly, data index / bloom meta load
    * lazily and amortize across gets, bloom chunk blocks cache by
    * offset. `get` is the Get read path (HFileReaderImpl.blockSeek):
    * ROW-bloom reject first (absent rows usually cost ONE cached bloom
    * probe), then a seek-before binary search of the block index and
    * reads of only the row's block span (a row may both start mid-block
    * and span blocks — the writer splits at cell boundaries). */
  final class HFileHandle(pread: PRead, fileLen: Long,
      subject: String = HCrypto.DefaultSubject) {
    val trailer: Trailer = readTrailer(pread(fileLen - TrailerSize, TrailerSize))
    private val dataKey = dataKeyOf(trailer, subject)
    private val fi = readFileInfo(pread, trailer, subject)
    private val ctx = decodeCtxOf(fi)
    private lazy val index = readRootIndex(pread, trailer, subject)

    private val bloomType: Option[String] =
      fi.get("BLOOM_FILTER_TYPE").map(new String(_, StandardCharsets.US_ASCII))

    /** ROWPREFIX_FIXED_LENGTH's fixed prefix length
      * (StoreFileReader.loadFileInfo: Bytes.toInt of
      * BLOOM_FILTER_PARAM). */
    private val bloomPrefixLen: Option[Int] =
      if (bloomType.contains("ROWPREFIX_FIXED_LENGTH"))
        fi.get("BLOOM_FILTER_PARAM").map(ByteBuffer.wrap(_).getInt)
      else None

    /** (hashCount, entries(offset, size, firstKey)) from BLMFMET2 —
      * located by walking the load-on-open section (HFileInfo reads
      * those blocks once at open; graft walks lazily on first get).
      * Keys are raw rows (ROW) or serialized rowcol keys (ROWCOL). */
    private lazy val bloom: Option[(Int, IndexedSeq[(Long, Int, Array[Byte])])] =
      bloomType match {
        case Some("ROW") | Some("ROWCOL") | Some("ROWPREFIX_FIXED_LENGTH") =>
          var pos = trailer.loadOnOpenOffset
          val end = fileLen - TrailerSize
          var found: Option[(Int, IndexedSeq[(Long, Int, Array[Byte])])] = None
          while (found.isEmpty && pos < end) {
            val (blk, next) = readBlockAt(pread, pos, trailer.compressionCodec, dataKey)
            if (blk.magic == "BLMFMET2") {
              val in = new java.io.DataInputStream(
                new java.io.ByteArrayInputStream(blk.payload))
              require(in.readInt() == HBloom.Version, "bloom meta version")
              in.readLong() // totalByteSize
              val hashCount = in.readInt()
              require(in.readInt() == HBloom.HashTypeMurmur, "bloom hash type")
              in.readLong(); in.readLong() // keyCount, maxKeys
              val numChunks = in.readInt()
              val cmpLen = readVLong(in).toInt
              in.skipBytes(cmpLen) // comparator name (vint 0 for ROW)
              val entries = (0 until numChunks).map { _ =>
                val off = in.readLong(); val sz = in.readInt()
                val klen = readVLong(in).toInt
                val key = new Array[Byte](klen)
                in.readFully(key)
                (off, sz, key)
              }
              found = Some((hashCount, entries))
            }
            pos = next
          }
          found
        case _ => None
      }

    private val chunkCache =
      scala.collection.mutable.Map.empty[Long, Array[Byte]]

    /** (row, qualifier) of a serialized rowcol bloom key (famLen=0). */
    private def rowQualOfBloomKey(k: Array[Byte]): (Array[Byte], Array[Byte]) = {
      val rl = ((k(0) & 0xff) << 8) | (k(1) & 0xff)
      (java.util.Arrays.copyOfRange(k, 2, 2 + rl),
        java.util.Arrays.copyOfRange(k, 2 + rl + 1, k.length - 9))
    }

    /** Probe the compound bloom with `key`, locating the chunk by the
      * given first-key ordering (raw rows for ROW; rowcol cell order
      * for ROWCOL — ts/type are constants in those keys). */
    private def bloomProbe(key: Array[Byte],
        cmp: (Array[Byte], Array[Byte]) => Int): Boolean = bloom match {
      case None => true // no bloom: cannot rule out
      case Some((hashCount, entries)) =>
        // last chunk whose firstKey <= key
        var lo = 0; var hi = entries.size - 1; var at = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (cmp(entries(mid)._3, key) <= 0) { at = mid; lo = mid + 1 }
          else hi = mid - 1
        }
        if (at < 0) false
        else {
          val bits = chunkCache.getOrElseUpdate(entries(at)._1,
            readBlockAt(pread, entries(at)._1, trailer.compressionCodec,
              dataKey)._1.payload)
          HBloom.contains(key, bits, hashCount)
        }
    }

    private def bloomSaysPresent(row: Array[Byte]): Boolean = bloomType match {
      case Some("ROW") => bloomProbe(row, compareBytes)
      case Some("ROWPREFIX_FIXED_LENGTH") =>
        // Get probe: key = the row's first min(n, rowLen) bytes
        // (StoreFileReader.passesGeneralRowPrefixBloomFilter:342-343)
        bloomPrefixLen.forall(n => bloomProbe(
          if (row.length <= n) row else java.util.Arrays.copyOf(row, n),
          compareBytes))
      case _ => true // ROWCOL can't serve a row-only probe
    }

    /** Prefix-scan reject (StoreFileReader
      * .passesGeneralRowPrefixBloomFilter:344-356): a scan whose
      * start/stop rows share at least the fixed prefix length probes
      * with that prefix; shorter common prefixes cannot use the bloom
      * (returns true). The S4 prefix-scan shape calls this before
      * opening a scanner over the file. */
    def mightContainPrefix(prefix: Array[Byte]): Boolean =
      (bloomType, bloomPrefixLen) match {
        case (Some("ROWPREFIX_FIXED_LENGTH"), Some(n)) =>
          if (prefix.length < n) true // common prefix shorter than n
          else bloomProbe(
            if (prefix.length == n) prefix
            else java.util.Arrays.copyOf(prefix, n), compareBytes)
        case _ => true
      }

    /** ROWCOL reject for a (row, qualifier) get
      * (StoreFileReader.passesGeneralRowColBloomFilter): both bloom
      * flavors can rule the probe out — ROW by the row alone. */
    private def bloomSaysPresentRowCol(row: Array[Byte],
        qualifier: Array[Byte]): Boolean = bloomType match {
      case Some("ROW") | Some("ROWPREFIX_FIXED_LENGTH") =>
        bloomSaysPresent(row)
      case Some("ROWCOL") =>
        bloomProbe(rowColBloomKey(row, qualifier), (a, b) => {
          val (ra, qa) = rowQualOfBloomKey(a)
          val (rb, qb) = rowQualOfBloomKey(b)
          val r = compareBytes(ra, rb)
          if (r != 0) r else compareBytes(qa, qb)
        })
      case _ => true
    }

    private def rowOfKey(k: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.wrap(k)
      val rl = bb.getShort & 0xffff
      java.util.Arrays.copyOfRange(k, 2, 2 + rl)
    }

    /** Seek-before within one index level: the entry BEFORE the first
      * whose first-key row >= target (HBase's seekBefore(firstOnRow)
      * shape). */
    private def seekBefore(entries: IndexedSeq[(Long, Int, Array[Byte])],
        row: Array[Byte]): Int = {
      var lo = 0; var hi = entries.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (compareBytes(rowOfKey(entries(mid)._3), row) < 0) lo = mid + 1
        else hi = mid
      }
      math.max(0, lo - 1)
    }

    def get(row: Array[Byte]): Seq[HCell] = getImpl(row, None)

    /** Single-column get — the probe shape that unlocks ROWCOL bloom
      * rejects (StoreFileReader.passesBloomFilter with one column):
      * an absent (row, qualifier) usually costs ONE cached bloom
      * probe even when the row itself exists. */
    def get(row: Array[Byte], qualifier: Array[Byte]): Seq[HCell] =
      getImpl(row, Some(qualifier))

    private def getImpl(row: Array[Byte],
        qualifier: Option[Array[Byte]]): Seq[HCell] = {
      if (trailer.firstDataBlockOffset < 0 || trailer.dataIndexCount == 0)
        return Seq.empty
      val pass = qualifier match {
        case Some(q) => bloomSaysPresentRowCol(row, q)
        case None => bloomSaysPresent(row)
      }
      if (!pass) return Seq.empty
      // descend the index: root → (intermediate…) → leaf → data-block
      // offset. Single-level files descend zero times; a multi-level
      // file (graft-written past indexMaxChunk, or any reference
      // 10 GB-norm region file) costs one block read per extra level.
      var entries: IndexedSeq[(Long, Int, Array[Byte])] = index.toIndexedSeq
      var level = trailer.numDataIndexLevels
      var startOffset = entries(seekBefore(entries, row))._1
      while (level > 1) {
        val (blk, _) = readBlockAt(pread, startOffset,
          trailer.compressionCodec, dataKey)
        require(blk.magic == "IDXLEAF2" || blk.magic == "IDXINTE2",
          s"expected index block at level $level, got ${blk.magic}")
        entries = parseNonRootIndex(blk.payload)
        startOffset = entries(seekBefore(entries, row))._1
        level -= 1
      }
      // forward walk from the seek target: data blocks decode, inline
      // leaf/bloom blocks skip by magic, done when a cell's row passes
      // the target (a row may start mid-block and span blocks)
      val out = scala.collection.mutable.ArrayBuffer.empty[HCell]
      var pos = startOffset
      var done = false
      while (pos < trailer.loadOnOpenOffset && !done) {
        val (blk, next) = readBlockAt(pread, pos, trailer.compressionCodec, dataKey)
        if (blk.magic == "DATABLK*" || blk.magic == "DATABLKE") {
          val it = cellsOfDataBlock(blk, ctx)
          while (it.hasNext && !done) {
            val c = it.next()
            val cmp = compareBytes(c.row, row)
            if (cmp == 0) {
              if (qualifier.forall(q => compareBytes(c.qualifier, q) == 0))
                out += c
            } else if (cmp > 0) done = true
          }
        }
        pos = next
      }
      out.toSeq
    }
  }

  /** One-shot point lookup (opens a throwaway [[HFileHandle]]). */
  def getRow(pread: PRead, fileLen: Long, row: Array[Byte]): Seq[HCell] =
    new HFileHandle(pread, fileLen).get(row)

  /** All raw blocks in file order (structural inspection for specs). */
  def readAllBlocks(bytes: Array[Byte],
      subject: String = HCrypto.DefaultSubject): Seq[RawBlock] = {
    val pread = preadOf(bytes)
    val trailer = readTrailer(
      java.util.Arrays.copyOfRange(bytes, bytes.length - TrailerSize, bytes.length))
    val key = dataKeyOf(trailer, subject)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[RawBlock]
    var pos = 0L
    val end = bytes.length - TrailerSize
    while (pos < end) {
      val (blk, next) = readBlockAt(pread, pos, trailer.compressionCodec, key)
      blocks += blk
      pos = next
    }
    blocks.toSeq
  }

  /** Array-convenience twin of [[readFileInfo]] for specs. */
  def readFileInfo(bytes: Array[Byte], trailer: Trailer): Map[String, Array[Byte]] =
    readFileInfo(preadOf(bytes), trailer)
}
