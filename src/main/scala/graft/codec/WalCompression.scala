package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/** The reference's WAL dictionary compression
  * (`hbase.regionserver.wal.enablecompression`): five LRU
  * dictionaries — REGION/TABLE (2^15−1 entries), FAMILY/QUALIFIER
  * (127), ROW (2^15−1) — shared between the WALKey fields and the
  * cell stream (CompressionContext.java:61-67,214-223). Byte arrays
  * code as either a 2-byte big-endian dictionary index, or the
  * NOT_IN_DICTIONARY status byte (0xFF) + raw varint length + bytes,
  * which ADDS the entry (WALCellCodec.writeCompressed:169-180,
  * readIntoArray:355-374).
  *
  * Synchronization is the whole game: the writer's find-hit and the
  * reader's get BOTH move the entry to the LRU head, and a put on a
  * full dictionary evicts the tail and RECYCLES its index
  * (LRUDictionary.BidirectionalLRUMap:78-126) — mirror either side
  * imperfectly and the two ends silently diverge after the first
  * eviction. [[LruDict]] reproduces that exact discipline.
  */
object WalCompression {

  val NotInDictionary: Int = 0xff

  /** BidirectionalLRUMap twin: index-addressable entries with
    * access-order LRU eviction and index recycling. */
  final class LruDict(initSize: Int) {
    private final class Node(var content: Array[Byte]) {
      var prev: Node = _
      var next: Node = _
      var idx: Short = -1
      override def hashCode(): Int = java.util.Arrays.hashCode(content)
      override def equals(o: Any): Boolean = o match {
        case n: Node => java.util.Arrays.equals(content, n.content)
        case _ => false
      }
    }
    private val indexToNode = new Array[Node](initSize)
    private val nodeToIndex = new java.util.HashMap[Node, java.lang.Short]()
    private var head: Node = _
    private var tail: Node = _
    private var currSize = 0

    private def setHead(n: Node): Unit = {
      n.prev = null
      n.next = head
      if (head != null) head.prev = n
      head = n
      if (tail == null) tail = n
    }

    private def moveToHead(n: Node): Unit = if (head ne n) {
      n.prev.next = n.next
      if (n.next != null) n.next.prev = n.prev else tail = n.prev
      setHead(n)
    }

    /** Add an entry; returns its (possibly recycled) index. */
    def put(data: Array[Byte]): Short = {
      if (currSize < initSize) {
        val n = new Node(data.clone())
        n.idx = currSize.toShort
        indexToNode(currSize) = n
        setHead(n)
        nodeToIndex.put(n, n.idx)
        currSize += 1
        n.idx
      } else {
        // evict the tail, recycle its index
        val s = nodeToIndex.remove(tail)
        tail.content = data.clone()
        nodeToIndex.put(tail, s)
        moveToHead(tail)
        s
      }
    }

    /** Writer-side lookup: hit touches the entry, miss ADDS it and
      * reports the miss (LRUDictionary.findEntry). */
    def findOrAdd(data: Array[Byte]): Short = {
      val probe = new Node(data)
      val s = nodeToIndex.get(probe)
      if (s != null) { moveToHead(indexToNode(s.intValue())); s.shortValue() }
      else { put(data); -1 }
    }

    /** Reader-side lookup by index: touches the entry. */
    def get(idx: Short): Array[Byte] = {
      require(idx >= 0 && idx < currSize, s"missing dictionary entry $idx")
      val n = indexToNode(idx)
      moveToHead(n)
      n.content
    }
  }

  /** One WAL stream's dictionary set (CompressionContext's sizes). */
  final class Ctx {
    val region = new LruDict(Short.MaxValue)
    val table = new LruDict(Short.MaxValue)
    val family = new LruDict(Byte.MaxValue)
    val qualifier = new LruDict(Byte.MaxValue)
    val row = new LruDict(Short.MaxValue)
    /** Tag dictionary — created with Short.MaxValue capacity when
      * `hbase.regionserver.wal.tags.enablecompression` is on
      * (CompressionContext.java:226); persists across the segment's
      * cells like every other WAL dictionary. */
    lazy val tags = new LruDict(Short.MaxValue)
  }

  /** TagCompressionContext.compressTags over a KeyValue tag section:
    * each [2B BE len][type + data] tag codes through the dictionary
    * as one dict-coded byte array (Dictionary.write — the same wire
    * form as every other WAL dictionary field). */
  def compressTagsSection(out: ByteArrayOutputStream, tags: Array[Byte],
      dict: LruDict): Unit = {
    var pos = 0
    while (pos < tags.length) {
      val tagLen = ((tags(pos) & 0xff) << 8) | (tags(pos + 1) & 0xff)
      pos += 2
      writeCoded(out, java.util.Arrays.copyOfRange(tags, pos, pos + tagLen), dict)
      pos += tagLen
    }
  }

  /** TagCompressionContext.uncompressTags: reproduce exactly `tagsLen`
    * uncompressed section bytes, re-synthesizing each tag's 2-byte
    * length prefix (literals re-enter the dictionary via readCoded). */
  def uncompressTagsSection(bb: ByteBuffer, tagsLen: Int,
      dict: LruDict): Array[Byte] = {
    val dest = new Array[Byte](tagsLen)
    var off = 0
    while (off < tagsLen) {
      val t = readCoded(bb, dict)
      dest(off) = ((t.length >> 8) & 0xff).toByte
      dest(off + 1) = (t.length & 0xff).toByte
      off += 2
      System.arraycopy(t, 0, dest, off, t.length)
      off += t.length
    }
    dest
  }

  // --- dict-coded byte arrays (the wire form) ---

  def writeCoded(out: ByteArrayOutputStream, data: Array[Byte], dict: LruDict): Unit = {
    val idx = dict.findOrAdd(data)
    if (idx == -1) {
      out.write(NotInDictionary)
      var v = data.length
      while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
      out.write(v)
      out.write(data, 0, data.length)
    } else {
      out.write((idx >> 8) & 0xff)
      out.write(idx & 0xff)
    }
  }

  def readCoded(bb: ByteBuffer, dict: LruDict): Array[Byte] = {
    val status = bb.get() & 0xff
    if (status == NotInDictionary) {
      var len = 0; var shift = 0; var b = 0
      do { b = bb.get() & 0xff; len |= (b & 0x7f) << shift; shift += 7 } while ((b & 0x80) != 0)
      val data = new Array[Byte](len)
      bb.get(data)
      dict.put(data)
      data
    } else {
      val idx = ((status << 8) | (bb.get() & 0xff)).toShort
      dict.get(idx)
    }
  }

  // ------------------------------------------------------------------
  // WAL value compression (CompressionContext.ValueCompressor:73-107)
  // ------------------------------------------------------------------

  /** Write side: ONE compression stream spans every value in the WAL;
    * each cell stores the bytes the stream FLUSHED for its value
    * (varint length + segment). GZ gets true cross-value dictionary
    * compression (sync-flush deflate); SNAPPY/LZ4/ZSTD flush one
    * self-contained BlockCompressorStream frame per value. */
  final class ValueCompressor(algo: Int) {
    private val baos = new ByteArrayOutputStream()
    private lazy val gz = new java.util.zip.GZIPOutputStream(baos, true) // syncFlush
    def compress(value: Array[Byte]): Array[Byte] = {
      if (algo == HFileV3.CompressionGz) {
        gz.write(value)
        gz.flush()
      } else {
        // [int rawLen][int compLen][chunk] — one frame per value
        val dos = new java.io.DataOutputStream(baos)
        dos.writeInt(value.length)
        val comp = algo match {
          case HFileV3.CompressionSnappy =>
            val dst = new Array[Byte](
              org.xerial.snappy.Snappy.maxCompressedLength(value.length))
            val n = org.xerial.snappy.Snappy.rawCompress(value, 0, value.length, dst, 0)
            java.util.Arrays.copyOf(dst, n)
          case HFileV3.CompressionLz4 =>
            val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
            val dst = new Array[Byte](c.maxCompressedLength(value.length))
            val n = c.compress(value, 0, value.length, dst, 0, dst.length)
            java.util.Arrays.copyOf(dst, n)
          case HFileV3.CompressionZstd =>
            com.github.luben.zstd.Zstd.compress(value, 3)
          case other =>
            throw new IllegalArgumentException(s"unsupported WAL value codec $other")
        }
        dos.writeInt(comp.length)
        dos.write(comp)
      }
      val seg = baos.toByteArray
      baos.reset()
      seg
    }
  }

  /** Read side: the continuous-stream twin — compressed segments feed
    * in arrival order and each value pulls exactly its length out, so
    * segment boundaries never need to align with codec frames (a
    * reference writer may buffer one value's bytes into the next
    * segment). GZ runs a persistent raw-deflate Inflater (gzip header
    * stripped at stream start); the block codecs parse
    * [rawLen][compLen][chunk] frames from the concatenated bytes. */
  final class ValueDecompressor(algo: Int) {
    private val pending = new ByteArrayOutputStream() // compressed, unconsumed
    private val ready = new ByteArrayOutputStream() // decompressed, unserved
    private var served = 0
    private val inflater = new java.util.zip.Inflater(true)
    private var gzHeaderStripped = false

    def addSegment(seg: Array[Byte], off: Int, len: Int): Unit =
      pending.write(seg, off, len)

    /** Pull exactly `n` decompressed bytes. */
    def read(n: Int): Array[Byte] = {
      while (ready.size() - served < n) decodeMore()
      val all = ready.toByteArray
      val out = java.util.Arrays.copyOfRange(all, served, served + n)
      served += n
      if (served > (1 << 20)) { // compact the served prefix
        val rest = java.util.Arrays.copyOfRange(all, served, all.length)
        ready.reset(); ready.write(rest, 0, rest.length); served = 0
      }
      out
    }

    private def decodeMore(): Unit = {
      val buf = pending.toByteArray
      require(buf.nonEmpty, "value decompressor starved (truncated WAL?)")
      if (algo == HFileV3.CompressionGz) {
        var off = 0
        if (!gzHeaderStripped) {
          require(buf.length >= 10 && (buf(0) & 0xff) == 0x1f && (buf(1) & 0xff) == 0x8b,
            "missing gzip header in value stream")
          require((buf(3) & 0xfe) == 0, "gzip extra header fields unsupported")
          off = 10
          gzHeaderStripped = true
        }
        inflater.setInput(buf, off, buf.length - off)
        val tmp = new Array[Byte](8192)
        var produced = 0
        var n = inflater.inflate(tmp)
        while (n > 0) { ready.write(tmp, 0, n); produced += n; n = inflater.inflate(tmp) }
        require(produced > 0, "deflate made no progress (truncated WAL value stream?)")
        pending.reset() // inflater holds any remainder internally? No —
        // Inflater consumes what it can; unconsumed input remains in its
        // buffer reference, so keep only what it did not consume:
        val rem = inflater.getRemaining
        if (rem > 0) pending.write(buf, buf.length - rem, rem)
      } else {
        // need at least one complete [rawLen][compLen][chunk] frame
        val bb = ByteBuffer.wrap(buf)
        require(bb.remaining() >= 8, "truncated value frame header")
        val rawLen = bb.getInt
        val compLen = bb.getInt
        require(bb.remaining() >= compLen, "truncated value frame body")
        val outBuf = new Array[Byte](rawLen)
        val srcOff = bb.position()
        val n = algo match {
          case HFileV3.CompressionSnappy =>
            org.xerial.snappy.Snappy.rawUncompress(buf, srcOff, compLen, outBuf, 0)
          case HFileV3.CompressionLz4 =>
            net.jpountz.lz4.LZ4Factory.fastestInstance().safeDecompressor()
              .decompress(buf, srcOff, compLen, outBuf, 0)
          case HFileV3.CompressionZstd =>
            com.github.luben.zstd.Zstd.decompressByteArray(
              outBuf, 0, rawLen, buf, srcOff, compLen).toInt
          case other =>
            throw new IllegalArgumentException(s"unsupported WAL value codec $other")
        }
        require(n == rawLen, s"value frame decoded $n of $rawLen bytes")
        ready.write(outBuf, 0, rawLen)
        val restOff = srcOff + compLen
        pending.reset()
        if (restOff < buf.length) pending.write(buf, restOff, buf.length - restOff)
      }
    }
  }
}
