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
}
