package graft.codec

import java.io.OutputStream

/** Unsynchronized growable byte buffer for the codec hot paths.
  *
  * `java.io.ByteArrayOutputStream` declares every `write` synchronized;
  * with biased locking gone (JDK 15+) each per-cell/per-byte write pays
  * a real lock CAS, and the encode loops here write several fields per
  * cell. This sink is the same API surface the codecs use (single
  * bytes, ranges, big-endian primitives) with plain array stores.
  * Not thread-safe — each writer task owns its own instance.
  */
private[codec] final class ByteSink(initial: Int = 8192) extends OutputStream {
  private var buf = new Array[Byte](math.max(initial, 16))
  private var count = 0

  private def grow(min: Int): Unit = {
    var cap = buf.length << 1
    if (cap < min) cap = min
    buf = java.util.Arrays.copyOf(buf, cap)
  }
  @inline private def ensure(n: Int): Unit =
    if (count + n > buf.length) grow(count + n)

  override def write(b: Int): Unit = {
    ensure(1)
    buf(count) = b.toByte
    count += 1
  }
  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    ensure(len)
    System.arraycopy(b, off, buf, count, len)
    count += len
  }
  override def write(b: Array[Byte]): Unit = write(b, 0, b.length)

  def writeShort(v: Int): Unit = {
    ensure(2)
    buf(count) = (v >>> 8).toByte
    buf(count + 1) = v.toByte
    count += 2
  }
  def writeInt(v: Int): Unit = {
    ensure(4)
    buf(count) = (v >>> 24).toByte
    buf(count + 1) = (v >>> 16).toByte
    buf(count + 2) = (v >>> 8).toByte
    buf(count + 3) = v.toByte
    count += 4
  }
  def writeLong(v: Long): Unit = {
    ensure(8)
    buf(count) = (v >>> 56).toByte
    buf(count + 1) = (v >>> 48).toByte
    buf(count + 2) = (v >>> 40).toByte
    buf(count + 3) = (v >>> 32).toByte
    buf(count + 4) = (v >>> 24).toByte
    buf(count + 5) = (v >>> 16).toByte
    buf(count + 6) = (v >>> 8).toByte
    buf(count + 7) = v.toByte
    count += 8
  }

  def size(): Int = count
  def reset(): Unit = count = 0
  def toByteArray: Array[Byte] = java.util.Arrays.copyOf(buf, count)
  def writeTo(out: OutputStream): Unit = out.write(buf, 0, count)
}
