package graft.codec

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.charset.StandardCharsets

/** The reference's plain `Bytes` codec family — the wire format behind
  * the `Raw*` DataTypes (hbase-common/.../types/RawLong.java:37,
  * RawInteger/RawShort/RawByte/RawFloat/RawDouble/RawString, each
  * delegating to util/Bytes.java: toLong:693, toFloat:759, toDouble
  * :792, toInt:843, toShort:930, toBigDecimal:1042): big-endian
  * two's-complement fixed-width values, IEEE bits for floats,
  * raw UTF-8 for strings, and (4-byte scale + unscaled big-endian)
  * for BigDecimal.
  *
  * NOT order-preserving under unsigned-lex byte comparison for signed
  * values (negative longs sort above positives) — that is the
  * documented difference from the Ordered* family ([[OBytes]] /
  * [[OBytesHb]]); the reference makes the same distinction. This is
  * the format `Increment` arithmetic requires (an 8-byte
  * `Bytes.toLong` counter cell, HRegion increment path), and the
  * format pre-existing reference data most commonly carries.
  */
object GBytes {

  def toBytes(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }

  def toLong(b: Array[Byte], off: Int = 0): Long = {
    require(b.length - off >= 8, s"toLong needs 8 bytes, got ${b.length - off}")
    var x = 0L
    var i = 0
    while (i < 8) { x = (x << 8) | (b(off + i) & 0xffL); i += 1 }
    x
  }

  def toBytes(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  def toInt(b: Array[Byte], off: Int = 0): Int = {
    require(b.length - off >= 4, s"toInt needs 4 bytes, got ${b.length - off}")
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  }

  def toBytes(v: Short): Array[Byte] = Array((v >>> 8).toByte, v.toByte)

  def toShort(b: Array[Byte], off: Int = 0): Short = {
    require(b.length - off >= 2, s"toShort needs 2 bytes, got ${b.length - off}")
    (((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)).toShort
  }

  def toBytes(v: Float): Array[Byte] = toBytes(java.lang.Float.floatToRawIntBits(v))
  def toFloat(b: Array[Byte], off: Int = 0): Float =
    java.lang.Float.intBitsToFloat(toInt(b, off))

  def toBytes(v: Double): Array[Byte] = toBytes(java.lang.Double.doubleToRawLongBits(v))
  def toDouble(b: Array[Byte], off: Int = 0): Double =
    java.lang.Double.longBitsToDouble(toLong(b, off))

  def toBytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  def toStringBin(b: Array[Byte]): String = new String(b, StandardCharsets.UTF_8)

  /** 4-byte big-endian scale + unscaled-value two's-complement bytes
    * (Bytes.toBytes(BigDecimal) layout). */
  def toBytes(v: JBigDecimal): Array[Byte] = {
    val unscaled = v.unscaledValue().toByteArray
    toBytes(v.scale()) ++ unscaled
  }

  def toBigDecimal(b: Array[Byte], off: Int = 0): JBigDecimal = {
    require(b.length - off > 4, "toBigDecimal needs a scale int plus unscaled bytes")
    val scale = toInt(b, off)
    val unscaled = java.util.Arrays.copyOfRange(b, off + 4, b.length)
    new JBigDecimal(new BigInteger(unscaled), scale)
  }
}
