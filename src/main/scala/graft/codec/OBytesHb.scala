package graft.codec

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import java.nio.charset.StandardCharsets

/** The order-preserving codec contract shared by graft's two wire
  * formats: [[OBytes]] (graft's own layout) and [[OBytesHb]] (the
  * reference-layout-faithful mode). For every type,
  * `encode(a) <unsigned-lex encode(b)` ⟺ `a < b`, decode is exact
  * (numeric up to the 31-significant-digit normalization), and the
  * DESCENDING variant is the bytewise complement of the ascending
  * encoding.
  */
trait OrderedCodec {
  def encodeLong(v: Long, desc: Boolean): Array[Byte]
  def decodeLong(b: Array[Byte], desc: Boolean): Long
  def encodeInt(v: Int, desc: Boolean): Array[Byte]
  def decodeInt(b: Array[Byte], desc: Boolean): Int
  def encodeShort(v: Short, desc: Boolean): Array[Byte]
  def decodeShort(b: Array[Byte], desc: Boolean): Short
  def encodeByte(v: Byte, desc: Boolean): Array[Byte]
  def decodeByte(b: Array[Byte], desc: Boolean): Byte
  def encodeFloat(v: Float, desc: Boolean): Array[Byte]
  def decodeFloat(b: Array[Byte], desc: Boolean): Float
  def encodeDouble(v: Double, desc: Boolean): Array[Byte]
  def decodeDouble(b: Array[Byte], desc: Boolean): Double
  def encodeString(s: String, desc: Boolean): Array[Byte]
  def decodeString(b: Array[Byte], desc: Boolean): String
  def encodeNumeric(v: JBigDecimal, desc: Boolean): Array[Byte]
  def decodeNumeric(b: Array[Byte], desc: Boolean): JBigDecimal
  def encodeBlobVar(v: Array[Byte], desc: Boolean): Array[Byte]
  def decodeBlobVar(b: Array[Byte], desc: Boolean): Array[Byte]
  def encodeBlobCopy(v: Array[Byte], desc: Boolean): Array[Byte]
  def decodeBlobCopy(b: Array[Byte], desc: Boolean): Array[Byte]
}

/** Layout-faithful OrderedBytes mode: byte-for-byte the reference's
  * wire format (hbase-common/.../util/OrderedBytes.java — header
  * constants :306-340, numeric scheme :196-230 and :620-772, varint
  * :359-500, BlobVar 7-bit packing :150-160), so keys encoded by real
  * reference clients round-trip through graft and vice versa. This
  * complements [[OBytes]], whose contract is ordering (its own
  * simpler layout); both implement [[OrderedCodec]] and CodecSpec
  * proves order parity between the two formats on the same values.
  *
  * Format recap (SQLite4-derived; all DESCENDING = complement of the
  * whole field, header byte included):
  *  - fixed ints: header 0x29/0x2a/0x2b/0x2c + sign-flipped
  *    big-endian payload (1/2/4/8 bytes).
  *  - floats: header 0x30/0x31 + IEEE bits with
  *    `j ^= (j >> size-1) | MIN_VALUE` (negatives fully flipped).
  *  - text: 0x34 + UTF-8 + 0x00 terminator (no interior NUL).
  *  - blob-var: 0x37 + payload packed 7 bits per encoded byte, MSB as
  *    continuation marker (clear on the final byte); empty payload is
  *    a bare terminator.
  *  - blob-copy: 0x38 + raw bytes (DESCENDING additionally 0x00-
  *    terminated and so rejects interior NULs).
  *  - numeric: value = M × 100^E, M ∈ [0.01, 1) minimal centimal
  *    digits (byte 2d+1, final byte 2d), E per class: zero 0x15;
  *    medium positive 0x17+E (E ≤ 10), large positive 0x22 then
  *    varint E; small positive 0x16 then ~varint(-E); negatives
  *    mirror at 0x13-E / 0x08 / 0x14 with ~M; 31-significant-digit
  *    HALF_UP normalization before encoding.
  */
object OBytesHb extends OrderedCodec {

  // header constants — OrderedBytes.java:306-340
  private val Null: Byte         = 0x05
  private val NegInf: Byte       = 0x07
  private val NegLarge: Byte     = 0x08
  private val NegMedMax: Byte    = 0x13
  private val NegSmall: Byte     = 0x14
  private val Zero: Byte         = 0x15
  private val PosSmall: Byte     = 0x16
  private val PosMedMin: Byte    = 0x17
  private val PosLarge: Byte     = 0x22
  private val PosInf: Byte       = 0x23
  private val Nan: Byte          = 0x26
  private val FixedInt8: Byte    = 0x29
  private val FixedInt16: Byte   = 0x2a
  private val FixedInt32: Byte   = 0x2b
  private val FixedInt64: Byte   = 0x2c
  private val FixedFloat32: Byte = 0x30
  private val FixedFloat64: Byte = 0x31
  private val Text: Byte         = 0x34
  private val BlobVar: Byte      = 0x37
  private val BlobCopy: Byte     = 0x38
  private val Term: Byte         = 0x00

  private val Normalize = new MathContext(31, RoundingMode.HALF_UP)

  @inline private def cpl(b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b.length) { b(i) = (~b(i)).toByte; i += 1 }
    b
  }

  @inline private def oriented(out: Array[Byte], desc: Boolean): Array[Byte] =
    if (desc) cpl(out) else out

  @inline private def plain(b: Array[Byte], desc: Boolean): Array[Byte] =
    if (desc) cpl(b.clone()) else b

  private def expectHeader(raw: Array[Byte], h: Byte, what: String): Unit =
    if (raw.isEmpty || raw(0) != h)
      throw new IllegalArgumentException(
        f"$what: expected header 0x$h%02x, got ${if (raw.isEmpty) "<empty>" else f"0x${raw(0)}%02x"}")

  /** The NULL field encoding (header only). */
  def encodeNull(desc: Boolean): Array[Byte] = oriented(Array(Null), desc)

  // ---- fixed-width integers ----

  private def encFixed(header: Byte, width: Int, v: Long, desc: Boolean): Array[Byte] = {
    val out = new Array[Byte](1 + width)
    out(0) = header
    // sign bit flipped on the most significant payload byte only
    out(1) = ((v >> (8 * (width - 1))) ^ 0x80).toByte
    var i = 2
    while (i <= width) { out(i) = (v >> (8 * (width - i))).toByte; i += 1 }
    oriented(out, desc)
  }

  private def decFixed(b: Array[Byte], desc: Boolean, header: Byte, width: Int,
      what: String): Long = {
    val raw = plain(b, desc)
    expectHeader(raw, header, what)
    var x = ((raw(1) ^ 0x80) & 0xffL)
    var i = 2
    while (i <= width) { x = (x << 8) | (raw(i) & 0xffL); i += 1 }
    // sign-extend from the payload width
    (x << (64 - 8 * width)) >> (64 - 8 * width)
  }

  def encodeLong(v: Long, desc: Boolean): Array[Byte] = encFixed(FixedInt64, 8, v, desc)
  def decodeLong(b: Array[Byte], desc: Boolean): Long =
    decFixed(b, desc, FixedInt64, 8, "int64")

  def encodeInt(v: Int, desc: Boolean): Array[Byte] = encFixed(FixedInt32, 4, v, desc)
  def decodeInt(b: Array[Byte], desc: Boolean): Int =
    decFixed(b, desc, FixedInt32, 4, "int32").toInt

  def encodeShort(v: Short, desc: Boolean): Array[Byte] = encFixed(FixedInt16, 2, v, desc)
  def decodeShort(b: Array[Byte], desc: Boolean): Short =
    decFixed(b, desc, FixedInt16, 2, "int16").toShort

  def encodeByte(v: Byte, desc: Boolean): Array[Byte] = encFixed(FixedInt8, 1, v, desc)
  def decodeByte(b: Array[Byte], desc: Boolean): Byte =
    decFixed(b, desc, FixedInt8, 1, "int8").toByte

  // ---- fixed-width floats (sign-fold: flip sign bit, and all bits
  //      when negative) ----

  def encodeFloat(v: Float, desc: Boolean): Array[Byte] = {
    var j = java.lang.Float.floatToIntBits(v)
    j ^= (j >> 31) | Int.MinValue
    val out = Array(FixedFloat32,
      (j >>> 24).toByte, (j >>> 16).toByte, (j >>> 8).toByte, j.toByte)
    oriented(out, desc)
  }

  def decodeFloat(b: Array[Byte], desc: Boolean): Float = {
    val raw = plain(b, desc)
    expectHeader(raw, FixedFloat32, "float32")
    var j = 0
    var i = 1
    while (i <= 4) { j = (j << 8) | (raw(i) & 0xff); i += 1 }
    j ^= (~j >> 31) | Int.MinValue
    java.lang.Float.intBitsToFloat(j)
  }

  def encodeDouble(v: Double, desc: Boolean): Array[Byte] = {
    var j = java.lang.Double.doubleToLongBits(v)
    j ^= (j >> 63) | Long.MinValue
    val out = new Array[Byte](9)
    out(0) = FixedFloat64
    var i = 0
    while (i < 8) { out(1 + i) = (j >>> (56 - 8 * i)).toByte; i += 1 }
    oriented(out, desc)
  }

  def decodeDouble(b: Array[Byte], desc: Boolean): Double = {
    val raw = plain(b, desc)
    expectHeader(raw, FixedFloat64, "float64")
    var j = 0L
    var i = 1
    while (i <= 8) { j = (j << 8) | (raw(i) & 0xffL); i += 1 }
    j ^= (~j >> 63) | Long.MinValue
    java.lang.Double.longBitsToDouble(j)
  }

  // ---- text ----

  def encodeString(s: String, desc: Boolean): Array[Byte] = {
    if (s.indexOf(0) >= 0)
      throw new IllegalArgumentException(
        "OBytesHb: U+0000 not allowed in text content (reference parity)")
    val utf = s.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](utf.length + 2)
    out(0) = Text
    System.arraycopy(utf, 0, out, 1, utf.length)
    out(utf.length + 1) = Term
    oriented(out, desc)
  }

  def decodeString(b: Array[Byte], desc: Boolean): String = {
    val raw = plain(b, desc)
    expectHeader(raw, Text, "text")
    var end = raw.length
    var i = 1
    while (i < raw.length) { if (raw(i) == Term) { end = i; i = raw.length } else i += 1 }
    new String(raw, 1, end - 1, StandardCharsets.UTF_8)
  }

  // ---- SQLite4 varint (putVaruint64 scheme) ----

  private def varint(v: Long, comp: Boolean): Array[Byte] = {
    def be(n: Int, x: Long): Array[Byte] = {
      val a = new Array[Byte](n)
      var i = 0
      while (i < n) { a(i) = (x >>> (8 * (n - 1 - i))).toByte; i += 1 }
      a
    }
    val out: Array[Byte] =
      if (java.lang.Long.compareUnsigned(v, 241L) < 0) Array(v.toByte)
      else if (java.lang.Long.compareUnsigned(v, 2288L) < 0) {
        val y = (v - 240).toInt
        Array((y / 256 + 241).toByte, (y % 256).toByte)
      } else if (java.lang.Long.compareUnsigned(v, 67824L) < 0) {
        val y = (v - 2288).toInt
        Array(249.toByte, (y / 256).toByte, (y % 256).toByte)
      } else {
        val w = (v >>> 32).toInt
        val y = v & 0xffffffffL
        if (w == 0) {
          if (y < (1L << 24)) 250.toByte +: be(3, y)
          else 251.toByte +: be(4, y)
        } else if (java.lang.Integer.compareUnsigned(w, 256) < 0)
          252.toByte +: (be(1, w.toLong) ++ be(4, y))
        else if (java.lang.Integer.compareUnsigned(w, 65536) < 0)
          253.toByte +: (be(2, w.toLong) ++ be(4, y))
        else if (java.lang.Integer.compareUnsigned(w, 1 << 24) < 0)
          254.toByte +: (be(3, w.toLong) ++ be(4, y))
        else 255.toByte +: (be(4, w.toLong) ++ be(4, y))
      }
    if (comp) cpl(out) else out
  }

  /** Returns (value, encodedLength) of the varint at `off` (already
    * complement-corrected input). */
  private def varintDec(raw: Array[Byte], off: Int, comp: Boolean): (Long, Int) = {
    @inline def u(i: Int): Int = (if (comp) (~raw(off + i)).toByte else raw(off + i)) & 0xff
    val a0 = u(0)
    def be(from: Int, n: Int): Long = {
      var x = 0L
      var i = 0
      while (i < n) { x = (x << 8) | u(from + i); i += 1 }
      x
    }
    if (a0 < 241) (a0.toLong, 1)
    else if (a0 <= 248) (240L + 256L * (a0 - 241) + u(1), 2)
    else a0 match {
      case 249 => (2288L + 256L * u(1) + u(2), 3)
      case 250 => (be(1, 3), 4)
      case 251 => (be(1, 4), 5)
      case 252 => (be(1, 5), 6)
      case 253 => (be(1, 6), 7)
      case 254 => (be(1, 7), 8)
      case _   => (be(1, 8), 9)
    }
  }

  // ---- variable-length numeric (value = M × 100^E) ----

  /** Centimal mantissa of a normalized value in (0, 1): byte 2d+1 per
    * base-100 digit, final byte 2d. */
  private def centimal(absNorm: JBigDecimal): Array[Byte] = {
    val s = absNorm.stripTrailingZeros.toPlainString
    val digits = s.substring(s.indexOf('.') + 1)
    val maxP = math.min(if (digits.charAt(0) == '0') 32 else 31, digits.length)
    val out = new Array[Byte]((maxP + 1) / 2)
    var i = 0
    while (i < maxP) {
      var d = (digits.charAt(i) - '0') * 10
      if (i + 1 < maxP) d += digits.charAt(i + 1) - '0'
      out(i / 2) = (2 * d + 1).toByte
      i += 2
    }
    out(out.length - 1) = (out(out.length - 1) & 0xfe).toByte
    out
  }

  def encodeNumeric(v: JBigDecimal, desc: Boolean): Array[Byte] = {
    val out: Array[Byte] =
      if (v.signum() == 0) Array(Zero)
      else {
        val norm = v.round(Normalize)
        val isNeg = norm.signum() < 0
        val abs = norm.abs()
        if (abs.compareTo(JBigDecimal.ONE) >= 0) {
          // large/medium: shift an even count of integer digits right
          val integerDigits = abs.precision() - abs.scale()
          val move = if (integerDigits % 2 == 0) integerDigits else integerDigits + 1
          val e = move / 2
          val m = centimal(abs.movePointLeft(move))
          if (isNeg) cpl(m)
          if (e > 10)
            (if (isNeg) NegLarge else PosLarge) +: (varint(e.toLong, comp = isNeg) ++ m)
          else
            (if (isNeg) (NegMedMax - e).toByte else (PosMedMin + e).toByte) +: m
        } else {
          // small: absorb an even count of leading fractional zeros
          val zeros = abs.scale() - abs.precision()
          val move = if (zeros % 2 == 0) zeros else zeros - 1
          val e = move / 2
          val m = centimal(abs.movePointRight(move))
          if (isNeg) cpl(m)
          (if (isNeg) NegSmall else PosSmall) +: (varint(e.toLong, comp = !isNeg) ++ m)
        }
      }
    oriented(out, desc)
  }

  /** Decode the centimal digits at `off` (complementing when `neg`)
    * into the mantissa M ∈ (0, 1). */
  private def centimalDec(raw: Array[Byte], off: Int, neg: Boolean): JBigDecimal = {
    val sb = new StringBuilder("0.")
    var i = off
    var done = false
    while (!done) {
      val x = (if (neg) (~raw(i)).toByte else raw(i)) & 0xff
      val d = x >>> 1
      sb.append(('0' + d / 10).toChar).append(('0' + d % 10).toChar)
      if ((x & 1) == 0) done = true else i += 1
    }
    new JBigDecimal(sb.toString)
  }

  def decodeNumeric(b: Array[Byte], desc: Boolean): JBigDecimal = {
    val raw = plain(b, desc)
    raw(0) match {
      case Zero => JBigDecimal.ZERO
      case Nan | NegInf | PosInf =>
        throw new IllegalArgumentException(
          "OBytesHb: non-finite numeric cannot decode to BigDecimal")
      case PosLarge =>
        val (e, n) = varintDec(raw, 1, comp = false)
        centimalDec(raw, 1 + n, neg = false).movePointRight(2 * e.toInt)
      case NegLarge =>
        val (e, n) = varintDec(raw, 1, comp = true)
        centimalDec(raw, 1 + n, neg = true).movePointRight(2 * e.toInt).negate()
      case PosSmall =>
        val (e, n) = varintDec(raw, 1, comp = true)
        centimalDec(raw, 1 + n, neg = false).movePointLeft(2 * e.toInt)
      case NegSmall =>
        val (e, n) = varintDec(raw, 1, comp = false)
        centimalDec(raw, 1 + n, neg = true).movePointLeft(2 * e.toInt).negate()
      case h if h >= PosMedMin && h <= PosLarge - 1 =>
        centimalDec(raw, 1, neg = false).movePointRight(2 * (h - PosMedMin))
      case h if h >= NegLarge + 1 && h <= NegMedMax =>
        centimalDec(raw, 1, neg = true).movePointRight(2 * (NegMedMax - h)).negate()
      case h =>
        throw new IllegalArgumentException(f"OBytesHb: not a numeric header 0x$h%02x")
    }
  }

  // ---- blobs ----

  /** Layout-faithful quirk, preserved deliberately: the reference's
    * BlobVar ordering is exact for equal-length blobs and prefix pairs,
    * but when two blobs first differ inside the SHORTER one's final
    * 7-bit group, the cleared continuation bit on the final encoded
    * byte dominates — e.g. encode([0x01]) < encode([0x00, 0x00])
    * despite [0x01] >lex [0x00, 0x00]. The reference's own sort test
    * (TestOrderedBytes.testBlobVar) only exercises equal-length and
    * prefix pairs, so this is the shipped wire behavior; use [[OBytes]]
    * .encodeBlobVar (0x00-escaped, exactly order-preserving) when full
    * lex order matters more than layout parity. */
  def encodeBlobVar(v: Array[Byte], desc: Boolean): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(v.length + v.length / 7 + 2)
    buf.write(BlobVar)
    if (v.isEmpty) buf.write(Term)
    else {
      // 7 payload bits per encoded byte, MSB = continuation marker
      var s = 1
      var t = 0
      var i = 0
      while (i < v.length) {
        buf.write(0x80 | t | ((v(i) & 0xff) >>> s))
        if (s < 7) { t = (v(i) << (7 - s)) & 0x7f; s += 1 }
        else { buf.write(0x80 | (v(i) & 0xff)); s = 1; t = 0 }
        i += 1
      }
      val out = buf.toByteArray
      if (s > 1) return oriented(out :+ (t & 0x7f).toByte, desc)
      out(out.length - 1) = (out(out.length - 1) & 0x7f).toByte
      return oriented(out, desc)
    }
    oriented(buf.toByteArray, desc)
  }

  def decodeBlobVar(b: Array[Byte], desc: Boolean): Array[Byte] = {
    val raw = plain(b, desc)
    expectHeader(raw, BlobVar, "blob-var")
    val out = new java.io.ByteArrayOutputStream(raw.length)
    var acc = 0L
    var nbits = 0
    var i = 1
    var done = false
    while (!done) {
      if (i >= raw.length)
        throw new IllegalArgumentException(
          "blob-var: missing terminator (truncated input)")
      val e = raw(i) & 0xff
      acc = (acc << 7) | (e & 0x7f)
      nbits += 7
      if (nbits >= 8) {
        nbits -= 8
        out.write(((acc >>> nbits) & 0xff).toInt)
      }
      if ((e & 0x80) == 0) done = true else i += 1
    }
    out.toByteArray
  }

  def encodeBlobCopy(v: Array[Byte], desc: Boolean): Array[Byte] =
    if (!desc) BlobCopy +: v.clone()
    else {
      var i = 0
      while (i < v.length) {
        if (v(i) == 0x00)
          throw new IllegalArgumentException(
            "OBytesHb: 0x00 not allowed in DESCENDING blob-copy (reference parity)")
        i += 1
      }
      cpl((BlobCopy +: v) :+ Term)
    }

  def decodeBlobCopy(b: Array[Byte], desc: Boolean): Array[Byte] = {
    val raw = plain(b, desc)
    expectHeader(raw, BlobCopy, "blob-copy")
    val end = if (desc) raw.length - 1 else raw.length // desc carries a TERM
    java.util.Arrays.copyOfRange(raw, 1, end)
  }
}
