package graft.ext

import java.util.zip.{DataFormatException, Inflater}

/** REAL pure-JVM PNG pixel decoder — no codec library, only the public
  * PNG spec (RFC 2083) and `java.util.zip.Inflater` (zlib is part of
  * the JVM). This is the decode path [[Multimodal.decodeStub]] stands
  * in for on non-PNG payloads: chunk walk → IDAT concat → inflate →
  * per-row unfilter (all five filter types: None/Sub/Up/Average/
  * Paeth). Supports what standard encoders (javax.imageio among them)
  * emit: bit depth 8, color types 0 (gray) / 2 (RGB) / 4 (gray+alpha)
  * / 6 (RGBA), non-interlaced. Anything else — and any malformed or
  * truncated stream — degrades to None, never an exception: per-row
  * decode failures must not fail a Spark partition.
  *
  * Scale shape: decoding is embarrassingly parallel per row (blob in,
  * pixels out, no cross-row state); callers run it inside
  * `mapPartitions` so a vectorized/native decoder could amortize
  * per-partition init, exactly like [[Multimodal.extractFeatures]].
  */
object PngCodec {

  /** Decoded raster: `data` is row-major, channels interleaved,
    * 8 bits per sample. */
  final case class Pixels(width: Int, height: Int, channels: Int,
      data: Array[Byte]) {
    def sample(x: Int, y: Int, c: Int): Int =
      data((y * width + x) * channels + c) & 0xff
    /** Rec.601 luma, scaled ×1000 to stay integer-exact
      * (299·R + 587·G + 114·B; gray counts as R=G=B). */
    def lumaQ(x: Int, y: Int): Long =
      if (channels <= 2) 1000L * sample(x, y, 0)
      else 299L * sample(x, y, 0) + 587L * sample(x, y, 1) +
        114L * sample(x, y, 2)
  }

  private val Signature =
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)

  def decode(png: Array[Byte]): Option[Pixels] = {
    if (png == null || png.length < 45) return None
    def u8(i: Int) = png(i) & 0xff
    def beInt(i: Int) =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (!(0 until 8).forall(i => u8(i) == Signature(i))) return None
    // IHDR is required to be the first chunk: 13 data bytes at off 16
    if (beInt(8) != 13 || png(12) != 'I' || png(13) != 'H' ||
      png(14) != 'D' || png(15) != 'R') return None
    val width = beInt(16)
    val height = beInt(20)
    val bitDepth = u8(24)
    val colorType = u8(25)
    val interlace = u8(28)
    // compression (26) and filter (27) methods have exactly one defined
    // value each — anything else must degrade, not mis-decode
    if (width <= 0 || height <= 0 || bitDepth != 8 || interlace != 0 ||
      u8(26) != 0 || u8(27) != 0)
      return None
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 4 => 2 // gray + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None // palette (3) and exotic types unsupported
    }
    // guard the raster allocation before trusting header dims
    val bpr = width.toLong * channels
    if (bpr * height > 256L * 1024 * 1024 || (bpr + 1) * height > Int.MaxValue)
      return None

    // chunk walk: concatenate IDAT payloads until IEND
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8 + 8 + 13 + 4 // signature + IHDR chunk
    var sawEnd = false
    while (!sawEnd && i + 8 <= png.length) {
      val len = beInt(i)
      // bound check in Long: a hostile length near Int.MaxValue would
      // overflow the Int sum, slip past the guard, and throw downstream
      if (len < 0 || i.toLong + 8L + len + 4L > png.length) return None
      val typ = new String(png, i + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (typ == "IDAT") idat.write(png, i + 8, len)
      if (typ == "IEND") sawEnd = true
      i += 8 + len + 4
    }
    val comp = idat.toByteArray
    if (comp.isEmpty) return None

    // inflate the full filtered raster: height rows of (1 + bpr) bytes
    val rowBytes = bpr.toInt
    val raw = new Array[Byte]((rowBytes + 1) * height)
    val inf = new Inflater()
    inf.setInput(comp)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
    } catch {
      case _: DataFormatException => return None
    } finally inf.end()
    if (off < raw.length) return None

    // unfilter row by row (filter byte leads each row); a/b/c are the
    // RECONSTRUCTED left / above / above-left samples per the spec
    val out = new Array[Byte](rowBytes * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val ft = raw(y * (rowBytes + 1)) & 0xff
      if (ft > 4) return None
      val rs = y * (rowBytes + 1) + 1
      val os = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val cur = raw(rs + x) & 0xff
        val a = if (x >= bpp) out(os + x - bpp) & 0xff else 0
        val b = if (y > 0) out(os - rowBytes + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) out(os - rowBytes + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + ((a + b) >> 1)
          case _ => // Paeth
            val p = a + b - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        out(os + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(Pixels(width, height, channels, out))
  }
}
