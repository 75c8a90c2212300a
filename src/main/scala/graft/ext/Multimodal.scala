package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. Three tiers of honesty, each labeled:
  *   - REAL pixel decode: PNG payloads decode fully through
  *     [[PngCodec]] (pure-JVM inflate + unfilter, no codec library) —
  *     [[imageFeatures]]/[[imageNearDup]] run on actual pixels, pinned
  *     bit-exact by the e59/e60 analytic oracles.
  *   - REAL audio PCM decode: WAV payloads decode fully through
  *     [[decodeAudio]] (JDK javax.sound.sampled) — [[audioFeatures]]
  *     runs on actual samples, pinned bit-exact by the e83 analytic
  *     oracle.
  *   - REAL video frame decode: MJPEG-in-AVI payloads decode fully
  *     through [[decodeVideoFrames]] (RIFF chunk walk + per-frame
  *     [[JpegCodec]]) — [[videoFrameFeatures]]/[[videoNearDup]] run on
  *     actual frame pixels, pinned bit-exact by the e85/e86 analytic
  *     oracles.
  *   - REAL header parses: container metadata for PNG/GIF/BMP/JPEG,
  *     RIFF/WAVE, and ISO-BMFF (MP4/MOV) straight from the bytes.
  *   - STUB: [[decodeStub]] stands in ONLY for inter-frame-coded VIDEO
  *     payloads — no H.26x/VP9/AV1 decoder ships with a pure JDK, so
  *     those codings are out of reach here by construction (headers
  *     stay real, MJPEG decodes fully) — clearly marked, deterministic.
  * The Spark-side machinery (schema, batch-shaped partition
  * processing, frame sampling, partitioning) is real throughout. At
  * scale the binary payloads stay columnar in parquet and every
  * operator below is map-side.
  */
object Multimodal {

  // In-memory ImageIO streams (see JpegCodec's note): the default
  // file-backed stream cache costs a temp-file round-trip per encoded
  // frame — ruinous for the synthetic-media fixtures that encode 8
  // frames per doc. Set here too so encode-only tasks that never load
  // JpegCodec still get it.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(doc_id: Long, blob: Array[Byte],
      width: Int, height: Int, modality: String)

  final case class MediaFeatures(doc_id: Long, blob_len: Long,
      n_frames: Long, width: Int, height: Int, first_byte: Int)

  /** Ingest: wrap a text corpus as binary payloads + typed metadata
    * (deterministic stand-in for image bytes). */
  def ingest(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("blob"),
      (lit(16) + (col("doc_id") % 64)).cast("int").as("width"),
      (lit(16) + (col("doc_id") % 48)).cast("int").as("height"),
      lit("image-stub").as("modality")
    )

  /** REAL pure-JVM image header parse — no codec library: container
    * dimensions straight from the header bytes of PNG (IHDR
    * width/height, big-endian at offsets 16/20), GIF (logical-screen
    * u16le at 6/8), BMP (BITMAPINFOHEADER i32le at 18/22), and JPEG
    * (first SOFn frame segment). Returns (format, width, height); None
    * for anything unrecognized — callers fall back to [[decodeStub]].
    * This is the non-fake half of the decode path: real image bytes get
    * real dimensions, payloads without a codec container keep the
    * deterministic stand-in. */
  def parseImageHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def beInt(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def leShort(i: Int) = u8(i) | (u8(i + 1) << 8)
    def leInt(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b == null) None
    else if (b.length >= 24 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some(("png", beInt(16), beInt(20)))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      Some(("gif", leShort(6), leShort(8)))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some(("bmp", leInt(18), leInt(22)))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) jpegDims(b)
    else None
  }

  /** Audio metadata: (format, sampleRate, channels, bitsPerSample,
    * dataBytes). */
  final case class AudioMeta(format: String, sampleRate: Int, channels: Int,
      bitsPerSample: Int, dataBytes: Long)

  /** REAL pure-JVM audio header parse — the WAV/RIFF twin of
    * [[parseImageHeader]]: walks the RIFF chunk list (chunks are
    * word-aligned; id + u32le size), reads the fmt chunk's channel
    * count / sample rate / bits-per-sample and the data chunk's byte
    * length. None for anything that is not a well-formed RIFF/WAVE —
    * callers fall back to [[decodeStub]]. */
  def parseAudioHeader(b: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int) = b(i) & 0xff
    def leShort(i: Int) = u8(i) | (u8(i + 1) << 8)
    def leInt(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int) = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (b == null || b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var dataBytes = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = tag(i)
      val size = leInt(i + 4).toLong & 0xffffffffL
      if (id == "fmt " && i + 24 <= b.length)
        fmt = Some((leShort(i + 10), leInt(i + 12), leShort(i + 22)))
      else if (id == "data") dataBytes = size
      // chunks are word-aligned: odd sizes carry a pad byte; advance in
      // Long space so a malformed huge size ends the walk instead of
      // wrapping the cursor backwards
      val next = i.toLong + 8L + size + (size & 1L)
      if (next <= i || next > Int.MaxValue) i = b.length
      else i = next.toInt
    }
    fmt.collect { case (ch, rate, bits) if dataBytes >= 0 =>
      AudioMeta("wav", rate, ch, bits, dataBytes)
    }
  }

  /** Video container metadata: (format, durationMs, width, height,
    * videoTracks). */
  final case class VideoMeta(format: String, durationMs: Long, width: Int,
      height: Int, videoTracks: Int)

  /** REAL pure-JVM video header parse — the ISO-BMFF (MP4/MOV) twin of
    * [[parseAudioHeader]]: walks the top-level box list (u32be size +
    * fourcc; size==1 → u64be largesize follows), requires an `ftyp`
    * leader, then inside `moov` reads `mvhd` (timescale + duration,
    * version 0/1) and each `trak`'s `tkhd` (16.16 fixed-point
    * width/height — non-zero only on video tracks). None for anything
    * not well-formed — callers fall back to [[decodeStub]]. */
  def parseVideoHeader(b: Array[Byte]): Option[VideoMeta] = {
    def u8(i: Int) = (b(i) & 0xff).toLong
    def beInt(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def beLong(i: Int) = (beInt(i) << 32) | beInt(i + 4)
    def tag(i: Int) = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (b == null || b.length < 16 || tag(4) != "ftyp") return None

    // walk boxes in [lo, hi); returns (type, payloadStart, payloadEnd)
    def boxes(lo: Long, hi: Long): Iterator[(String, Long, Long)] =
      new Iterator[(String, Long, Long)] {
        private var i = lo
        def hasNext: Boolean = i + 8 <= hi
        def next(): (String, Long, Long) = {
          val size0 = beInt(i.toInt)
          val t = tag(i.toInt + 4)
          val (payload, end) =
            if (size0 == 1 && i + 16 <= hi) (i + 16, i + beLong(i.toInt + 8))
            else if (size0 == 0) (i + 8, hi) // "to end of file"
            else (i + 8, i + size0)
          // malformed size: stop the walk rather than loop/overrun
          val bounded = if (end <= i + 8 || end > hi) hi else end
          i = bounded
          (t, payload, bounded)
        }
      }

    var dur = -1L
    var w = 0; var h = 0; var vtracks = 0
    boxes(0, b.length.toLong).foreach {
      case ("moov", ms, me) =>
        boxes(ms, me).foreach {
          // every payload read is bounds-guarded: a truncated box
          // degrades to "field not found" (→ None), never an AIOOBE —
          // the same graceful-degradation contract as parseAudioHeader
          case ("mvhd", ps, pe) =>
            val p = ps.toInt
            if (ps + 1 <= pe && p < b.length) {
              val ver = (b(p) & 0xff)
              if (ver == 1 && ps + 32 <= pe && p + 32 <= b.length) {
                val ts = beInt(p + 20)
                if (ts > 0) dur = beLong(p + 24) * 1000L / ts
              } else if (ver != 1 && ps + 20 <= pe && p + 20 <= b.length) {
                val ts = beInt(p + 12)
                if (ts > 0) dur = beInt(p + 16) * 1000L / ts
              }
            }
          case ("trak", ts0, te) =>
            boxes(ts0, te).foreach {
              case ("tkhd", ps, pe) =>
                val p = ps.toInt
                if (ps + 1 <= pe && p < b.length) {
                  val ver = (b(p) & 0xff)
                  val off = if (ver == 1) p + 88 else p + 76
                  if (ps + (off - p) + 8 <= pe && off + 8 <= b.length) {
                    val tw = (beInt(off) >> 16).toInt
                    val th = (beInt(off + 4) >> 16).toInt
                    if (tw > 0 && th > 0) {
                      vtracks += 1
                      // Long math: garbage 16.16 dims (up to 65535)
                      // would overflow an Int product and misorder
                      if (tw.toLong * th > w.toLong * h) { w = tw; h = th }
                    }
                  }
                }
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    if (dur >= 0) Some(VideoMeta("mp4", dur, w, h, vtracks)) else None
  }

  private def jpegDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    var i = 2
    while (i + 9 < b.length) {
      if (u8(i) != 0xff) return None
      // 0xFF fill/padding bytes may precede a marker (JPEG B.1.1.2)
      while (i + 9 < b.length && u8(i + 1) == 0xff) i += 1
      val marker = u8(i + 1)
      // SOS starts entropy-coded data (no more segment headers before
      // dims); EOI ends the stream — either way dims won't follow
      if (marker == 0xda || marker == 0xd9) return None
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
      else {
        // SOFn carry dimensions; C4/C8/CC are huffman/arithmetic tables
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return Some(("jpeg", (u8(i + 7) << 8) | u8(i + 8), (u8(i + 5) << 8) | u8(i + 6)))
        i += 2 + ((u8(i + 2) << 8) | u8(i + 3))
      }
    }
    None
  }

  /** STUB decoder — deterministic fake of an image/audio decode.
    * A real implementation would parse `blob` with a codec; the
    * batch-shape (whole-partition iterator, zero-copy per row) is what
    * a vectorized decode needs. Returns (payload bytes, first symbol
    * code point) — code point, not raw byte, so the value is
    * charset-stable for non-ASCII payload-as-text stand-ins. A null
    * blob (NULL source text cast to binary) decodes as empty rather
    * than crashing the partition. */
  def decodeStub(blob: Array[Byte]): (Long, Int) =
    if (blob == null || blob.isEmpty) (0L, 0)
    else (blob.length.toLong,
      new String(blob, java.nio.charset.StandardCharsets.UTF_8).codePointAt(0))

  /** Feature extraction over media rows — mapPartitions so a real
    * decoder amortizes per-partition init (model load, codec context),
    * the Scala analogue of a batched pandas UDF. */
  def extractFeatures(media: DataFrame, frameBytes: Int = 256): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "blob", "width", "height", "modality")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would go here (codec/model handles)
        rows.map { r =>
          val (len, first) = decodeStub(r.blob)
          // real codec-container payloads yield REAL dimensions from the
          // header parse; everything else keeps the metadata columns
          val dims = parseImageHeader(r.blob)
          MediaFeatures(r.doc_id, len,
            n_frames = (len + frameBytes - 1) / frameBytes,
            width = dims.fold(r.width)(_._2),
            height = dims.fold(r.height)(_._3), first_byte = first)
        }
      }
  }

  final case class MediaMeta(doc_id: Long, format: String, width: Int,
      height: Int, sample_rate: Int, channels: Int, duration_ms: Long,
      video_tracks: Int)

  /** Container-metadata dispatch across all three REAL parsers: try
    * image (PNG/GIF/BMP/JPEG), then audio (RIFF/WAVE), then video
    * (ISO-BMFF) by magic number; anything else is `raw` with zeroed
    * fields. Needs only (doc_id, blob) — the parsers read nothing
    * else. mapPartitions like [[extractFeatures]] — the batch shape a
    * vectorized decoder needs; parse failures degrade per row, never
    * fail the partition. */
  def mediaMetadata(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "blob")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, blob) =>
          parseImageHeader(blob) match {
            case Some((fmt, w, h)) =>
              MediaMeta(docId, fmt, w, h, 0, 0, 0L, 0)
            case None => parseAudioHeader(blob) match {
              case Some(a) =>
                // duration in BIT space: dataBytes·8·1000 / (rate·ch·bits)
                // — bits/8 would floor to 0 for sub-byte samples and
                // undercount non-byte-aligned ones
                val bitsPerSec =
                  a.sampleRate.toLong * a.channels * a.bitsPerSample
                val durMs =
                  if (bitsPerSec > 0) a.dataBytes * 8L * 1000L / bitsPerSec
                  else 0L
                MediaMeta(docId, a.format, 0, 0, a.sampleRate, a.channels,
                  durMs, 0)
              case None => parseVideoHeader(blob) match {
                case Some(v) =>
                  MediaMeta(docId, v.format, v.width, v.height, 0, 0,
                    v.durationMs, v.videoTracks)
                case None => MediaMeta(docId, "raw", 0, 0, 0, 0, 0L, 0)
              }
            }
          }
        }
      }
  }

  /** Deterministic synthetic PNG: a `w`×`h` RGB gradient whose every
    * pixel is a fixed linear function of (docId, x, y) —
    *   r = (id·3 + x·7 + y·11) mod 256
    *   g = (id·5 + x·13 + y·3) mod 256
    *   b = (id·7 + x   + y·5 ) mod 256
    * — encoded through the REAL javax.imageio PNG encoder. Because the
    * pixel law is closed-form, a SQL oracle can recompute any
    * pixel-derived feature analytically WITHOUT a decoder, which is
    * what lets the declared image queries pin [[PngCodec]]'s decode as
    * bit-exact: encoder (imageio) → decoder (ours) → feature must
    * equal the formula. */
  def syntheticPng(docId: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId * 3 + x * 7 + y * 11) % 256).toInt
        val g = ((docId * 5 + x * 13 + y * 3) % 256).toInt
        val b = ((docId * 7 + x + y * 5) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Ingest twin of [[ingest]] for the REAL decode path: every doc gets
    * an actual PNG payload ([[syntheticPng]] of its id). mapPartitions
    * — the encoder amortizes like a real ingest-side transcoder. */
  def ingestPng(docs: DataFrame, w: Int = 16, h: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticPng(id, w, h))))
      .toDF("doc_id", "blob")
  }

  /** Deterministic synthetic JPEG: a `w`×`h` GRAYSCALE image,
    * piecewise-CONSTANT per 8×8 DCT block —
    *   v(block bx, by) = (id·3 + bx·7 + by·11) mod 256
    * — written through the REAL javax.imageio JPEG encoder at
    * compression quality 1.0. A constant 8×8 block is DC-only in the
    * DCT domain and the quality-1.0 luminance quantizer is 1, so the
    * LOSSY codec is exactly lossless on this fixture (grayscale also
    * sidesteps chroma subsampling and YCbCr rounding): the SQL oracle
    * can recompute pixel-derived features analytically from the block
    * law, pinning [[JpegCodec]]'s decode bit-exact the way
    * [[syntheticPng]] pins [[PngCodec]]. */
  def syntheticJpeg(docId: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((docId * 3 + (x / 8) * 7 + (y / 8) * 11) % 256).toInt
        raster.setSample(x, y, 0, v)
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Mixed-format ingest: even doc ids get a PNG payload, odd ids a
    * JPEG — the web-corpus shape where one pipeline must decode both.
    * Same mapPartitions amortization as [[ingestPng]]. */
  def ingestMixed(docs: DataFrame, w: Int = 16, h: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id =>
        (id, if (id % 2 == 0) syntheticPng(id, w, h)
             else syntheticJpeg(id, w, h))))
      .toDF("doc_id", "blob")
  }

  /** Container-dispatched pixel decode: PNG magic → [[PngCodec]]
    * (from-spec JVM decoder), JPEG SOI → [[JpegCodec]] (platform
    * decoder). Unknown containers and failed decodes are None — the
    * shared degradation contract of both codecs. */
  def decodeImage(blob: Array[Byte]): Option[PngCodec.Pixels] = {
    if (blob == null || blob.length < 3) None
    else if ((blob(0) & 0xff) == 0x89 && blob(1) == 'P'.toByte)
      PngCodec.decode(blob)
    else if ((blob(0) & 0xff) == 0xff && (blob(1) & 0xff) == 0xd8)
      JpegCodec.decode(blob)
    else None
  }

  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      channels: Int, luma_total: Long, ahash: String)

  /** REAL image feature extraction: [[decodeImage]] decodes the
    * payload to pixels (PNG via [[PngCodec]], JPEG via [[JpegCodec]]
    * — no stub anywhere on this path), then two integer-exact
    * features per image:
    *   - `luma_total`: Σ over pixels of Rec.601 luma ×1000
    *   - `ahash`: the 8×8 average-hash ('1' where a cell's mean luma
    *     exceeds the image mean; cross-multiplied integer compare
    *     `cell_sum · n_pixels > total · cell_npix`, so unequal cell
    *     sizes at non-multiple-of-8 dims stay exact), emitted as a
    *     64-char bit string row-major — the standard perceptual
    *     near-dup fingerprint.
    * Non-decodable payloads are dropped (flatMap None — a corrupt blob
    * never fails the partition). Map-side at any scale. */
  /** Per-cell luma sums and pixel counts of the 8×8 aHash grid — the
    * shared accumulator behind [[imageFeatures]] and the video-frame
    * hashes (a video fingerprint sums these ACROSS frames before
    * thresholding). */
  private[ext] def ahashCells(p: PngCodec.Pixels): (Array[Long], Array[Long]) = {
    val sums = new Array[Long](64)
    val npix = new Array[Long](64)
    var y = 0
    while (y < p.height) {
      var x = 0
      while (x < p.width) {
        val cell = (y * 8 / p.height) * 8 + (x * 8 / p.width)
        sums(cell) += p.lumaQ(x, y)
        npix(cell) += 1
        x += 1
      }
      y += 1
    }
    (sums, npix)
  }

  /** Threshold the accumulated cells into the 64-char bit string:
    * bit c = 1 iff cell c's mean luma exceeds the overall mean,
    * cross-multiplied (`cell_sum · n_pixels > total · cell_npix`) so
    * unequal cell sizes at non-multiple-of-8 dims stay exact. */
  private[ext] def ahashBits(sums: Array[Long], npix: Array[Long]): String = {
    val total = sums.sum
    val n = npix.sum
    val bits = new StringBuilder(64)
    var c = 0
    while (c < 64) {
      // BigInt products: total·npix can exceed Long for images
      // that pass the raster guard (e.g. 16k×16k gray) — a
      // wrapped product would silently invert hash bits
      bits.append(
        if (BigInt(sums(c)) * n > BigInt(total) * npix(c)) '1'
        else '0')
      c += 1
    }
    bits.toString
  }

  /** Hamming distance between two 64-char '0'/'1' fingerprint strings
    * as a pure codegen expression: four 16-bit words each parse with
    * `conv(_, 2, 10)`, XOR, `bit_count` — equal by construction to the
    * count of differing chars (both strings are exactly 64 binary
    * chars). r17-opt: replaces the
    * `size(filter(sequence(1, 64), i -> substring(..) <> substring(..)))`
    * form, which allocated a 64-element array + 128 single-char
    * substrings per CANDIDATE PAIR in the near-dup verify stages. */
  private[graft] def hammingBits64(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 4).map { w =>
      bit_count(conv(substring(a, w * 16 + 1, 16), 2, 10).cast("long")
        .bitwiseXOR(conv(substring(b, w * 16 + 1, 16), 2, 10).cast("long")))
    }.reduce(_ + _)

  def imageFeatures(media: DataFrame): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (docId, blob) =>
          decodeImage(blob).map { p =>
            val (sums, npix) = ahashCells(p)
            ImageFeatures(docId, p.width, p.height, p.channels, sums.sum,
              ahashBits(sums, npix))
          }
        }
      }
  }

  /** Hot-bucket cap shared by the three banded near-dup operators —
    * the standard production LSH guard: a (band, slice) bucket holding
    * more than `maxBucket` members contributes n² candidate pairs
    * while carrying almost no discriminative signal (a slice shared by
    * thousands of items is degenerate), so large-scale dedup pipelines
    * drop those buckets rather than let one hot slice go quadratic.
    * The 100× soak measured exactly this failure: a low-entropy
    * fingerprint corpus at 500k docs melted the uncapped self-join.
    * `maxBucket <= 0` = uncapped (the exact pigeonhole guarantee, the
    * declared-query semantics). The size census shuffles on the SAME
    * (band, slice) key as the self-join, so it rides the existing
    * exchange layout. What a capped run loses: pairs whose ONLY shared
    * slices are hot — for maxHamming < bands those are items near-dup
    * to thousands of others, which a curation pipeline treats as
    * boilerplate clusters, not pairs. */
  private def capBuckets(banded: DataFrame, maxBucket: Int): DataFrame =
    if (maxBucket <= 0) banded
    else {
      val sizes = banded.groupBy("band", "slice")
        .agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBucket)
        .select("band", "slice")
      banded.join(sizes, Seq("band", "slice"))
    }

  /** Perceptual near-duplicate pairs by aHash hamming distance ≤
    * `maxHamming`, over REAL decoded pixels ([[imageFeatures]]).
    * Banded exactly like SimHash/MinHash: the 64-bit hash splits into
    * `bands` equal slices and candidates must share at least one slice
    * VERBATIM — pigeonhole-complete whenever maxHamming < bands (≤
    * maxHamming differing bits cannot touch every one of `bands`
    * slices), so the band join loses nothing while pruning the pair
    * space to hash-bucket collisions. Exact hamming verify + dedup
    * between join and output. `maxBucket` opts into the hot-bucket cap
    * ([[capBuckets]]). */
  def imageNearDup(media: DataFrame, maxHamming: Int = 3,
      bands: Int = 4, maxBucket: Int = 0): DataFrame = {
    require(maxHamming < bands, "banding is only lossless below the band count")
    require(64 % bands == 0, "bands must divide 64")
    val bw = 64 / bands
    // persist: the banded SELF-join would otherwise run the full
    // decode+feature extraction once per join side (the frame is
    // (id, 64-char hash) — tiny). Materialized eagerly so the decode
    // runs exactly once, and unpersisted before return: the RESULT is
    // cached instead (output-sized — duplicate-density, the minimum
    // state any consumer holds anyway), so repeated invocations in a
    // long-lived session don't accumulate feature frames.
    val f = imageFeatures(media).select(col("doc_id"), col("ahash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    f.count()
    val banded = capBuckets(f.select(col("doc_id"), col("ahash"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("slice", expr(s"substring(ahash, band * $bw + 1, $bw)")),
      maxBucket)
    val pairs = banded.as("a")
      .join(banded.as("b"), Seq("band", "slice"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
    val out = pairs
      .withColumn("hamming",
        hammingBits64(col("ha"), col("hb")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    f.unpersist(blocking = false)
    out
  }

  /** Frame sampling: slice the payload into fixed-size frames and
    * sample every `stride`-th — pure columnar ops, no UDF. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame =
    media
      .withColumn("n_frames",
        ceil(length(col("blob")) / lit(frameBytes.toDouble)).cast("long"))
      .filter(col("n_frames") > 0) // sequence(0, -1) would DESCEND
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)

  // ------------------------------------------------------------------
  // REAL audio PCM decode — the e81 (imageio) move for sound:
  // javax.sound.sampled is a JDK-native WAV reader/writer, so audio
  // payloads no longer stop at the header parse. VIDEO decodes fully
  // for MJPEG-in-AVI (decodeVideoFrames below); inter-frame codings
  // (H.26x/VP9/AV1) stay OUT of reach on a pure JDK — decodeStub
  // remains the documented stand-in for those; headers stay real
  // (parseVideoHeader).
  // ------------------------------------------------------------------

  /** Decoded PCM: one Int array per channel (de-interleaved), values
    * centered on 0 whatever the container encoding (8-bit unsigned
    * shifts by 128, 16-bit unsigned by 32768). */
  final case class AudioSamples(sampleRate: Int, channels: Int,
      samples: Array[Array[Int]])

  /** REAL audio payload decode via the JDK's javax.sound.sampled WAV
    * plugin: 8/16-bit PCM (signed or unsigned, either endianness) to
    * per-channel Int samples. None for anything the platform reader
    * rejects or non-PCM encodings — per-row graceful degradation like
    * every parser here, never a partition failure. */
  def decodeAudio(blob: Array[Byte]): Option[AudioSamples] = {
    if (blob == null || blob.length < 12) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        if ((bits != 8 && bits != 16) || (!signed && !unsigned) || ch < 1)
          return None
        val bytes = ais.readAllBytes()
        val bps = bits / 8
        val frameBytes = bps * ch
        val n = bytes.length / frameBytes
        val out = Array.fill(ch)(new Array[Int](n))
        var t = 0
        while (t < n) {
          var c = 0
          while (c < ch) {
            val off = t * frameBytes + c * bps
            val v =
              if (bits == 8) {
                if (unsigned) (bytes(off) & 0xff) - 128 else bytes(off).toInt
              } else {
                val raw =
                  if (fmt.isBigEndian)
                    (bytes(off).toInt << 8) | (bytes(off + 1) & 0xff)
                  else (bytes(off + 1).toInt << 8) | (bytes(off) & 0xff)
                if (unsigned) (raw & 0xffff) - 32768 else raw
              }
            out(c)(t) = v
            c += 1
          }
          t += 1
        }
        Some(AudioSamples(math.round(fmt.getSampleRate), ch, out))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic synthetic WAV: `nSamples` frames of 16-bit signed
    * little-endian PCM whose every sample is a fixed integer law of
    * (docId, channel, t) —
    *   s = ((id·7919 + ch·104729 + t·31337 + id·t·271) mod 65536) − 32768
    * (the id·t cross term decorrelates different ids' sample walks —
    * without it every id is the same mod-65536 progression at a
    * constant offset and window energies collide en masse)
    * — written through the REAL javax.sound.sampled WAVE writer.
    * PCM-in-WAV is lossless, so decoder output must equal the law
    * exactly: the SQL oracle recomputes every sample-derived feature
    * analytically, pinning [[decodeAudio]] bit-exact the way
    * [[syntheticPng]]/[[syntheticJpeg]] pin the image decoders. */
  def syntheticWav(docId: Long, nSamples: Int = 512, channels: Int = 2,
      sampleRate: Int = 8000): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val data = new Array[Byte](nSamples * channels * 2)
    var t = 0
    while (t < nSamples) {
      var c = 0
      while (c < channels) {
        val s = (((docId * 7919 + c * 104729 + t.toLong * 31337
          + docId * t * 271) % 65536) - 32768).toInt
        val off = (t * channels + c) * 2
        data(off) = (s & 0xff).toByte
        data(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      t += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  /** Ingest twin of [[ingestPng]] for audio: every doc gets a real WAV
    * payload of its id — mono for even ids, stereo for odd, so one
    * pipeline exercises channel de-interleaving. */
  def ingestWav(docs: DataFrame, nSamples: Int = 512,
      sampleRate: Int = 8000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        (id, syntheticWav(id, nSamples, channels = 1 + (id % 2).toInt,
          sampleRate = sampleRate))))
      .toDF("doc_id", "blob")
  }

  /** Pure half of the 64-bit audio perceptual fingerprint — the aHash
    * analog for sound: the samples split into 64 equal windows
    * (trailing remainder ignored); bit k = 1 iff window k's ENERGY
    * (Σ s², exact integers) exceeds the per-window mean, compared
    * cross-multiplied (e_k·64 > total) so no division ever rounds.
    * None when fewer than 64 samples. */
  def audioFingerprintBits(samples: Array[Int]): Option[String] = {
    val n = samples.length
    if (n < 64) return None
    val win = n / 64
    val e = new Array[Long](64)
    var k = 0
    while (k < 64) {
      var t = k * win
      val end = t + win
      var acc = 0L
      while (t < end) { val v = samples(t).toLong; acc += v * v; t += 1 }
      e(k) = acc
      k += 1
    }
    val total = e.sum
    val sb = new java.lang.StringBuilder(64)
    k = 0
    while (k < 64) {
      sb.append(if (e(k) * 64 > total) '1' else '0')
      k += 1
    }
    Some(sb.toString)
  }

  /** Per-doc audio fingerprint over channel 0 — map-side, one decode
    * per row. Re-uploads of the same PCM collide exactly; re-encodes
    * land within a few bits. */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        decodeAudio(blob).flatMap(a => audioFingerprintBits(a.samples(0)))
          .map((id, _))
      }
      .toDF("doc_id", "afp")
  }

  /** Banded perceptual AUDIO near-dup — [[imageNearDup]]'s shape over
    * [[audioFingerprint]]: fingerprints band into `bands` slices, a
    * self-join on (band, slice) yields candidates (lossless below the
    * band count by pigeonhole), exact hamming filters. Never all-pairs
    * — the 100 TB shape for "find re-uploaded audio". */
  def audioNearDup(media: DataFrame, maxHamming: Int = 3,
      bands: Int = 4, maxBucket: Int = 0): DataFrame = {
    require(maxHamming < bands, "banding is only lossless below the band count")
    require(64 % bands == 0, "bands must divide 64")
    val bw = 64 / bands
    // persist: the banded SELF-join would otherwise decode every blob
    // once per join side (same rationale as imageNearDup)
    val f = audioFingerprint(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    f.count()
    val banded = capBuckets(f.select(col("doc_id"), col("afp"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("slice", expr(s"substring(afp, band * $bw + 1, $bw)")),
      maxBucket)
    val pairs = banded.as("a")
      .join(banded.as("b"), Seq("band", "slice"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.afp").as("ha"), col("b.afp").as("hb"))
      .distinct()
    val out = pairs
      .withColumn("hamming",
        hammingBits64(col("ha"), col("hb")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    f.unpersist(blocking = false)
    out
  }

  /** Ingest for the audio near-dup fixture: doc pair (2k, 2k+1) shares
    * ONE mono PCM payload (the re-upload shape) — byte-identical WAVs,
    * so fingerprints collide at hamming 0 and the oracle can re-derive
    * every pair from the sample law. */
  def ingestWavDup(docs: DataFrame, nSamples: Int = 512): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        (id, syntheticWav(id - (id % 2), nSamples, channels = 1))))
      .toDF("doc_id", "blob")
  }

  /** Per-channel exact-integer audio features — the curation signals
    * a multimodal pipeline filters on: total energy (Σ s², exact),
    * peak |s|, zero-crossing count (sign transitions), duration. All
    * integers so the analytic oracle matches bit-for-bit; map-side
    * (one decode per row, no shuffle). */
  final case class AudioChannelFeatures(doc_id: Long, channel: Int,
      sample_rate: Int, n_samples: Long, energy: Long, peak_abs: Long,
      zero_cross: Long, duration_ms: Long)

  def audioFeatures(media: DataFrame): Dataset[AudioChannelFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        decodeAudio(blob).toSeq.flatMap { a =>
          a.samples.zipWithIndex.map { case (s, c) =>
            var energy = 0L
            var peak = 0L
            var zc = 0L
            var t = 0
            while (t < s.length) {
              val v = s(t).toLong
              energy += v * v
              val av = math.abs(v)
              if (av > peak) peak = av
              if (t > 0 && ((s(t) >= 0) != (s(t - 1) >= 0))) zc += 1
              t += 1
            }
            AudioChannelFeatures(id, c, a.sampleRate, s.length.toLong,
              energy, peak, zc,
              if (a.sampleRate > 0) s.length.toLong * 1000L / a.sampleRate
              else 0L)
          }
        }
      }
  }

  // ------------------------------------------------------------------
  // REAL video frame decode — MJPEG-in-AVI: the one video coding a
  // pure JDK can fully decode (every frame is an independent JPEG
  // through javax.imageio; the AVI/RIFF container walk is the
  // parseAudioHeader chunk loop). This closes the decodeStub's
  // JDK-closable half: H.26x/VP9/AV1 payloads remain the documented
  // stand-in boundary — no inter-frame codec ships with the platform.
  // ------------------------------------------------------------------

  /** Decoded MJPEG video: per-frame pixel rasters in stream order plus
    * the container's frame clock. */
  final case class VideoFrames(width: Int, height: Int,
      microSecPerFrame: Long, frames: IndexedSeq[PngCodec.Pixels])

  /** REAL MJPEG-in-AVI decode: RIFF chunk walk (reference container
    * handling: hbase has none — this is a training-pipeline extension)
    * to `hdrl/avih` for the frame clock and dimensions, then every
    * `##dc`/`##db` frame chunk under `LIST movi` (including nested
    * `LIST rec` groups) through [[JpegCodec]]. Per-frame degradation:
    * an undecodable frame is skipped, a malformed container is None —
    * never a partition failure, the shared parser contract here. */
  def decodeVideoFrames(blob: Array[Byte]): Option[VideoFrames] = {
    if (blob == null || blob.length < 12) return None
    def u8(i: Int) = blob(i) & 0xff
    def leInt(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int) = new String(blob, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    try {
      var usecPerFrame = 0L
      var w = 0
      var h = 0
      val frames = scala.collection.immutable.Vector.newBuilder[PngCodec.Pixels]
      def isFrameId(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.substring(2) == "dc" || id.substring(2) == "db")
      // one tolerant walker for every nesting level: RIFF body, hdrl,
      // strl, movi and rec groups all share the <id><size><payload>
      // shape; a size running past the buffer clamps to the region end
      def walk(lo: Long, hi: Long): Unit = {
        var i = lo
        while (i + 8 <= hi) {
          val id = tag(i.toInt)
          val size = leInt(i.toInt + 4).toLong & 0xffffffffL
          val payload = i + 8
          val end = math.min(payload + size, hi)
          if (id == "LIST" && payload + 4 <= hi) {
            val kind = tag(payload.toInt)
            if (kind == "hdrl" || kind == "strl" || kind == "movi" ||
                kind == "rec ") walk(payload + 4, end)
          } else if (id == "avih" && payload + 40 <= hi) {
            usecPerFrame = leInt(payload.toInt).toLong & 0xffffffffL
            w = leInt(payload.toInt + 32)
            h = leInt(payload.toInt + 36)
          } else if (isFrameId(id) && end > payload) {
            JpegCodec.decode(java.util.Arrays.copyOfRange(
              blob, payload.toInt, end.toInt)).foreach(frames += _)
          }
          i = payload + size + (size & 1L)
          if (i <= payload) return // corrupt zero/negative advance
        }
      }
      walk(12L, blob.length.toLong)
      val fs = frames.result()
      if (fs.isEmpty) None
      else Some(VideoFrames(
        if (w > 0) w else fs.head.width,
        if (h > 0) h else fs.head.height,
        usecPerFrame, fs))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One deterministic MJPEG frame: the [[syntheticJpeg]] fixture law
    * extended with a SCENE term — frames group into scenes of
    * `sceneLen` identical frames,
    *   v(block bx, by) = (id·3 + scene·17 + bx·7 + by·11
    *                      + id·(by·8+bx)·13) mod 256
    * (the id·block cross term decorrelates different ids' spatial
    * patterns — without it every id carries the same above/below-mean
    * block layout at a constant offset and fingerprints collide en
    * masse, the [[syntheticWav]] id·t lesson), grayscale,
    * piecewise-constant per 8×8 DCT block, imageio quality 1.0 → the
    * lossy codec is exactly lossless on the fixture (DC-only blocks,
    * unit quantizer), so the SQL oracle recomputes every frame-derived
    * feature analytically. */
  def syntheticMjpegFrame(docId: Long, frame: Int, w: Int = 16,
      h: Int = 16, sceneLen: Int = 4): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    val scene = frame / sceneLen
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((docId * 3 + scene * 17 + (x / 8) * 7 + (y / 8) * 11
          + docId * ((y / 8) * 8 + (x / 8)) * 13) % 256).toInt
        raster.setSample(x, y, 0, v)
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Hand-built RIFF/AVI container around real imageio MJPEG frames:
    * RIFF(AVI ) → LIST hdrl (avih + LIST strl (strh 'vids'/'MJPG' +
    * strf BITMAPINFOHEADER)) → LIST movi (00dc per frame) — the
    * MS AVI 1.0 layout every MJPEG consumer reads. 25 fps clock
    * (dwMicroSecPerFrame 40000, strh scale/rate 1/25). */
  def syntheticAvi(docId: Long, nFrames: Int = 8, w: Int = 16,
      h: Int = 16, sceneLen: Int = 4): Array[Byte] = {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fcc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fcc(id) ++ le32(payload.length.toLong) ++ payload ++ pad
    }
    def list(kind: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(kind) ++ children)
    val avih = chunk("avih",
      le32(40000L) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(nFrames.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w.toLong) ++ le32(h.toLong) ++ new Array[Byte](16))
    val strh = chunk("strh",
      fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++ le32(nFrames.toLong) ++
        le32(0) ++ le32(0) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf",
      le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++ le16(24) ++
        fcc("MJPG") ++ le32(w.toLong * h * 3) ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      (0 until nFrames).toArray.flatMap(f =>
        chunk("00dc", syntheticMjpegFrame(docId, f, w, h, sceneLen))))
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  /** Ingest twin of [[ingestWav]] for video: every doc gets a real
    * MJPEG-in-AVI payload of its id. */
  def ingestAvi(docs: DataFrame, nFrames: Int = 8, w: Int = 16,
      h: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticAvi(id, nFrames, w, h))))
      .toDF("doc_id", "blob")
  }

  /** Ingest for the video near-dup fixture: doc pair (2k, 2k+1) shares
    * ONE video payload (the re-upload shape, [[ingestWavDup]]'s law).
    * 64×64 frames by default: 8×8 DCT blocks then map one-to-one onto
    * the 64 aHash cells, so the fingerprint carries 64 independent
    * bits of the law — at 16×16 only 4 blocks exist and fingerprints
    * would collapse into mass collisions. */
  def ingestAviDup(docs: DataFrame, nFrames: Int = 8, w: Int = 64,
      h: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        (id, syntheticAvi(id - (id % 2), nFrames, w, h))))
      .toDF("doc_id", "blob")
  }

  /** Per-frame features over REAL decoded MJPEG frames — the video
    * analog of [[imageFeatures]] plus the temporal signals a curation
    * pipeline cuts on: per-frame aHash, luma total, and `scene_cut`
    * (the frame's hash differs from its predecessor's — the standard
    * hash-delta scene-change detector; frame 0 is never a cut). All
    * map-side: a video's frames live in ONE blob, so the per-doc
    * sequential pass is a single row's work, no shuffle. */
  final case class VideoFrameFeatures(doc_id: Long, frame_idx: Int,
      width: Int, height: Int, luma_total: Long, ahash: String,
      scene_cut: Boolean)

  def videoFrameFeatures(media: DataFrame): Dataset[VideoFrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        decodeVideoFrames(blob).toSeq.flatMap { v =>
          var prev: String = null
          v.frames.zipWithIndex.map { case (p, f) =>
            val (sums, npix) = ahashCells(p)
            val hash = ahashBits(sums, npix)
            val cut = prev != null && hash != prev
            prev = hash
            VideoFrameFeatures(id, f, p.width, p.height, sums.sum, hash, cut)
          }
        }
      }
  }

  /** Per-doc 64-bit VIDEO fingerprint: the aHash of the temporally
    * averaged video — per-cell luma sums accumulate ACROSS frames
    * before the single cross-multiplied threshold, so the fingerprint
    * is frame-order-insensitive for re-uploads yet shifts with any
    * scene's content. One decode per row, map-side. */
  def videoFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        decodeVideoFrames(blob).filter(_.frames.nonEmpty).map { v =>
          val acc = new Array[Long](64)
          val accN = new Array[Long](64)
          v.frames.foreach { p =>
            val (sums, npix) = ahashCells(p)
            var c = 0
            while (c < 64) { acc(c) += sums(c); accN(c) += npix(c); c += 1 }
          }
          (id, ahashBits(acc, accN))
        }
      }
      .toDF("doc_id", "vfp")
  }

  /** Banded perceptual VIDEO near-dup — [[audioNearDup]]'s shape over
    * [[videoFingerprint]]: (band, slice) self-join candidates
    * (pigeonhole-lossless below the band count), exact hamming verify,
    * never all-pairs — the 100 TB shape for "find re-uploaded video". */
  def videoNearDup(media: DataFrame, maxHamming: Int = 3,
      bands: Int = 4, maxBucket: Int = 0): DataFrame = {
    require(maxHamming < bands, "banding is only lossless below the band count")
    require(64 % bands == 0, "bands must divide 64")
    val bw = 64 / bands
    // persist: the banded SELF-join would otherwise decode every blob
    // once per join side (same rationale as imageNearDup/audioNearDup)
    val f = videoFingerprint(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    f.count()
    val banded = capBuckets(f.select(col("doc_id"), col("vfp"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("slice", expr(s"substring(vfp, band * $bw + 1, $bw)")),
      maxBucket)
    val pairs = banded.as("a")
      .join(banded.as("b"), Seq("band", "slice"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.vfp").as("ha"), col("b.vfp").as("hb"))
      .distinct()
    val out = pairs
      .withColumn("hamming",
        hammingBits64(col("ha"), col("hb")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    f.unpersist(blocking = false)
    out
  }
}
