package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. The media codecs are not available in
  * this environment, so the decode step is a clearly-marked
  * deterministic STUB — but the Spark-side machinery (schema,
  * batch-shaped partition processing, frame sampling, partitioning) is
  * real: swap `decodeStub` for a codec and the pipeline is production
  * shape. At scale the binary payloads stay columnar in parquet and
  * every operator below is map-side.
  */
object Multimodal {

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
          MediaFeatures(r.doc_id, len,
            n_frames = (len + frameBytes - 1) / frameBytes,
            width = r.width, height = r.height, first_byte = first)
        }
      }
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
}
