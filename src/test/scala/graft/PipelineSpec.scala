package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextAnalysis}
import graft.model.Tables

/** End-to-end training-data pipeline composition: the operators are
  * useful individually, but the product is the pipeline — exact dedup,
  * near-dup clustering, quality filtering, token accounting, and a
  * bucketed durable output, all as ONE lazy plan chain per stage.
  */
class PipelineSpec extends SparkSpec {

  test("corpus pipeline: dedup -> near-dup groups -> quality gate -> tokens -> store") {
    val docs = Tables.load(spark, s"$sf0001/documents.parquet")
    val total = docs.count()

    // 1. exact dedup keep-list (one hash aggregate)
    val keep = Dedup.exactDedupKeep(docs)
    val kept = docs.join(
      keep.select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    assert(kept.count() <= total && kept.count() > 0)

    // 2. near-dup clustering: keep only group representatives
    val pairs = Dedup.minHashNearDups(kept, k = 16, bands = 4, threshold = 0.8)
    val groups = Dedup.nearDupGroups(pairs)
    val dropIds = groups.filter(col("doc_id") =!= col("group_id"))
      .select(col("doc_id"))
    val canonical = kept.join(dropIds, Seq("doc_id"), "left_anti")
    assert(canonical.count() === kept.count() - dropIds.count())

    // 3. quality gate + token accounting
    val scored = TextAnalysis.qualityScore(canonical)
      .filter(col("quality") > 0.1)
    val tokens = scored.agg(sum("n_tokens")).head().getLong(0)
    assert(tokens > 0)

    // 4. durable bucketed output (region layout)
    val tmp = java.nio.file.Files.createTempDirectory("pipe").toString
    scored.select("doc_id", "n_tokens", "quality")
      .write.mode("overwrite").parquet(s"$tmp/corpus")
    assert(spark.read.parquet(s"$tmp/corpus").count() === scored.count())
  }
}
