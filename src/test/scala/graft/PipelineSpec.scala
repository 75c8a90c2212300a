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

  test("shardShuffle: reproducible, salt-independent, shard-complete") {
    import graft.ext.Pipeline
    val docs = Tables.load(spark, s"$sf0001/documents.parquet")
    val a = Pipeline.shardShuffle(docs, nShards = 4).select("doc_id", "shard", "pos")
    // deterministic: a re-run is byte-identical
    assert(a.exceptAll(Pipeline.shardShuffle(docs, nShards = 4)
      .select("doc_id", "shard", "pos")).isEmpty)
    // every doc lands exactly once; positions are 1..n dense per shard
    assert(a.count() === docs.count())
    val perShard = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .collect()
    assert(perShard.length === 4)
    perShard.foreach(r =>
      assert(r.getLong(1) === r.getLong(2) && r.getLong(3) === 1L))
    // a different salt produces a different order (independence)
    val b = Pipeline.shardShuffle(docs, nShards = 4, salt = "other")
      .select("doc_id", "shard", "pos")
    assert(a.exceptAll(b).count() > 0)
  }

  test("tokenBudget keeps the best-quality prefix per source within budget") {
    import graft.ext.Pipeline
    val docs = Tables.load(spark, s"$sf0001/documents.parquet")
    val out = Pipeline.tokenBudget(docs, budgetTokens = 300L).cache()
    assert(out.count() === docs.count())
    // kept-set per source: total tokens within budget
    val keptSums = out.filter(col("kept")).groupBy("source")
      .agg(sum("n_tokens").as("t")).collect()
    keptSums.foreach(r => assert(r.getLong(1) <= 300L, r.toString))
    // prefix property: no dropped doc outranks a kept one (higher
    // quality, or equal quality with smaller id) within a source
    val bad = out.alias("k").join(out.alias("d"),
        col("k.source") === col("d.source") &&
        col("k.kept") && !col("d.kept") &&
        (col("d.quality") > col("k.quality") ||
          (col("d.quality") === col("k.quality") &&
            col("d.doc_id") < col("k.doc_id")))).count()
    assert(bad === 0L)
    // some source must actually exceed a 300-token budget (test bites)
    assert(out.filter(!col("kept")).count() > 0)
  }
}
