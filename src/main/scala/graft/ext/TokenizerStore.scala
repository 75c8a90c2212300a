package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextHash._

/** The PERSISTED tokenizer artifact — the e32/e50 durable-index
  * pattern applied to the tokenizer: train ONCE
  * ([[TextAnalysis.bpeMerges]] + [[TextAnalysis.vocabCoverage]]), land
  * the merge rules and the coverage vocabulary as small parquet
  * tables, then encode ANY corpus from the stored artifact without
  * retraining — the `merges.txt` + `vocab.json` pair every tokenizer
  * ships, as tables.
  *
  * Encoding from the store is STRONGER than the in-session e62 plan:
  * the merge table is driver-bounded (`rounds` rows — the same
  * metadata-sized-collect contract as [[AnnIndex]]'s centroids), so
  * the learned pairs become string LITERALS in the plan and the whole
  * encode is one pure map-side projection — zero joins, zero
  * broadcasts, zero shuffles before the per-doc aggregate. At 100 TB
  * the artifact builds once on a training corpus and encodes every
  * future batch at scan speed.
  */
object TokenizerStore {

  def build(docs: DataFrame, dir: String, rounds: Int = 3,
      coveragePct: Int = 95): Unit = {
    TextAnalysis.bpeMerges(docs, rounds)
      .write.mode("overwrite").parquet(s"$dir/merges")
    TextAnalysis.vocabCoverage(docs, coveragePct)
      .write.mode("overwrite").parquet(s"$dir/vocab")
  }

  def merges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/merges")

  def vocab(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/vocab")

  /** Encode `docs` with the STORED merge rules, in learned order —
    * byte-identical output to [[TextAnalysis.bpeEncode]] on the
    * training corpus (the declared query shares e62's oracle). The
    * collect is `rounds` rows of tokenizer metadata, never data. */
  def encode(spark: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val rules = merges(spark, dir).orderBy("round")
      .select("pair").collect().map(_.getString(0))
    val toks = docs
      .select(col("doc_id"),
        explode_outer(tokens(coalesce(col("text"), lit("")))).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .withColumn("sym", regexp_replace(col("tok"), "(.)", " $1 "))
    val applied = rules.foldLeft(toks) { (df, pair) =>
      df.withColumn("sym",
        replace(col("sym"),
          lit(" " + pair.replace(" ", "  ") + " "),
          lit(" " + pair.replace(" ", "") + " ")))
    }
    applied
      .select(col("doc_id"), length(col("tok")).cast("long").as("__chars"),
        size(split(trim(col("sym")), "  ")).cast("long").as("__bpe"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__chars")).as("n_chars"),
        sum(col("__bpe")).as("n_bpe"))
  }
}
