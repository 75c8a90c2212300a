package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The PERSISTED IVF,SQ8 ANN index — the durable form of
  * [[Similarity.annIvfSq8TopK]], the way [[DedupIndex]] is the durable
  * form of the MinHash pipeline.
  *
  * Layout ON DISK is the 100 TB deployment shape the in-session
  * operator only narrates:
  *
  *   - `<dir>/codes`: the corpus as (vec_id, code int8[]) ONLY —
  *     ¼ the float32 bytes — written `partitionBy("cluster")`, one
  *     directory per inverted list;
  *   - `<dir>/centroids`: the nlist×dim coarse quantizer (tiny).
  *
  * A query then reads `nprobe/nlist` of the data BY CONSTRUCTION:
  * probed cluster ids become a partition-column filter, so Spark's
  * partition pruning (visible as PartitionFilters in the scan, pinned
  * in ExtSpec) skips every unprobed directory — no index scan, no
  * shuffle of the corpus, and the float column is never read at all.
  * Scoring is the exact integer qdot of codes, so results are
  * bit-identical to the in-session operator (e47's oracle covers both).
  */
object AnnIndex {

  /** Build (or replace) the index: train the coarse quantizer (cached),
    * code every vector, land codes partitioned by cluster. */
  def build(emb: DataFrame, dir: String, nlist: Int = 16,
      iters: Int = 2): Unit = {
    val (cents, indexed) = Similarity.ivfIndexed(emb, nlist, iters)
    indexed
      .select(col("vec_id"), col("cluster"),
        Similarity.sq8Code(col("embedding"), col("nrm")).as("code"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cluster").parquet(s"$dir/codes")
    val spark = emb.sparkSession
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
  }

  /** Append a batch of new vectors to an existing index: code them
    * against the STORED centroids (the quantizer is immutable after
    * build, as in FAISS — retrain = rebuild) and append into their
    * cluster partitions. Only the batch is scanned and written; the
    * existing lists are untouched. */
  def append(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("cluster").collect()
      .map(r => r.getSeq[Double](1).toArray)
    Similarity.withNorm(batch)
      .select(col("vec_id"),
        Similarity.assignCluster(col("embedding"), cents).as("cluster"),
        Similarity.sq8Code(col("embedding"), col("nrm")).as("code"))
      .select("vec_id", "cluster", "code")
      .write.mode(SaveMode.Append)
      .partitionBy("cluster").parquet(s"$dir/codes")
  }

  /** Top-k through the stored index: probe `nprobe` lists per query,
    * scan ONLY those partitions' codes, rank by exact integer qdot
    * (ties → vec_id). `queries` must carry (vec_id, embedding) —
    * typically the corpus rows being queried, but any vectors work:
    * they are coded query-side against the STORED centroids. */
  def query(spark: SparkSession, dir: String, queries: DataFrame, k: Int,
      nprobe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("cluster").collect()
      .map(r => r.getSeq[Double](1).toArray) // nlist×dim — driver-bounded
    val q = Similarity.withNorm(queries)
      .select(col("vec_id").as("query_id"),
        Similarity.sq8Code(col("embedding"), col("nrm")).as("qcode"),
        explode(Similarity.probeClusters(col("embedding"), cents, nprobe))
          .as("cluster"))
    // the probed-cluster set is ≤ queries×nprobe ids — collect it so the
    // partition filter is a LITERAL the scan prunes by (the same
    // driver-bounded collect contract as the centroids themselves)
    val probed = q.select("cluster").distinct().collect().map(_.getInt(0))
    val codes = spark.read.parquet(s"$dir/codes")
      .filter(col("cluster").isin(probed.map(Integer.valueOf): _*))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("vec_id").asc)
    codes
      .join(broadcast(q), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Similarity.qdot(col("qcode"), col("code")).as("qd0"))
      .groupBy("query_id", "vec_id").agg(min(col("qd0")).as("qdot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("qdot"))
  }
}
