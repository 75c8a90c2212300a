package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED IVF,SQ8 ANN index — the durable form of
  * [[Similarity.annIvfSq8TopK]], the way [[DedupIndex]] is the durable
  * form of the MinHash pipeline.
  *
  * Layout ON DISK is the 100 TB deployment shape the in-session
  * operator only narrates:
  *
  *   - `<dir>/codes`: the corpus as (vec_id, code tinyint[]) ONLY —
  *     PHYSICALLY 1 byte per component, ¼ the float32 bytes — written
  *     `partitionBy("cluster")`, one directory per inverted list;
  *   - `<dir>/centroids`: the nlist×dim coarse quantizer (tiny).
  *
  * A query then reads `nprobe/nlist` of the data BY CONSTRUCTION:
  * probed cluster ids become a partition-column filter, so Spark's
  * partition pruning (visible as PartitionFilters in the scan, pinned
  * in ExtSpec) skips every unprobed directory — no index scan, no
  * shuffle of the corpus, and the float column is never read at all.
  * Scoring runs [[Similarity.qdotRank]] — the SAME ranking kernel as
  * the in-session operator, so results are bit-identical (e47's oracle
  * covers both; int8 codes round-trip the tinyint cast exactly).
  */
object AnnIndex {

  /** Build (or replace) the index: train the coarse quantizer (cached),
    * code every vector, land codes partitioned by cluster.
    *
    * `trainOn` optionally trains the quantizer on a SUBSET while the
    * codes still cover all of `emb` — FAISS's standard train-on-sample
    * (k-means needs ~max(nlist·256, √n) representative vectors, not
    * the corpus; at 100 TB training on everything is 2 full extra
    * passes per iteration for no recall gain). The e82 append path
    * already proves subset-trained quantizers: the quantizer is
    * immutable after build, and every vector codes against it the same
    * way. The declared e50 build passes a deterministic 10%
    * salted-hash sample ([[Pipeline.hashSample]] — the oracle
    * re-derives the same sample from the same md5 threshold); None =
    * train on the full corpus (the e13/e47 in-session twins' oracle
    * semantics). */
  def build(emb: DataFrame, dir: String, nlist: Int = 16,
      iters: Int = 2, trainOn: Option[DataFrame] = None): Unit = {
    val (cents, indexed) = trainOn match {
      case None => Similarity.ivfIndexed(emb, nlist, iters)
      case Some(sample) =>
        val (c, _) = Similarity.ivfIndexed(sample, nlist, iters)
        (c, Similarity.ivfAssigned(emb, c))
    }
    indexed
      .select(col("vec_id"), col("cluster"),
        Similarity.sq8Code(col("embedding"), col("nrm"))
          .cast("array<tinyint>").as("code")) // [−127,127] fits exactly
      // ONE shuffle keyed by cluster before the dynamic-partition
      // write: without it every input task writes a file into every
      // cluster directory (tasks × nlist tiny files — the r16 sf10
      // soak measured the file churn at ~2 min for 200k vectors);
      // with it each inverted list lands as one file from one task
      .repartition(col("cluster"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cluster").parquet(s"$dir/codes")
    val spark = emb.sparkSession
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
  }

  /** The stored coarse quantizer, cluster-ordered — nlist×dim doubles,
    * driver-bounded by construction. */
  private def loadCentroids(spark: SparkSession,
      dir: String): Array[Array[Double]] =
    spark.read.parquet(s"$dir/centroids")
      .orderBy("cluster").collect()
      .map(r => r.getSeq[Double](1).toArray)

  /** Append a batch of new vectors to an existing index: code them
    * against the STORED centroids (the quantizer is immutable after
    * build, as in FAISS — retrain = rebuild) and append into their
    * cluster partitions. Only the batch is scanned and written; the
    * existing lists are untouched. */
  def append(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val cents = loadCentroids(spark, dir)
    Similarity.withNorm(batch)
      .select(col("vec_id"),
        Similarity.assignCluster(col("embedding"), cents).as("cluster"),
        Similarity.sq8Code(col("embedding"), col("nrm"))
          .cast("array<tinyint>").as("code"))
      .repartition(col("cluster")) // one appended file per touched list
      .write.mode(SaveMode.Append)
      .partitionBy("cluster").parquet(s"$dir/codes")
  }

  /** Top-k through the stored index: probe `nprobe` lists per query,
    * scan ONLY those partitions' codes, rank by exact integer qdot
    * (ties → vec_id) via the shared [[Similarity.qdotRank]] kernel.
    * `queries` carries (vec_id, embedding). `excludeSelf` (default
    * true) drops the candidate whose vec_id equals the query_id — the
    * right semantics when queries ARE corpus rows; pass false for
    * EXTERNAL query vectors, whose ids are a separate namespace that
    * may coincide with corpus ids (true would silently drop a real
    * neighbor). */
  def query(spark: SparkSession, dir: String, queries: DataFrame, k: Int,
      nprobe: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    val cents = loadCentroids(spark, dir)
    // localCheckpoint: the probed-cluster collect below AND the rank
    // join both consume the coded-query frame — materialize it once
    // instead of running the norm+code+probe scan twice
    val q = Similarity.withNorm(queries)
      .select(col("vec_id").as("query_id"),
        Similarity.sq8Code(col("embedding"), col("nrm")).as("qcode"),
        explode(Similarity.probeClusters(col("embedding"), cents, nprobe))
          .as("cluster"))
      .localCheckpoint()
    // the probed-cluster set is ≤ queries×nprobe ids — collect it so the
    // partition filter is a LITERAL the scan prunes by (the same
    // driver-bounded collect contract as the centroids themselves)
    val probed = q.select("cluster").distinct().collect().map(_.getInt(0))
    val codes = spark.read.parquet(s"$dir/codes")
      .filter(col("cluster").isin(probed.map(Integer.valueOf): _*))
      .withColumn("code", col("code").cast("array<int>")) // tinyint→int
    Similarity.qdotRank(codes, q, k, excludeSelf)
  }
}
