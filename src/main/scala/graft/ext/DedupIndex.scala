package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED MinHash-LSH dedup index — the continuous-ingest form
  * of [[Dedup.incrementalNearDups]] at corpus scale.
  *
  * [[Dedup.bandRows]] is the in-session signature pipeline; this module
  * makes it a durable artifact, the way
  * [[graft.write.BucketedStore]] makes the cell store durable: band
  * rows (band, sig, doc_id, shs) written as a bucketed table hashed on
  * (band, sig) and coordinate-sorted. Checking an arriving shard
  * against a 100 TB accepted corpus then:
  *
  *   - computes signatures for the SHARD only (the corpus signed each
  *     doc once, at accept time),
  *   - joins on (band, sig) with the shard side broadcast — the index
  *     scans but never shuffles — or, for a shard too big to
  *     broadcast, shuffle-joins where ONLY the shard moves (the index
  *     bucketing already satisfies the join distribution, and the
  *     in-bucket sort order satisfies the merge order),
  *   - verifies candidates exactly (shingle Jaccard) straight off the
  *     join output: the index carries each doc's shingle set per band
  *     row, trading ~`bands`x signature-storage for a query with no
  *     second corpus join (the verify data arrives with the candidate).
  *
  * Accepted docs append to the index with the same layout
  * ([[append]]); dedup of the shard against itself stays
  * [[Dedup.minHashNearDups]] on the shard alone.
  */
object DedupIndex {

  /** Build (or replace) the signature index for an accepted corpus.
    * `k`/`bands` must match every later [[query]]/[[append]] — they
    * define the signature layout (both stored per row as guard
    * columns and validated on every read/append). */
  def build(docs: DataFrame, table: String, path: String,
      k: Int = 16, bands: Int = 4, buckets: Int = 16): Unit =
    writeRows(Dedup.bandRows(docs, k, bands)
        .withColumn("k", lit(k)).withColumn("bands", lit(bands)),
      table, path, buckets, SaveMode.Overwrite)

  /** Append a newly-accepted batch to the index (same layout —
    * validated against the stored guard columns first). */
  def append(docs: DataFrame, table: String, path: String,
      k: Int = 16, bands: Int = 4, buckets: Int = 16): Unit = {
    val spark = docs.sparkSession
    if (spark.catalog.tableExists(table))
      checkLayout(spark.table(table), table, k, bands)
    writeRows(Dedup.bandRows(docs, k, bands)
        .withColumn("k", lit(k)).withColumn("bands", lit(bands)),
      table, path, buckets, SaveMode.Append)
  }

  /** Layout guard: a mismatched k or bands would silently change the
    * band-signature width and yield wrong/zero-recall joins, so fail
    * loudly. One-row metadata probe (every row stores the build
    * layout), not a per-row runtime check. */
  private def checkLayout(idx: DataFrame, table: String,
      k: Int, bands: Int): Unit = {
    require(idx.columns.contains("k") && idx.columns.contains("bands"),
      s"$table is not a DedupIndex table (no layout guard columns)")
    idx.select("k", "bands").limit(1).collect().headOption.foreach { r =>
      require(r.getInt(0) == k && r.getInt(1) == bands,
        s"DedupIndex $table was built with k=${r.getInt(0)}, " +
          s"bands=${r.getInt(1)}; used with k=$k, bands=$bands")
    }
  }

  private def writeRows(rows: DataFrame, table: String, path: String,
      buckets: Int, mode: SaveMode): Unit =
    rows
      // ONE shuffle on the exact bucket key (repartition's Murmur3 IS
      // the bucketing hash): each task then owns exactly one bucket —
      // one file per bucket and one contiguous sort per bucket. The
      // unpartitioned form had every task writing every bucket
      // (tasks × buckets files) and task-local sorts of the WIDE
      // shingle-array rows spilling — the r16 sf10 soak measured the
      // per-unit build cost RISING 66% from 50k to 500k docs on that
      // shape; with the repartition it falls instead (see PLANS).
      .repartition(buckets, col("band"), col("sig"))
      .write
      .mode(mode)
      .option("path", path)
      .bucketBy(buckets, "band", "sig")
      .sortBy("band", "sig", "doc_id")
      .format("parquet")
      .saveAsTable(table)

  /** Near-dup matches of `newDocs` against the indexed corpus:
    * (i = new doc, j = corpus doc, jaccard >= threshold). `k`/`bands`
    * must equal the build parameters (checked against the stored
    * layout). `broadcastBatch = false` selects the big-shard path:
    * a shuffle join in which the index side still plans exchange-free
    * off its bucketing. */
  def query(spark: SparkSession, table: String, newDocs: DataFrame,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.8,
      broadcastBatch: Boolean = true, maxBucket: Int = 0): DataFrame = {
    val idx = spark.table(table)
    checkLayout(idx, table, k, bands)
    val nw0 = Dedup.bandRows(newDocs, k, bands)
      .select(col("band"), col("sig"), col("doc_id").as("i"), col("shs").as("shi"))
    val nw = if (broadcastBatch) broadcast(nw0) else nw0
    // maxBucket is the hot-bucket cap on the INDEX side (the
    // capTextBuckets opt-in): a boilerplate-heavy corpus bucket of n
    // rows times a batch doc sharing its signature yields n candidates
    // each dragging the stored shingle arrays — capped, those clusters
    // drop whole. Costs one extra count-only census scan of the index
    // per query; the census groups on the bucketing key, so it rides
    // the stored layout exchange-free. `<= 0` = uncapped.
    val cp = Dedup.capTextBuckets(idx
      .select(col("band"), col("sig"), col("doc_id").as("j"), col("shs").as("shj")),
      maxBucket)
    val (_, jac) = Dedup.arrayJaccard(col("shi"), col("shj"))
    nw.join(cp, Seq("band", "sig"))
      .select(col("i"), col("j"), jac.as("jac0"))
      .filter(col("jac0") >= threshold)
      .groupBy("i", "j").agg(round(min(col("jac0")), 4).as("jaccard"))
  }

  /** STREAMING near-dup matches of an arriving document stream against
    * the indexed corpus — the continuous-ingest pipeline proper:
    * `docsStream` (a streaming DataFrame with doc_id, text) signs each
    * micro-batch map-side, stream-static joins the signature index on
    * (band, sig), and exact-verifies — all STATELESS (append mode), so
    * a perpetual stream runs with zero state store growth regardless
    * of corpus or stream size.
    *
    * Emits (i, j, jaccard) with at most `bands` rows per matched pair
    * (one per agreeing band); the pair-dedup `groupBy(i, j)` is
    * deliberately NOT part of the stream — as an unwindowed stateful
    * aggregation it would retain every pair ever seen. Dedup at the
    * consumer: batch post-step, or `dropDuplicatesWithinWatermark`
    * when arrivals carry event time. */
  /** The per-micro-batch body of [[ingestStream]], exposed so the
    * replay contract is directly testable: (0) the optional quality
    * `gate` (any batch composition — e.g. a left-semi join on the
    * Gopher-rules keep verdict; rejected docs never touch the index
    * or corpus), then (1) intra-batch dedup —
    * within-batch near-dup groups keep their lowest id — then (2) the
    * persisted-index check. Identity matches (the doc_id itself is
    * already indexed) reject the doc like any duplicate — corpus ids
    * stay unique even when a source re-delivers a doc in a later
    * epoch — EXCEPT ids this very epoch already accepted, which is
    * the crash-replay case (rejecting those would wipe the epoch
    * directory). Survivors are ACCEPTED — written to the corpus (one
    * overwrite-mode directory per epoch → replay-idempotent) and
    * appended to the signature index. Index appends are at-least-once
    * on replay — duplicate signature rows are harmless (candidate
    * pairs dedup at query time), while corpus contents stay
    * exactly-once. */
  def ingestBatch(batch: DataFrame, epoch: Long, table: String,
      idxPath: String, corpusPath: String, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.8, buckets: Int = 16,
      gate: DataFrame => DataFrame = identity): Unit = {
    val spark = batch.sparkSession
    // quality gate FIRST (production order: the cheap verdict runs
    // before any signing/joining, and a rejected doc never touches the
    // index or the corpus) — `gate` sees the micro-batch as a plain
    // DataFrame, so any batch composition works (e.g. filter on
    // TextAnalysis.gopherRules' keep verdict)
    val b = gate(batch).localCheckpoint() // cut the source lineage: the
    // batch is re-read below by 3 consumers (intra pairs, index
    // query, accepted write) — without it each re-plans the source
    val intraDup = Dedup.minHashNearDups(b, k, bands, threshold)
      .select(col("j").as("doc_id")).distinct()
    val matches = query(spark, table, b, k, bands, threshold)
    // content near-dups of OTHER docs always reject
    val contentDup = matches.filter(col("i") =!= col("j"))
      .select(col("i").as("doc_id")).distinct()
    // identity matches (i == j: this doc_id is already indexed) reject
    // too — EXCEPT those this very epoch already accepted, which is
    // the crash-replay case: rejecting them would empty `accepted` and
    // overwrite the epoch directory with nothing. A same-id
    // re-delivery in a LATER epoch has no such epoch record and is
    // rejected, keeping corpus doc_ids unique.
    val epochDir = s"$corpusPath/batch=$epoch"
    val hconf = spark.sparkContext.hadoopConfiguration
    val ep = new org.apache.hadoop.fs.Path(epochDir)
    val replayed =
      if (ep.getFileSystem(hconf).exists(ep))
        spark.read.parquet(epochDir).select(col("doc_id"))
      else spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
    val identityDup = matches.filter(col("i") === col("j"))
      .select(col("i").as("doc_id")).distinct()
      .join(replayed, Seq("doc_id"), "left_anti")
    val accepted = b
      .join(intraDup, Seq("doc_id"), "left_anti")
      .join(contentDup, Seq("doc_id"), "left_anti")
      .join(identityDup, Seq("doc_id"), "left_anti")
      .localCheckpoint() // accepted feeds TWO writes; and the index
    // append below must not re-derive it THROUGH the index table it
    // is itself appending to
    accepted.write.mode(SaveMode.Overwrite)
      .parquet(s"$corpusPath/batch=$epoch")
    append(accepted, table, idxPath, k, bands, buckets)
  }

  /** The COMPLETE continuous-ingest loop as one streaming query —
    * [[ingestBatch]] behind foreachBatch, the sink-transaction
    * boundary (the reference's per-batch ReplicationSink apply).
    * Returns the CONFIGURED writer — add a trigger and `.start()` to
    * run it (AvailableNow for a bounded run, processing-time for a
    * perpetual one), as DedupIndexSpec does. */
  def ingestStream(docsStream: DataFrame, table: String, idxPath: String,
      corpusPath: String, checkpoint: String, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.8, buckets: Int = 16,
      gate: DataFrame => DataFrame = identity)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        ingestBatch(batch, epoch, table, idxPath, corpusPath, k, bands,
          threshold, buckets, gate)
      }

  def streamQuery(spark: SparkSession, table: String, docsStream: DataFrame,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.8): DataFrame = {
    val idx = spark.table(table)
    checkLayout(idx, table, k, bands)
    val nw = Dedup.bandRows(docsStream, k, bands)
      .select(col("band"), col("sig"), col("doc_id").as("i"), col("shs").as("shi"))
    val cp = idx
      .select(col("band"), col("sig"), col("doc_id").as("j"), col("shs").as("shj"))
    val (_, jac) = Dedup.arrayJaccard(col("shi"), col("shj"))
    nw.join(cp, Seq("band", "sig"))
      // threshold on the UNROUNDED jaccard (rounding is presentation
      // only) — same contract as every batch dedup path
      .select(col("i"), col("j"), jac.as("jac0"))
      .filter(col("jac0") >= threshold)
      .select(col("i"), col("j"), round(col("jac0"), 4).as("jaccard"))
  }
}
