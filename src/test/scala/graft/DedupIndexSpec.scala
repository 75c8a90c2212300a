package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, DedupIndex}

/** Persisted MinHash signature index: build/append/query must agree
  * with the in-session incremental near-dup, and the query plan must
  * leave the index side unshuffled (that IS the 100 TB contract).
  */
class DedupIndexSpec extends SparkSpec {

  lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  private def batch = {
    import spark.implicits._
    val near = docs.filter(col("doc_id") === 1)
      .withColumn("doc_id", lit(100001L))
      .withColumn("text", concat(col("text"), lit(" xyzzy plugh")))
      .select("doc_id", "text")
    val twin = docs.filter(col("doc_id") === 2).select("text").head().getString(0)
    near.unionByName(Seq((100002L, twin)).toDF("doc_id", "text"))
  }

  test("indexed query equals the in-session incremental near-dup") {
    val tmp = java.nio.file.Files.createTempDirectory("dix").toString
    DedupIndex.build(docs.select("doc_id", "text"), "dix_a", s"$tmp/a", buckets = 4)
    val viaIndex = DedupIndex.query(spark, "dix_a", batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inSession = Dedup.incrementalNearDups(
        docs.select("doc_id", "text").unionByName(batch), col("doc_id") >= 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex === inSession)
    assert(viaIndex.exists { case (i, j, _) => i == 100001L && j == 1L })
    assert(viaIndex.exists { case (i, j, _) => i == 100002L && j == 2L })
    // normal-corpus parity for the index-side hot-bucket cap opt-in
    val capped = DedupIndex.query(spark, "dix_a", batch, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped === viaIndex)
  }

  test("append extends the corpus; accepted docs then match later arrivals") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dix").toString
    DedupIndex.build(docs.select("doc_id", "text"), "dix_b", s"$tmp/b", buckets = 4)
    // accept the batch -> its docs join the corpus index
    DedupIndex.append(batch, "dix_b", s"$tmp/b", buckets = 4)
    // a later arrival matching an APPENDED doc must now hit
    val twin = docs.filter(col("doc_id") === 2).select("text").head().getString(0)
    val later = Seq((200001L, twin)).toDF("doc_id", "text")
    val hits = DedupIndex.query(spark, "dix_b", later)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((200001L, 2L)))
    assert(hits.contains((200001L, 100002L)), "appended twin must be indexed")
  }

  test("query never shuffles the index side; k mismatch fails loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("dix").toString
    DedupIndex.build(docs.select("doc_id", "text"), "dix_c", s"$tmp/c", buckets = 4)

    // broadcast path: index side streams through a broadcast join
    val bq = DedupIndex.query(spark, "dix_c", batch)
    bq.count()
    val bplan = bq.queryExecution.executedPlan.toString
    assert(bplan.contains("BroadcastHashJoin"), bplan)

    // big-shard path: shuffle join, but the bucketed index side still
    // plans without an exchange (only the batch side moves)
    // simulate a shard too big to broadcast: disable auto-broadcast so
    // the planner must fall back to the bucketing-based shuffle join
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val splan = try {
      val sq = DedupIndex.query(spark, "dix_c", batch, broadcastBatch = false)
      sq.count()
      sq.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert(splan.contains("dix_c"), splan)
    assert(splan.contains("SortMergeJoin") || splan.contains("ShuffledHashJoin"), splan)
    // exactly two hash exchanges may exist: the batch side moving to
    // the index's (band, sig) bucketing, and the final (i, j) pair
    // dedup. A third would mean the index side re-shuffled.
    val exchanges = splan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"index side must not re-shuffle ($exchanges exchanges):\n$splan")

    intercept[IllegalArgumentException] {
      DedupIndex.query(spark, "dix_c", batch, k = 32, bands = 4)
    }
  }

  test("streaming query matches the batch query and stays stateless") {
    val tmp = java.nio.file.Files.createTempDirectory("dix").toString
    DedupIndex.build(docs.select("doc_id", "text"), "dix_s", s"$tmp/s", buckets = 4)
    // arriving shard as a file stream
    batch.write.parquet(s"$tmp/arrivals")
    val stream = spark.readStream
      .schema(batch.schema).parquet(s"$tmp/arrivals")
    val matches = DedupIndex.streamQuery(spark, "dix_s", stream)
    assert(matches.isStreaming)
    val out = graft.stream.WalStream.runAvailableNow(matches, "dix_stream_q",
      mode = "append")
    // consumer-side pair dedup (at most `bands` rows per pair arrive)
    val streamed = out.groupBy("i", "j").agg(min(col("jaccard")).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaBatch = DedupIndex.query(spark, "dix_s", batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === viaBatch)
    assert(streamed.exists { case (i, j, _) => i == 100001L && j == 1L })
  }

  test("ingestStream: the full continuous-ingest loop across micro-batches") {
    import spark.implicits._
    // fully synthetic texts: every token is id-suffixed, so distinct
    // docs share ZERO shingles and copies share ALL of them
    def doc(id: Long, of: Long = -1): (Long, String) = {
      val base = if (of >= 0) of else id
      (id, (1 to 10).map(w => s"w${w}tok$base").mkString(" "))
    }
    val tmp = java.nio.file.Files.createTempDirectory("ingest").toString
    val arrivals = s"$tmp/arrivals"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(arrivals))
    def land(rows: Seq[(Long, String)], name: String, mtime: Long): Unit = {
      val stage = s"$tmp/stage_$name"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$arrivals/$name.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      assert(dest.setLastModified(mtime)) // file-source batch order
    }

    // accepted corpus so far: docs 0-9
    DedupIndex.build((0L to 9L).map(doc(_)).toDF("doc_id", "text"),
      "ingest_idx", s"$tmp/idx", buckets = 4)
    // batch A: fresh 10-19, index-dups (copies of seed 0-4), one
    // intra-batch dup (2000 copies 10 — both absent from the index)
    land((10L to 19L).map(doc(_)) ++ (0L to 4L).map(i => doc(1000 + i, i))
      :+ doc(2000, 10), "a", 1000000L)
    // batch B: fresh 30-39, a copy of A-ACCEPTED 15 (must be rejected
    // because A's acceptance appended to the index), a copy of seed 7
    land((30L to 39L).map(doc(_)) :+ doc(3000, 15) :+ doc(3001, 7),
      "b", 2000000L)

    val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(arrivals)
    val q = DedupIndex.ingestStream(stream, "ingest_idx", s"$tmp/idx",
        s"$tmp/corpus", s"$tmp/ck", buckets = 4)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()

    val corpus = spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(corpus === ((10L to 19L) ++ (30L to 39L)).toSet,
      s"accepted set wrong: $corpus")
    // the index now answers for everything accepted so far
    val probe = Seq(doc(9000, 35), doc(9001, 12), doc(9002, 999))
      .toDF("doc_id", "text")
    val hits = DedupIndex.query(spark, "ingest_idx", probe)
      .select("i").distinct().as[Long].collect().toSet
    assert(hits === Set(9000L, 9001L))
    spark.sql("DROP TABLE IF EXISTS ingest_idx")
  }

  test("ingestBatch quality gate rejects before dedup: gated docs never reach index or corpus") {
    import spark.implicits._
    def doc(id: Long): (Long, String) =
      (id, (1 to 10).map(w => s"w${w}tok$id").mkString(" "))
    val tmp = java.nio.file.Files.createTempDirectory("gated").toString
    DedupIndex.build(Seq(doc(0)).toDF("doc_id", "text"),
      "gated_idx", s"$tmp/idx", buckets = 4)
    // the gate: the Gopher top-word repetition rule as a left-semi
    // join (an arbitrary batch composition, not just a predicate)
    val gate = (b: org.apache.spark.sql.DataFrame) => {
      val keep = graft.ext.TextAnalysis.repetitionSignals(b)
        .filter(col("top_word_n") * 5 <= col("n_tokens"))
        .select("doc_id")
      b.join(keep, Seq("doc_id"), "left_semi")
    }
    // 50: clean; 51: degenerate repetition (one token 10×) — gated out
    val batch = Seq(doc(50), (51L, ("spam " * 10).trim)).toDF("doc_id", "text")
    DedupIndex.ingestBatch(batch, 0L, "gated_idx", s"$tmp/idx",
      s"$tmp/corpus", buckets = 4, gate = gate)
    val corpus = spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(corpus === Set(50L), s"only the clean doc lands: $corpus")
    // the gated doc is absent from the INDEX too: a later identical
    // arrival is not flagged as a duplicate of it
    val probe = Seq((9000L, ("spam " * 10).trim)).toDF("doc_id", "text")
    assert(DedupIndex.query(spark, "gated_idx", probe).count() === 0)
    spark.sql("DROP TABLE IF EXISTS gated_idx")
  }

  test("ingestBatch replay after a post-append crash keeps the epoch intact") {
    import spark.implicits._
    def doc(id: Long) = (id, (1 to 10).map(w => s"w${w}rep$id").mkString(" "))
    val tmp = java.nio.file.Files.createTempDirectory("replay").toString
    DedupIndex.build((0L to 4L).map(doc).toDF("doc_id", "text"),
      "replay_idx", s"$tmp/idx", buckets = 4)
    val batch = (10L to 14L).map(doc).toDF("doc_id", "text")

    // first processing: all 5 accepted, corpus epoch written, index appended
    DedupIndex.ingestBatch(batch, 0L, "replay_idx", s"$tmp/idx",
      s"$tmp/corpus", buckets = 4)
    val first = spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(first === (10L to 14L).toSet)

    // crash-replay: the SAME batch re-runs with its docs already in the
    // index — self-matches must not empty `accepted` and wipe the epoch
    DedupIndex.ingestBatch(batch, 0L, "replay_idx", s"$tmp/idx",
      s"$tmp/corpus", buckets = 4)
    val replayed = spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(replayed === first, "replay must leave the epoch's corpus intact")

    // a LATER-epoch re-delivery of an already-accepted doc_id is NOT a
    // replay: it must be rejected, keeping corpus doc_ids unique
    DedupIndex.ingestBatch(
      (batch.limit(2)).unionByName(Seq(doc(20L)).toDF("doc_id", "text")),
      1L, "replay_idx", s"$tmp/idx", s"$tmp/corpus", buckets = 4)
    val after = spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toList.sorted
    assert(after === ((10L to 14L) :+ 20L).toList.sorted,
      s"re-delivered ids must not duplicate: $after")
    spark.sql("DROP TABLE IF EXISTS replay_idx")
  }
}
