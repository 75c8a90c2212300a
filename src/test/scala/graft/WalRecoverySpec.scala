package graft

import org.apache.spark.sql.functions._

import graft.flow.WalRecovery
import graft.model.Fixtures

/** WAL splitting + replay (WALSplitter.java, HRegion
  * .replayRecoveredEditsIfAny) beyond the q116 gate: the
  * several-regions-per-partition cut, file naming by first sequence
  * id, and the replay watermark edge cases. */
class WalRecoverySpec extends SparkSpec {

  test("split: 40 regions over 32 shuffle partitions, replay watermarks") {
    val tmp = java.nio.file.Files.createTempDirectory("walrec").toString
    val cells = Fixtures.cellsEventsV(spark, sf0001).limit(2000)
      .withColumn("value", coalesce(col("value"), lit("")))
    val uid = col("row").cast("long")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("wal_region"))
      .orderBy(col("ts"), col("row"))
    // 40 regions force at least one hash partition to carry several
    // regions — the contiguity-cut path
    val entries = cells
      .withColumn("wal_region",
        concat(lit("r"), lpad((uid % 40).cast("string"), 2, "0")))
      .withColumn("wal_table", lit("events"))
      .withColumn("wal_seq", dense_rank().over(w).cast("long"))
      .withColumn("write_time", col("ts"))
    WalRecovery.splitWal(spark, entries, tmp)

    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val regions = entries.select("wal_region").distinct()
      .collect().map(_.getString(0)).sorted
    assert(regions.nonEmpty)
    regions.foreach { r =>
      val dir = new org.apache.hadoop.fs.Path(s"$tmp/$r/recovered.edits")
      val files = fs.listStatus(dir).map(_.getPath.getName)
        .filterNot(_.startsWith("."))
      // one committed file, named by the region's FIRST seq (1, padded)
      assert(files.toSeq == Seq(f"${1L}%019d.pwal"), s"$r -> ${files.toSeq}")
    }

    // watermark 0 replays everything; the max seq replays nothing
    val total = entries.count()
    val all = regions.map(r =>
      WalRecovery.replayRecoveredEdits(spark, tmp, r, 0L).count()).sum
    assert(all == total)
    val none = regions.take(3).map { r =>
      val m = entries.filter(col("wal_region") === r)
        .agg(max("wal_seq")).head.getLong(0)
      WalRecovery.replayRecoveredEdits(spark, tmp, r, m).count()
    }.sum
    assert(none == 0L)
    // an in-between watermark keeps exactly the above-watermark edits
    val r0 = regions.head
    val kept = WalRecovery.replayRecoveredEdits(spark, tmp, r0, 2L)
    val expect = entries.filter(col("wal_region") === r0 && col("wal_seq") > 2)
    assert(kept.count() == expect.count())
    assert(kept.agg(min("wal_seq")).head.getLong(0) > 2L)
  }

  test("stale cross-pid temps reap age-gated; fresh and committed files survive") {
    // the r16 advisor finding: temps from a CRASHED run with a
    // different partitioning were never reclaimed (the in-task sweep
    // is same-pid only). reapStaleTemps: old `.temp-*` go, young ones
    // (a live speculative attempt) and real `.pwal` files stay.
    val conf = spark.sparkContext.hadoopConfiguration
    val root = java.nio.file.Files.createTempDirectory("walreap").toString
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    def mk(path: String, ageMs: Long): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(s"$root/$path")
      fs.mkdirs(p.getParent)
      val o = fs.create(p, true); o.write(1); o.close()
      fs.setTimes(p, System.currentTimeMillis() - ageMs, -1)
      p
    }
    val stale = mk("rA/recovered.edits/.temp-99-1-rA", 60 * 60 * 1000L)
    val young = mk("rA/recovered.edits/.temp-3-2-rA", 10 * 1000L)
    val commit = mk("rA/recovered.edits/0000000000000000001.pwal",
      60 * 60 * 1000L)
    val reaped = WalRecovery.reapStaleTemps(conf, root)
    assert(reaped == Seq(fs.makeQualified(stale).toString),
      s"exactly the stale temp must go: $reaped")
    assert(!fs.exists(stale) && fs.exists(young) && fs.exists(commit))
    // and a writeRegionLogs run performs the sweep itself: the stale
    // temp a crashed run left disappears after a fresh split lands
    val stale2 = mk("r00/recovered.edits/.temp-77-5-r00", 60 * 60 * 1000L)
    val cells = Fixtures.cellsEventsV(spark, sf0001).limit(50)
      .withColumn("value", coalesce(col("value"), lit("")))
      .withColumn("wal_region", lit("r00"))
      .withColumn("wal_table", lit("events"))
      .withColumn("wal_seq", col("ts").cast("long"))
      .withColumn("write_time", col("ts"))
    WalRecovery.splitWal(spark, cells, root)
    assert(!fs.exists(stale2), "splitWal must open with the sweep")
  }
}
