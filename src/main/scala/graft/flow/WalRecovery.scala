package graft.flow

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.{HFileV3, PWal}

/** WAL splitting and crash recovery — WALSplitter.java (wal/
  * WALSplitter.splitLogFile / OutputSink) and the region-open replay
  * (HRegion.replayRecoveredEditsIfAny):
  *
  *  - [[splitWal]]: a dead regionserver's WAL segments are SPLIT into
  *    one recovered-edits file per region — edits grouped by region,
  *    sequence order preserved, landed under
  *    `recoveredDir/<region>/recovered.edits/<first-seq padded 19>.pwal`
  *    in the real PB wire format (WALSplitter names the file after
  *    the first contained sequence id). At 100 TB the split is one
  *    shuffle keyed by region — each writer task owns a region's
  *    edits, the reference's OutputSink-per-region shape.
  *  - [[replayRecoveredEdits]]: at region open, recovered edits with
  *    sequence id AT OR BELOW the store's flushed max sequence id are
  *    SKIPPED (already durable in store files —
  *    HRegion.replayRecoveredEditsIfAny's maxSeqIdInStores filter);
  *    the remainder re-applies. The invariant the oracle checks: no
  *    edit lost, none double-applied.
  */
object WalRecovery {

  /** Split WALKey-denormalized entries (the [[PWalFiles.importEntries]]
    * frame: wal_region/wal_table/wal_seq/write_time + cell columns)
    * into per-region recovered-edits PB files. One shuffle keyed by
    * region; each partition streams its regions' edits in seq order. */
  def splitWal(spark: SparkSession, entries: DataFrame,
      recoveredDir: String): Unit = {
    // the stale-temp sweep the in-task reclaim defers to: reap temps
    // left by CRASHED prior runs (foreign pid/partitioning) before
    // this recovery writes its own. The sweep lives on the RECOVERY
    // path only — crash leftovers can only exist after a crash, and a
    // recursive root listing per hot-path batch (dualWrite runs
    // writeRegionLogs per micro-batch) would be unbounded metadata
    // latency hunting for files that are not there.
    reapStaleTemps(spark.sparkContext.hadoopConfiguration, recoveredDir)
    writeRegionLogs(spark, entries, Seq(recoveredDir),
      region => s"$region/recovered.edits")
  }

  /** The shared per-region PB log writer — WALSplitter's
    * OutputSink-per-region shape, also the DualAsyncFSWAL dual-write
    * (SyncReplication): ONE shuffle keyed by region; each region's
    * entries stream through ONE PWal encode whose bytes tee to one
    * stream per `roots` entry; files land as
    * `<root>/<subdir(region)>/<first-seq padded 19>.pwal`.
    *
    * Commit protocol: each task ATTEMPT writes its own temp (partition
    * id + task attempt id in the name, so a speculative duplicate can
    * never interleave with a live attempt's stream), then an ATOMIC
    * overwrite-rename lands it — every attempt produces identical
    * bytes for the region, so whichever attempt commits last leaves
    * the same file, and a reader never observes a missing or torn log
    * (the delete-then-rename idiom this replaces had a no-file crash
    * window on re-runs). */
  private[graft] def writeRegionLogs(spark: SparkSession,
      entries: DataFrame, roots: Seq[String],
      subdir: String => String): Unit = {
    require(roots.nonEmpty, "need at least one output root")
    val bconf = ShippedConf.broadcast(spark)
    entries
      .repartition(col("wal_region"))
      .sortWithinPartitions(col("wal_region"), col("wal_seq"),
        col("row"), col("family"), col("qualifier"), col("type"))
      .select("wal_region", "wal_table", "wal_seq", "write_time",
        "row", "family", "qualifier", "ts", "type", "value")
      .foreachPartition { (it: Iterator[Row]) =>
        // a hash partition may hold several regions: cut on region
        // change (the sort guarantees contiguity)
        val rows = it.buffered
        while (rows.hasNext) {
          val region = rows.head.getString(0)
          var firstSeq = -1L
          val entriesIt = new Iterator[PWal.WalEntry] {
            private var pending: Row =
              if (rows.hasNext && rows.head.getString(0) == region)
                rows.next()
              else null
            def hasNext: Boolean = pending != null
            def next(): PWal.WalEntry = {
              val seq = pending.getLong(2)
              if (firstSeq < 0) firstSeq = seq
              val table = pending.getString(1)
              val wt = pending.getLong(3)
              val cells = scala.collection.mutable.ArrayBuffer.empty[HFileV3.HCell]
              while (pending != null && pending.getLong(2) == seq) {
                cells += HFileV3.HCell(
                  pending.getString(4).getBytes("UTF-8"),
                  pending.getString(5).getBytes("UTF-8"),
                  pending.getString(6).getBytes("UTF-8"),
                  pending.getLong(7),
                  HFiles.typeToCode(pending.getString(8)),
                  Option(pending.getString(9)).getOrElse("").getBytes("UTF-8"))
                pending =
                  if (rows.hasNext && rows.head.getString(0) == region)
                    rows.next()
                  else null
              }
              PWal.WalEntry(region.getBytes("UTF-8"), table.getBytes("UTF-8"),
                seq, wt, cells.toIndexedSeq)
            }
          }
          val conf = bconf.value.conf
          val pid = TaskContext.getPartitionId()
          val attempt = Option(TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val dirs = roots.map(r => new Path(s"$r/${subdir(region)}"))
          val fss = dirs.map(_.getFileSystem(conf))
          fss.lazyZip(dirs).foreach((fs, d) => fs.mkdirs(d))
          val tmps = dirs.map(d =>
            new Path(d, s".temp-$pid-$attempt-$region"))
          // open + write + close under one finally: a later root's
          // create failing (the remote FS down — the very scenario
          // dual-write exists for) must still close the streams the
          // earlier roots already opened
          val outs = scala.collection.mutable.ArrayBuffer
            .empty[org.apache.hadoop.fs.FSDataOutputStream]
          try {
            fss.lazyZip(tmps).foreach((fs, t) => outs += fs.create(t, true))
            // DualAsyncFSWAL when roots > 1: ONE encode, bytes fan out
            val sink: java.io.OutputStream =
              if (outs.size == 1) outs.head
              else new java.io.OutputStream {
                def write(b: Int): Unit = outs.foreach(_.write(b))
                override def write(b: Array[Byte], off: Int,
                    len: Int): Unit = outs.foreach(_.write(b, off, len))
              }
            val buffered = new java.io.BufferedOutputStream(sink)
            PWal.write(buffered, entriesIt); buffered.flush()
          } finally {
            // close every leg even when one close() throws (a failing
            // remote FS must not leak the local stream); rethrow the
            // first failure after all are closed
            var firstClose: Throwable = null
            outs.foreach { o =>
              try o.close()
              catch { case t: Throwable =>
                if (firstClose == null) firstClose = t }
            }
            if (firstClose != null) throw firstClose
          }
          require(firstSeq >= 0, s"empty WAL group for $region")
          // commit in REVERSE roots order: callers list the primary
          // first, so the LAST root (dualWrite's remote leg) commits
          // FIRST — a crash between renames may leave the remote ahead
          // of the local log, never behind it (DualAsyncFSWAL acks
          // only after both; failover replays from the remote, which
          // must not miss entries a local reader could observe)
          dirs.lazyZip(tmps).toSeq.reverse.foreach { case (d, t) =>
            FsAtomic.renameOverwrite(conf, t,
              new Path(d, f"$firstSeq%019d.pwal"), s"WAL log for $region")
          }
          // reclaim temps of PRIOR failed attempts only — temps whose
          // attempt id differs from ours AND whose attempt id is below
          // ours (a HIGHER id is a still-running speculative duplicate
          // actively writing; deleting its temp mid-write would turn
          // its clean late-commit failure into a confusing missing-file
          // crash — leave it to reap itself or to [[reapStaleTemps]],
          // the age-gated sweep the recovery path opens with)
          fss.lazyZip(dirs).foreach { (fs, d) =>
            Option(fs.globStatus(new Path(d, s".temp-$pid-*-$region")))
              .getOrElse(Array.empty)
              .map(_.getPath)
              .filter { p =>
                val name = p.getName
                // .temp-<pid>-<attempt>-<region>
                val rest = name.stripPrefix(s".temp-$pid-")
                val att = rest.takeWhile(_ != '-')
                att.nonEmpty && att.forall(_.isDigit) &&
                  att.toLong < attempt
              }
              .foreach(p => fs.delete(p, false))
          }
        }
      }
  }

  /** Region-open replay: read every recovered-edits file of `region`,
    * DROP edits with wal_seq <= `flushedMaxSeqId` (already durable in
    * the store), return the surviving cells in the canonical cell
    * schema plus their sequence ids. */
  /** Reap stale `.temp-*` attempt files under `root` — temps left by a
    * CRASHED run whose pid/partitioning no longer matches any live
    * writer (the in-task reclaim in [[writeRegionLogs]] only covers
    * same-pid lower-attempt temps of the current run). Age-gated: only
    * temps older than `olderThanMs` (default 30 min) go — a live
    * speculative attempt's temp is seconds old, and deleting it
    * mid-write would turn its clean late-commit failure into a
    * missing-file crash. CAVEAT: on filesystems that stamp mtime at
    * create and only refresh it on close (HDFS), a straggler streaming
    * one temp for longer than the threshold looks stale — size the
    * threshold above the worst credible task runtime, or run the sweep
    * only when no writer can be live. That is why the sweep runs on
    * the RECOVERY path ([[splitWal]]) rather than before every
    * region-log write: recovery follows a crash, when the leftover
    * temps are by definition ownerless. Readers glob `*.pwal`, so the
    * leak this closes is disk-only. Returns the deleted paths,
    * sorted. */
  def reapStaleTemps(conf: org.apache.hadoop.conf.Configuration,
      root: String, olderThanMs: Long = 30 * 60 * 1000L): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Nil
    val cut = System.currentTimeMillis() - olderThanMs
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.startsWith(".temp-") &&
          st.getModificationTime < cut) {
        fs.delete(st.getPath, false)
        out += st.getPath.toString
      }
    }
    out.toSeq.sorted
  }

  def replayRecoveredEdits(spark: SparkSession, recoveredDir: String,
      region: String, flushedMaxSeqId: Long): DataFrame =
    PWalFiles.importEntries(spark, s"$recoveredDir/$region/recovered.edits",
        glob = "*.pwal")
      .filter(col("wal_seq") > flushedMaxSeqId)
      .select(col("wal_seq"), col("row"), col("family"), col("qualifier"),
        col("ts"), col("type"), col("value"))
}
