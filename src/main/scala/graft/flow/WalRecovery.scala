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
    val bconf = ShippedConf.broadcast(spark)
    val outRoot = recoveredDir
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
          // stream the region's edits through one PB writer; the file
          // takes the FIRST seq's name once known (write to temp, then
          // rename — WALSplitter's own .temp protocol)
          val fs = new Path(outRoot).getFileSystem(bconf.value.conf)
          val dir = new Path(s"$outRoot/$region/recovered.edits")
          fs.mkdirs(dir)
          val tmp = new Path(dir,
            s".temp-${TaskContext.getPartitionId()}-$region")
          val out = fs.create(tmp, true)
          try PWal.write(out, entriesIt) finally out.close()
          require(firstSeq >= 0, s"empty recovered-edits group for $region")
          // idempotent commit: a task retry (or speculative duplicate)
          // after a successful rename finds the destination already
          // present — every attempt writes the SAME deterministic
          // content for the region, so replace-and-rename (WALSplitter
          // tolerates pre-existing recovered-edits files the same way)
          // instead of wedging the whole recovery job on a false rename
          val dst = new Path(dir, f"$firstSeq%019d.pwal")
          if (fs.exists(dst)) fs.delete(dst, false)
          if (!fs.rename(tmp, dst)) {
            require(fs.exists(dst),
              s"could not commit recovered edits for $region")
            fs.delete(tmp, false) // a concurrent attempt won the commit
          }
        }
      }
  }

  /** Region-open replay: read every recovered-edits file of `region`,
    * DROP edits with wal_seq <= `flushedMaxSeqId` (already durable in
    * the store), return the surviving cells in the canonical cell
    * schema plus their sequence ids. */
  def replayRecoveredEdits(spark: SparkSession, recoveredDir: String,
      region: String, flushedMaxSeqId: Long): DataFrame =
    PWalFiles.importEntries(spark, s"$recoveredDir/$region/recovered.edits",
        glob = "*.pwal")
      .filter(col("wal_seq") > flushedMaxSeqId)
      .select(col("wal_seq"), col("row"), col("family"), col("qualifier"),
        col("ts"), col("type"), col("value"))
}
