package graft.stream

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** WAL event tracker — the `REPLICATION.WALEVENTTRACKER` surface
  * (hbase-server/.../regionserver/wal/WALEventTrackerListener.java:40-76,
  * namequeues/WALEventTrackerPayload.java,
  * WALEventTrackerTableAccessor.java:34-140,
  * master/waleventtracker/WALEventTrackerTableCreator.java): every WAL
  * roll records the old log's lifecycle (ROLLING as the roll begins,
  * ROLLED with the final file length once it lands) and the new log's
  * birth (ACTIVE), into a durable system table an operator queries to
  * audit which logs existed, when they rotated, and how big they got —
  * the forensic companion to replication lag and WAL retention.
  *
  * Twinned semantics:
  *   - event rows carry exactly the accessor's columns
  *     (region_server_name, wal_name, timestamp, wal_state,
  *     wal_length) with the reference's row key
  *     `walName_timestamp_state` (getRowKey: WAL name leads so an RS
  *     prefix filter works — WAL names begin with the server name);
  *   - one graft segment roll = the reference's preLogRoll+postLogRoll
  *     pair: ROLLING(old, 0), ROLLED(old, length), ACTIVE(new, 0);
  *   - later writes with the same row key overwrite (the reference's
  *     Put versioning) — reads resolve newest-first per key.
  *
  * Graft's WAL segments are rolled-file-sized batch artifacts
  * ([[graft.flow.PWalFiles]]), so the listener's live callback becomes
  * a derivation over the landed segment list, and the accessor's
  * retrying chore flush becomes one idempotent append — the same
  * batch-shaping as the M8/BufferedMutator boundary (SURVEY §2.10).
  * Timestamps are caller-supplied (fixture- or clock-derived), never
  * sampled inside the derivation, so the event log replays.
  */
object WalEventTracker {

  /** WALEventTrackerTableAccessor column names, verbatim. */
  final case class WalEvent(region_server_name: String, wal_name: String,
      timestamp: Long, wal_state: String, wal_length: Long) {
    /** getRowKey: walName + "_" + timestamp + "_" + state. */
    def rowKey: String = s"${wal_name}_${timestamp}_$wal_state"
  }

  /** The listener twin over an ORDERED rolled-segment list
    * (name, finalLength): segment 0 is born ACTIVE; each subsequent
    * segment's arrival is a roll — ROLLING(prev, 0), ROLLED(prev,
    * length), ACTIVE(next, 0). `ts(i, state)` supplies each event's
    * timestamp (events of one roll share `i`; inject fixture times for
    * replayable logs). */
  def eventsForSegments(segs: Seq[(String, Long)], rsName: String,
      ts: (Int, String) => Long): Seq[WalEvent] = {
    if (segs.isEmpty) return Nil
    val born = WalEvent(rsName, segs.head._1, ts(0, "ACTIVE"), "ACTIVE", 0L)
    born +: segs.sliding(2).zipWithIndex.collect {
      case (Seq((prev, prevLen), (next, _)), i) =>
        Seq(
          WalEvent(rsName, prev, ts(i + 1, "ROLLING"), "ROLLING", 0L),
          WalEvent(rsName, prev, ts(i + 1, "ROLLED"), "ROLLED", prevLen),
          WalEvent(rsName, next, ts(i + 1, "ACTIVE"), "ACTIVE", 0L))
    }.flatten.toSeq
  }

  /** Accessor twin: land events in the durable tracker table —
    * idempotent per row key (a replayed flush overwrites, never
    * duplicates: addWalEventTrackerRows' Puts key by rowKey). Each
    * flush stamps a monotone `flush_seq` so [[read]] can resolve
    * newest-wins when a re-flushed key carries a CHANGED payload (a
    * re-landed segment with a different final length) — ingestion
    * metadata only, never part of the queryable row. */
  def append(spark: SparkSession, tableDir: String,
      events: Seq[WalEvent]): Unit = {
    import spark.implicits._
    if (events.isEmpty) return
    events.toDF()
      .withColumn("row_key",
        concat_ws("_", col("wal_name"), col("timestamp"), col("wal_state")))
      .withColumn("flush_seq", lit(System.nanoTime()))
      .write.mode(SaveMode.Append).parquet(tableDir)
  }

  /** The queryable table: NEWEST write per row key wins — the
    * reference's Put overwrite resolved by the flush stamp (a plain
    * key-dedup would keep an arbitrary file's copy when a replayed
    * flush changed a payload). One window on the key; the table is
    * event-log-sized, never data-sized. */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("row_key").orderBy(col("flush_seq").desc)
    spark.read.parquet(tableDir)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "flush_seq")
  }
}
