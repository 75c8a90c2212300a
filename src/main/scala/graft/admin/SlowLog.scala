package graft.admin

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slow-log ring twin (hbase-client/.../client/OnlineLogRecord.java,
  * hbase-server/.../namequeues/SlowLogQueueService.java): every
  * regionserver keeps a BOUNDED ring buffer (default 256 entries —
  * `hbase.regionserver.slowlog.ringbuffer.size`) of its slowest/largest
  * recent operations; `Admin.getSlowLogResponses` collects the rings
  * and the operator reads the top offenders. The ring is the part with
  * scale semantics: state per server is CONSTANT regardless of
  * operation volume — old records fall off as new ones arrive.
  *
  * Spark realization: the ring is one row_number window per server over
  * the insertion order (latest `ringSize` survive); the response is a
  * bounded top-N over the union of rings. Both frames are
  * ring-size × server-count — metadata-sized at any data scale.
  */
object SlowLog {

  /** The bounded per-server ring: keep each server's LATEST `ringSize`
    * records by insertion order (`seq` columns, ascending = arrival
    * order). The RingBufferEnvelope overwrite-oldest semantics. */
  def ring(records: DataFrame, ringSize: Int, serverCol: Column,
      seq: Column*): DataFrame = {
    require(ringSize > 0, "ring size must be positive")
    val w = Window.partitionBy(serverCol).orderBy(seq.map(_.desc): _*)
    records
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= ringSize)
      .drop("__rn")
  }

  /** Admin.getSlowLogResponses shape: the slow slice of the collected
    * rings (`isSlow` — the reference tags records against
    * `hbase.ipc.warn.response.time` at append time), ranked worst
    * first and bounded by `limit` (the admin call's client-side cap).
    * `order` breaks rank ties deterministically. */
  def slowLogResponses(rings: DataFrame, isSlow: Column, limit: Int,
      order: Seq[Column]): DataFrame = {
    require(limit > 0, "limit must be positive")
    rings
      .filter(isSlow)
      .withColumn("rank",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .filter(col("rank") <= limit)
  }
}
