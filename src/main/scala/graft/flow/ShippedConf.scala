package graft.flow

import org.apache.hadoop.conf.Configuration
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Broadcastable carrier of the DRIVER's Hadoop configuration for
  * executor-side `FileSystem` opens.
  *
  * A task that builds `new Configuration()` gets only the executor's
  * classpath defaults — any filesystem settings the driver holds
  * (credentials, endpoints, custom `fs.<scheme>.impl` registrations)
  * are silently dropped, so on a non-default filesystem a distributed
  * export/import reads or writes with the wrong settings. The
  * reference avoids this by serializing the job `Configuration` into
  * every task (Hadoop MapReduce job submission); Spark ships no Hadoop
  * conf to plain `foreachPartition` closures, so graft ships the
  * ENTRIES (a `Configuration` itself is not serializable) and each
  * executor overlays them on its local defaults.
  *
  * One broadcast per job; the rebuilt `Configuration` is cached per
  * JVM via the transient lazy val.
  */
final class ShippedConf(entries: Array[(String, String)]) extends Serializable {
  @transient private lazy val built: Configuration = {
    val c = new Configuration()
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
  def conf: Configuration = built
}

object ShippedConf {
  /** Snapshot the driver's Hadoop conf and broadcast it. Call on the
    * driver, before the distributed action; dereference `.value.conf`
    * inside the task. */
  def broadcast(spark: SparkSession): Broadcast[ShippedConf] = {
    val it = spark.sparkContext.hadoopConfiguration.iterator()
    val b = Array.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
    spark.sparkContext.broadcast(new ShippedConf(b.result()))
  }
}
