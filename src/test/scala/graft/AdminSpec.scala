package graft

import org.apache.spark.sql.functions._

import graft.admin.GAdmin
import graft.model.Fixtures
import graft.read.Resolve

/** Admin lifecycle: create → put → scan → disable/enable → snapshot →
  * clone → drop, with merge-on-read reconciliation over the store.
  */
class AdminSpec extends SparkSpec {

  test("table lifecycle with snapshot and clone") {
    val tmp = java.nio.file.Files.createTempDirectory("admin").toString
    GAdmin.createTable(spark, "t1", tmp, families = Seq("d"), buckets = 2)
    assert(GAdmin.listTables(spark).contains("t1"))
    assert(GAdmin.table(spark, "t1").count() === 0)

    val cells = Fixtures.cellsOrders(spark, sf0001).limit(500)
    GAdmin.put(spark, "t1", cells)
    assert(GAdmin.table(spark, "t1").count() === 500)

    // disabled tables reject reads, enable restores
    GAdmin.disableTable(spark, "t1")
    intercept[IllegalArgumentException](GAdmin.table(spark, "t1"))
    GAdmin.enableTable(spark, "t1")

    // a second put batch merges on read (Resolve picks newest version)
    val newer = cells.limit(100).withColumn("ts", lit(2L))
      .withColumn("value", lit("v2"))
    GAdmin.put(spark, "t1", newer)
    val latest = Resolve.latest(GAdmin.table(spark, "t1"))
    assert(latest.filter(col("value") === "v2").count() === 100)

    // snapshot is immutable: a later put does not change it
    GAdmin.snapshot(spark, "t1", "snap1", tmp)
    GAdmin.put(spark, "t1", cells.limit(50).withColumn("ts", lit(3L)))
    GAdmin.cloneSnapshot(spark, s"$tmp/snap1", "t2", tmp, buckets = 2)
    assert(GAdmin.table(spark, "t2").count() === 600)
    assert(GAdmin.table(spark, "t1").count() === 650)

    GAdmin.deleteTable(spark, "t1")
    GAdmin.deleteTable(spark, "t2")
    assert(!GAdmin.listTables(spark).contains("t1"))
  }
}
