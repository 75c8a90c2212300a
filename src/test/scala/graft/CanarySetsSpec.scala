package graft

import org.apache.spark.sql.functions._

import graft.admin.Canary
import graft.flow.BackupRegistry
import graft.model.Fixtures
import graft.read.Resolve

/** Canary probe semantics (CanaryTool.java:488-640) and backup sets
  * (BackupSystemTable.java:829-931, BackupAdminImpl.java:385-445). */
class CanarySetsSpec extends SparkSpec {

  test("canary: first-region scan, exact-key get, miss is success") {
    val latest = Resolve.latest(
      Fixtures.cellsEventsV(spark, sf0001), maxVersions = 1).cache()
    val minRow = latest.agg(min("row")).head.getString(0)
    val someRow = latest.select("row").distinct()
      .orderBy(col("row").desc).head.getString(0)
    val out = Canary.probeRegions(latest, Seq(
      ("first", "", someRow), // first region: scans to its end key
      ("hit", someRow, ""), // exact-row get on a present boundary
      ("miss", "zz-no-such-row", ""))) // present REGION, absent row
      .collect().map(r => r.getAs[String]("region") -> r).toMap
    assert(out("first").getAs[String]("probe_row") == minRow)
    assert(out("first").getAs[Long]("cells_read") == 1L)
    assert(out("hit").getAs[String]("probe_row") == someRow)
    // the lowest-qualifier live cell answers a FirstKeyOnly get
    val expectQual = latest.filter(col("row") === someRow)
      .agg(min("qualifier")).head.getString(0)
    assert(out("hit").getAs[String]("first_qualifier") == expectQual)
    // a miss still succeeds — zero cells is data, not an outage
    assert(out("miss").getAs[Long]("cells_read") == 0L)
    assert(out("miss").getAs[Boolean]("success"))
    assert(out("miss").getAs[String]("probe_row") == null)
    latest.unpersist()
  }

  test("backup sets: union add, disjoint remove, empty-set auto-delete") {
    val root = java.nio.file.Files.createTempDirectory("bsets").toString
    assert(BackupRegistry.listBackupSets(spark, root).isEmpty)
    assert(BackupRegistry.describeBackupSet(spark, root, "nightly").isEmpty)

    BackupRegistry.addToBackupSet(spark, root, "nightly", Seq("t1", "t2"))
    // re-add unions, never duplicates (BackupSystemTable.java:888-891)
    BackupRegistry.addToBackupSet(spark, root, "nightly", Seq("t2", "t3"))
    BackupRegistry.addToBackupSet(spark, root, "weekly", Seq("t9"))
    assert(BackupRegistry.describeBackupSet(spark, root, "nightly")
      .contains(Seq("t1", "t2", "t3")))
    assert(BackupRegistry.listBackupSets(spark, root).keySet ==
      Set("nightly", "weekly"))

    BackupRegistry.removeFromBackupSet(spark, root, "nightly", Seq("t2"))
    assert(BackupRegistry.describeBackupSet(spark, root, "nightly")
      .contains(Seq("t1", "t3")))
    // removing from a missing set is a no-op (reference warns only)
    BackupRegistry.removeFromBackupSet(spark, root, "ghost", Seq("x"))

    // emptying a set deletes it outright (BackupSystemTable.java:929)
    BackupRegistry.removeFromBackupSet(spark, root, "weekly", Seq("t9"))
    assert(BackupRegistry.describeBackupSet(spark, root, "weekly").isEmpty)

    // explicit delete: true once, false when already gone
    assert(BackupRegistry.deleteBackupSet(spark, root, "nightly"))
    assert(!BackupRegistry.deleteBackupSet(spark, root, "nightly"))
    assert(BackupRegistry.listBackupSets(spark, root).isEmpty)
  }
}
