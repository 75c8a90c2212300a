package graft

import org.apache.spark.sql.functions._

import graft.flow.Jobs
import graft.model.{CellType, Fixtures}
import graft.read.{GScan, GTable, Resolve}
import graft.write.MobStore

/** MOB storage model (MobUtils.java:128,518; CF MOB_THRESHOLD) and the
  * BulkDeleteEndpoint delete-by-scan (BulkDeleteEndpoint.java:120-235).
  */
class MobBulkSpec extends SparkSpec {
  import spark.implicits._

  lazy val store = Fixtures.cellsEventsV(spark, sf0001).cache()

  private def cellSet(df: org.apache.spark.sql.DataFrame) =
    df.select("row", "family", "qualifier", "ts", "type", "value")
      .collect().map(_.toSeq).toSet

  test("MOB split moves only over-threshold puts; read stitches back exactly") {
    val cells = Fixtures.cellsOrders(spark, sf0001)
    val (main, mob) = MobStore.split(cells, threshold = 10)
    // no over-threshold value stays inline in main
    val inline = main.filter(col("type") === CellType.Put &&
      !col("value").startsWith(MobStore.RefPrefix))
    assert(inline.filter(length(col("value")) >= 10).count() === 0)
    // refs exist (the split is not an identity) and dedup to the blob side
    val refs = main.filter(col("value").startsWith(MobStore.RefPrefix)).count()
    assert(refs > 0)
    assert(mob.count() <= refs)
    assert(mob.select("ref").distinct().count() === mob.count())
    // transparent read reconstructs the original cell set exactly
    assert(cellSet(MobStore.read(main, mob)) === cellSet(cells))
  }

  test("MOB threshold counts bytes, and look-alike inline values round-trip") {
    import graft.model.CellType
    val cells = Seq(
      // 5 chars but 10 UTF-8 bytes — BYTE threshold must move it
      ("r1", "d", "q", 1L, CellType.Put, "ééééé", 1L),
      // 5 ASCII bytes — stays inline
      ("r2", "d", "q", 1L, CellType.Put, "short", 2L),
      // inline (8 bytes) value that LOOKS like a ref cell — must
      // escape + round-trip, never stitch
      ("r3", "d", "q", 1L, CellType.Put, "mobref:x", 3L),
      // inline value that looks like an ESCAPED cell — double-escapes
      ("r4", "d", "q", 1L, CellType.Put, "mobesc:y", 4L))
      .toDF("row", "family", "qualifier", "ts", "type", "value", "seq")
    val (main, mob) = MobStore.split(cells, threshold = 10)
    // the multi-byte value moved to the blob side despite 5 "chars"
    assert(main.filter(col("row") === "r1" &&
      col("value").startsWith(MobStore.RefPrefix)).count() === 1)
    assert(mob.count() === 1) // only r1's blob — look-alikes stayed inline
    // the look-alikes are escaped in the store, not left ambiguous
    assert(main.filter(col("row") === "r3").head().getAs[String]("value")
      === "mobesc:mobref:x")
    assert(main.filter(col("row") === "r4").head().getAs[String]("value")
      === "mobesc:mobesc:y")
    assert(cellSet(MobStore.read(main, mob)) === cellSet(cells))
  }

  test("MOB roundtrip preserves tombstone markers untouched") {
    val (main, mob) = MobStore.split(store, threshold = 4)
    val markers = store.filter(col("type") =!= CellType.Put)
    assert(cellSet(main.filter(col("type") =!= CellType.Put)) === cellSet(markers))
    assert(cellSet(MobStore.read(main, mob)) === cellSet(store))
  }

  test("bulkDelete COLUMN masks exactly the matched columns") {
    val marks = Jobs.bulkDelete(store,
      GScan(maxVersions = 3,
        filter = Some(col("qualifier") === "event_type" && col("value") === "click")),
      "COLUMN")
    assert(marks.select("type").distinct().as[String].collect().toSeq ===
      Seq(CellType.DeleteColumn))
    val after = Resolve.latest(store.unionByName(marks), maxVersions = 3)
    // no surviving event_type cell belongs to a row whose visible
    // newest-3 event_type versions included a click
    val matchedRows = Resolve.latest(store, maxVersions = 3,
        cellFilter = Some(col("qualifier") === "event_type" && col("value") === "click"))
      .select("row").distinct().as[String].collect().toSet
    val surviving = after.filter(col("qualifier") === "event_type")
      .select("row").distinct().as[String].collect().toSet
    assert(surviving.intersect(matchedRows).isEmpty)
    // other columns are untouched
    val before = Resolve.latest(store, maxVersions = 3)
    assert(cellSet(after.filter(col("qualifier") =!= "event_type")) ===
      cellSet(before.filter(col("qualifier") =!= "event_type")))
  }

  test("bulkDelete ROW wipes matched rows across all families") {
    val marks = Jobs.bulkDelete(store,
      GScan(filter = Some(col("value") === "click")), "ROW")
    val matched = Resolve.latest(store,
        cellFilter = Some(col("value") === "click"))
      .select("row").distinct().as[String].collect().toSet
    assert(marks.select("row").distinct().as[String].collect().toSet === matched)
    val after = Resolve.latest(store.unionByName(marks))
    assert(after.filter(col("row").isin(matched.toSeq: _*)).count() === 0)
  }

  test("bulkDelete VERSION deletes each matched version's own ts") {
    val marks = Jobs.bulkDelete(store,
      GScan(maxVersions = 2, filter = Some(col("qualifier") === "value")),
      "VERSION")
    assert(marks.select("type").distinct().as[String].collect().toSeq ===
      Seq(CellType.Delete))
    val after = Resolve.latest(store.unionByName(marks), maxVersions = 5)
    val visibleBefore = Resolve.latest(store, maxVersions = 2,
      cellFilter = Some(col("qualifier") === "value"))
    // every previously-visible newest-2 'value' version is now masked
    val gone = after.alias("a").join(visibleBefore.alias("v"),
      Seq("row", "family", "qualifier", "ts"), "inner")
    assert(gone.count() === 0)
  }
}
