package graft

import org.apache.spark.sql.functions._

import graft.flow.Jobs
import graft.model.{CellType, Fixtures, GCell}
import graft.read.{GScan, GTable}

/** Major-compaction invariants (Admin.majorCompact / Compactor.java):
  * the rewrite must be invisible to every standard read at or below the
  * descriptor's retention, while physically dropping tombstones,
  * over-limit versions, and TTL-expired cells.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  lazy val store = Fixtures.cellsEventsV(spark, sf0001).cache()

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("row", "family", "qualifier", "ts", "value")
      .collect().map(_.toSeq).toSeq

  test("standard scans read identically through the compacted store") {
    val compacted = Jobs.majorCompact(store, maxVersions = 3)
    for (s <- Seq(
        GScan(),                          // latest view
        GScan(maxVersions = 2),           // within retained versions
        GScan(families = Seq("d")),       // projected
        GScan().withRange("e00001", "e00020"))) {
      assert(rows(GTable.scan(compacted, s)) === rows(GTable.scan(store, s)),
        s"scan $s diverged through compaction")
    }
  }

  test("compaction physically drops markers, masked cells, and expired versions") {
    val df = Seq(
      GCell("r1", "d", "a", 1, CellType.Put, "old"),
      GCell("r1", "d", "a", 2, CellType.Put, "mid"),
      GCell("r1", "d", "a", 3, CellType.Put, "new"),
      GCell("r2", "d", "a", 1, CellType.Put, "dead"),
      GCell("r2", "d", "a", 2, CellType.DeleteColumn, null),
      GCell("r3", "d", "a", 1, CellType.Put, "expired")
    ).toDF()
    val out = Jobs.majorCompact(df, maxVersions = 2, ttlCutoff = Some(2L))
    // no tombstone survives the rewrite
    assert(out.filter(col("type") =!= CellType.Put).count() === 0L)
    val got = out.select("row", "ts").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // r1 keeps newest 2 of 3; r2 fully masked; r3 TTL-expired
    assert(got === Set(("r1", 2L), ("r1", 3L)))
    // MIN_VERSIONS retains the newest version past the TTL floor
    val kept = Jobs.majorCompact(df, maxVersions = 2, ttlCutoff = Some(2L),
      minVersions = 1)
    assert(kept.filter(col("row") === "r3").count() === 1L)
  }
}
