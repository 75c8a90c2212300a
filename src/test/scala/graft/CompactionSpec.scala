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
        GScan().withRange("0000000001", "0000000020"))) {
      assert(rows(GTable.scan(compacted, s)) === rows(GTable.scan(store, s)),
        s"scan $s diverged through compaction")
    }
    // the ranged case must actually cover fixture rows
    assert(rows(GTable.scan(store,
      GScan().withRange("0000000001", "0000000020"))).nonEmpty)
  }

  test("fuzz: compaction is invisible to standard reads within retention") {
    // The invariant holds for non-raw scans with no time-travel knobs
    // and read maxVersions <= compacted maxVersions; time-range reads
    // may legitimately see fewer versions after a major compaction
    // (over-limit history is gone) — same behavior as the reference.
    import scala.util.Random
    val rowKeys = Seq("r1", "r2", "r3", "r4")
    val fams  = Seq("d", "e")
    val quals = Seq("a", "b", "c")
    val rnd = new Random(2610)
    def genCells(): Seq[GCell] = {
      val n = 12 + rnd.nextInt(30)
      (0 until n).map { _ =>
        val r = rowKeys(rnd.nextInt(rowKeys.size)); val f = fams(rnd.nextInt(fams.size))
        val q = quals(rnd.nextInt(quals.size)); val ts = 1 + rnd.nextInt(5)
        val t = rnd.nextInt(8) match {
          case 0 => CellType.Delete
          case 1 => CellType.DeleteColumn
          case 2 => CellType.DeleteFamily
          case 3 => CellType.DeleteFamilyVersion
          case _ => CellType.Put
        }
        val q2 = if (t == CellType.DeleteFamily || t == CellType.DeleteFamilyVersion) "" else q
        val v = if (t == CellType.Put) s"$r/$f/$q2@$ts" else null
        GCell(r, f, q2, ts.toLong, t, v)
      }.groupBy(c => (c.row, c.family, c.qualifier, c.ts, c.`type`))
        .map(_._2.head).toSeq
    }
    (1 to 15).foreach { i =>
      val cells = genCells().toDF()
      val compactV = 1 + rnd.nextInt(3)
      val compacted = Jobs.majorCompact(cells, maxVersions = compactV)
      val s = GScan(
        startRow = if (rnd.nextBoolean()) Some(rowKeys(rnd.nextInt(rowKeys.size))) else None,
        stopRow = if (rnd.nextBoolean()) Some(rowKeys(rnd.nextInt(rowKeys.size))) else None,
        startInclusive = rnd.nextBoolean(),
        stopInclusive = rnd.nextBoolean(),
        reversed = rnd.nextBoolean(),
        families = if (rnd.nextBoolean()) Seq(fams(rnd.nextInt(fams.size))) else Nil,
        columns = if (rnd.nextBoolean())
          Seq(fams(rnd.nextInt(fams.size)) -> quals(rnd.nextInt(quals.size))) else Nil,
        maxVersions = 1 + rnd.nextInt(compactV),
        limit = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(3)) else None)
      assert(rows(GTable.scan(compacted, s)) === rows(GTable.scan(cells, s)),
        s"case $i scan=$s compactV=$compactV")
    }
  }

  test("backup merge: restore(full, merged) ≡ restore(full, chain) and superseded versions drop") {
    // full@2, incrementals (2,3], (3,4], (4,5] over the fixture store
    val full = Jobs.fullBackup(store, 2L)
    val incs = Seq(
      Jobs.incrementalBackup(store, 2L, 3L),
      Jobs.incrementalBackup(store, 3L, 4L),
      Jobs.incrementalBackup(store, 4L, 5L))
    for (mv <- Seq(1, 2)) {
      val merged = Jobs.mergeBackupImages(incs, maxVersions = mv)
      val viaMerged = graft.read.Resolve.latest(
        Jobs.restore(full, Seq(merged)), maxVersions = mv)
      val viaChain = graft.read.Resolve.latest(
        Jobs.restore(full, incs), maxVersions = mv)
      assert(rows(viaMerged.orderBy("row", "family", "qualifier", "ts")) ===
        rows(viaChain.orderBy("row", "family", "qualifier", "ts")),
        s"merged restore diverged at maxVersions=$mv")
    }
    // retention: the merged image is SMALLER than the plain union (the
    // q62 trade — superseded versions physically drop) ...
    val union = incs.reduce(_ unionByName _)
    val merged1 = Jobs.mergeBackupImages(incs, maxVersions = 1)
    assert(merged1.count() < union.count())
    // ... no surviving Put is masked by a merged-range tombstone or
    // beyond the version rank ...
    val livePuts = merged1.filter(col("type") === CellType.Put)
    assert(livePuts.count() ===
      graft.read.Resolve.maskTombstones(merged1)
        .groupBy("row", "family", "qualifier").count().count())
    // ... and EVERY delete marker is retained verbatim (unlike
    // majorCompact): markers must keep masking the full image
    assert(merged1.filter(col("type") =!= CellType.Put).count() ===
      union.filter(col("type") =!= CellType.Put).count())
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
