package graft

import scala.util.Random

import graft.model.{CellType, GCell}
import graft.read.{GScan, GTable, Resolve}

/** Randomized equivalence of the full scan pipeline (row range ×
  * projection × raw-ness × resolve knobs × row limit) against a naive
  * in-memory mirror — the composition-order minefield end to end:
  * range+projection prune BEFORE resolve, family-scoped tombstones
  * survive qualifier projections, per-CF time ranges override the
  * global one, KEEP_DELETED_CELLS ceilings are per family, MIN_VERSIONS
  * outlives TTL, and the row limit counts rows (not cells) in scan
  * direction. Seeded — deterministic.
  */
class ScanPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rows  = Seq("r1", "r2", "r3", "r4")
  private val fams  = Seq("d", "e")
  private val quals = Seq("a", "b", "c")

  private def genCells(rnd: Random): Seq[GCell] = {
    val n = 12 + rnd.nextInt(30)
    (0 until n).map { _ =>
      val r = rows(rnd.nextInt(rows.size))
      val f = fams(rnd.nextInt(fams.size))
      val q = quals(rnd.nextInt(quals.size))
      val ts = 1 + rnd.nextInt(5)
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

  private def genScan(rnd: Random): GScan = {
    def tr() = { val lo = 1L + rnd.nextInt(3); Resolve.TimeRange(lo, lo + 1 + rnd.nextInt(4)) }
    GScan(
      startRow = if (rnd.nextBoolean()) Some(rows(rnd.nextInt(rows.size))) else None,
      stopRow = if (rnd.nextBoolean()) Some(rows(rnd.nextInt(rows.size))) else None,
      startInclusive = rnd.nextBoolean(),
      stopInclusive = rnd.nextBoolean(),
      rowPrefix = if (rnd.nextInt(4) == 0) Some("r") else None,
      reversed = rnd.nextBoolean(),
      raw = rnd.nextInt(3) == 0,
      families = if (rnd.nextBoolean()) Seq(fams(rnd.nextInt(fams.size))) else Nil,
      columns = if (rnd.nextBoolean())
        Seq(fams(rnd.nextInt(fams.size)) -> quals(rnd.nextInt(quals.size))) else Nil,
      maxVersions = 1 + rnd.nextInt(3),
      timeRange = if (rnd.nextBoolean()) Some(tr()) else None,
      cfTimeRanges = if (rnd.nextBoolean()) Map(fams(rnd.nextInt(fams.size)) -> tr()) else Map.empty,
      ttlCutoff = if (rnd.nextBoolean()) Some(1L + rnd.nextInt(4)) else None,
      minVersions = rnd.nextInt(3),
      keepDeleted = rnd.nextBoolean(),
      limit = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(3)) else None)
  }

  // ---- the naive mirror ---------------------------------------------------

  private def naiveScan(cells: Seq[GCell], s: GScan): Seq[GCell] = {
    val ranged = cells.filter { c =>
      s.startRow.forall(v => if (s.startInclusive) c.row >= v else c.row > v) &&
        s.stopRow.forall(v => if (s.stopInclusive) c.row <= v else c.row < v) &&
        s.rowPrefix.forall(c.row.startsWith)
    }
    val hasProj = s.families.nonEmpty || s.columns.nonEmpty
    val projFams = (s.families ++ s.columns.map(_._1)).distinct
    def strict(c: GCell) = !hasProj ||
      s.families.contains(c.family) || s.columns.contains((c.family, c.qualifier))
    def projected(c: GCell) =
      if (s.raw) strict(c)
      else strict(c) || (c.`type` != CellType.Put && c.qualifier == "" &&
        projFams.contains(c.family))
    val pruned = ranged.filter(projected)
    def inTr(c: GCell): Boolean =
      s.cfTimeRanges.get(c.family).orElse(s.timeRange)
        .forall(tr => c.ts >= tr.min && c.ts < tr.max)
    val resolved =
      if (s.raw) pruned.filter(inTr)
      else naiveResolve(pruned, s)
    s.limit.fold(resolved) { n =>
      val order = resolved.map(_.row).distinct.sorted
      val keep = (if (s.reversed) order.reverse else order).take(n).toSet
      resolved.filter(c => keep.contains(c.row))
    }
  }

  /** Mirror of Resolve.latest with every knob (same rules as
    * ResolvePropertySpec, plus the scan-level composition). */
  private def naiveResolve(cells: Seq[GCell], s: GScan): Seq[GCell] = {
    val anyRange = s.timeRange.nonEmpty || s.cfTimeRanges.nonEmpty
    def ceil(f: String): Long =
      s.cfTimeRanges.get(f).map(_.max).orElse(s.timeRange.map(_.max))
        .getOrElse(Long.MaxValue)
    def isMasked(p: GCell): Boolean = cells.exists { d =>
      (!s.keepDeleted || !anyRange || d.ts < ceil(d.family)) && (d.`type` match {
        case CellType.Delete =>
          d.row == p.row && d.family == p.family && d.qualifier == p.qualifier && d.ts == p.ts
        case CellType.DeleteColumn =>
          d.row == p.row && d.family == p.family && d.qualifier == p.qualifier && p.ts <= d.ts
        case CellType.DeleteFamily =>
          d.row == p.row && d.family == p.family && p.ts <= d.ts
        case CellType.DeleteFamilyVersion =>
          d.row == p.row && d.family == p.family && p.ts == d.ts
        case _ => false
      })
    }
    def inTr(c: GCell): Boolean =
      s.cfTimeRanges.get(c.family).orElse(s.timeRange)
        .forall(tr => c.ts >= tr.min && c.ts < tr.max)
    val survivors = cells.filter(_.`type` == CellType.Put)
      .filterNot(isMasked).filter(inTr)
    val preTtl =
      if (s.minVersions == 0) survivors.filter(c => s.ttlCutoff.forall(c.ts >= _))
      else survivors
    preTtl.groupBy(c => (c.row, c.family, c.qualifier)).values.flatMap { cs =>
      cs.sortBy(-_.ts).zipWithIndex
        .filter { case (c, i) =>
          val rn = i + 1
          rn <= s.maxVersions && (s.ttlCutoff.isEmpty || c.ts >= s.ttlCutoff.get ||
            (s.minVersions > 0 && rn <= s.minVersions))
        }
        .map(_._1)
    }.toSeq
  }

  private def asTuples(cells: Seq[GCell]) =
    cells.map(c => (c.row, c.family, c.qualifier, c.ts, c.`type`,
      Option(c.value).getOrElse(" null"))).toSet

  test("GTable.scan equals the naive mirror on 60 random scan specs") {
    val rnd = new Random(812)
    (1 to 60).foreach { i =>
      val cells = genCells(rnd)
      val s     = genScan(rnd)
      val got = GTable.scan(cells.toDF(), s)
        .collect()
        .map(r => (r.getAs[String]("row"), r.getAs[String]("family"),
          r.getAs[String]("qualifier"), r.getAs[Long]("ts"),
          r.getAs[String]("type"),
          Option(r.getAs[String]("value")).getOrElse(" null")))
        .toSet
      val want = asTuples(naiveScan(cells, s))
      assert(got === want, s"case $i scan=$s cells=$cells")
    }
  }
}
