package graft

import scala.util.Random

import graft.model.{CellType, GCell}
import graft.read.Resolve

/** Randomized equivalence of the distributed resolve against a naive
  * in-memory mirror of ScanDeleteTracker (SURVEY §5 graft adaptation:
  * "random puts/deletes/ts ⇒ invariants"). Seeded — deterministic.
  */
class ResolvePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rows  = Seq("r1", "r2", "r3")
  private val fams  = Seq("d", "e")
  private val quals = Seq("a", "b", "c")

  private def genCase(rnd: Random): Seq[GCell] = {
    val n = 5 + rnd.nextInt(25)
    val cells = (0 until n).map { _ =>
      val r = rows(rnd.nextInt(rows.size))
      val f = fams(rnd.nextInt(fams.size))
      val q = quals(rnd.nextInt(quals.size))
      val ts = 1 + rnd.nextInt(6)
      val t = rnd.nextInt(10) match {
        case 0 => CellType.Delete
        case 1 => CellType.DeleteColumn
        case 2 => CellType.DeleteFamily
        case 3 => CellType.DeleteFamilyVersion
        case _ => CellType.Put
      }
      val q2 = if (t == CellType.DeleteFamily || t == CellType.DeleteFamilyVersion) "" else q
      GCell(r, f, q2, ts.toLong, t, s"$r/$f/$q2@$ts")
    }
    // unique per (row,family,qualifier,ts,type): duplicate puts at the
    // same coordinate are not meaningful (last-write-wins is undefined)
    cells.groupBy(c => (c.row, c.family, c.qualifier, c.ts, c.`type`))
      .map(_._2.head).toSeq
  }

  /** Naive mirror of ScanDeleteTracker.isDeleted (ScanDeleteTracker.java:102). */
  private def naive(cells: Seq[GCell], maxVersions: Int): Set[(String, String, String, Long)] = {
    val puts = cells.filter(_.`type` == CellType.Put)
    def isMasked(p: GCell): Boolean = cells.exists { d =>
      d.`type` match {
        case CellType.Delete =>
          d.row == p.row && d.family == p.family && d.qualifier == p.qualifier && d.ts == p.ts
        case CellType.DeleteColumn =>
          d.row == p.row && d.family == p.family && d.qualifier == p.qualifier && p.ts <= d.ts
        case CellType.DeleteFamily =>
          d.row == p.row && d.family == p.family && p.ts <= d.ts
        case CellType.DeleteFamilyVersion =>
          d.row == p.row && d.family == p.family && p.ts == d.ts
        case _ => false
      }
    }
    puts.filterNot(isMasked)
      .groupBy(c => (c.row, c.family, c.qualifier))
      .flatMap { case (_, cs) => cs.sortBy(-_.ts).take(maxVersions) }
      .map(c => (c.row, c.family, c.qualifier, c.ts)).toSet
  }

  test("resolve equals naive model on 25 random tombstone mixes") {
    val rnd = new Random(42)
    (1 to 25).foreach { i =>
      val cells = genCase(rnd)
      val maxV  = 1 + rnd.nextInt(3)
      val got = Resolve.latest(cells.toDF(), maxV).collect()
        .map(r => (r.getAs[String]("row"), r.getAs[String]("family"),
          r.getAs[String]("qualifier"), r.getAs[Long]("ts"))).toSet
      val want = naive(cells, maxV)
      assert(got === want, s"case $i with maxVersions=$maxV, cells=$cells")
    }
  }
}
