package graft

import org.apache.hadoop.fs.Path

import graft.admin.{Balancer, RegionMover}
import graft.admin.Balancer.RegionInfo
import graft.flow.{HFilePrint, HFiles}
import graft.model.Fixtures

/** RegionMover drain/reload (RegionMover.java) and the hbck
  * HFileCorruptionChecker (HFileCorruptionChecker.java:92-140). */
class HbckMoverSpec extends SparkSpec {

  test("unload spreads least-loaded-first, honors excludes and meta; load inverts") {
    val a = Map(
      "s0" -> (0 until 6).map(i => RegionInfo(s"r$i", i.toLong)),
      "s1" -> (0 until 4).map(i => RegionInfo(s"x$i", 100L + i)),
      "s2" -> Seq(RegionInfo("y0", 200L)),
      "s3" -> Seq(RegionInfo("z0", 300L)))
    val plans = RegionMover.unload(a, "s0")
    assert(plans.size == 6 && plans.forall(_.source == "s0"))
    // least-loaded first, re-evaluated: s2/s3 (1 each) soak up most
    val gained = plans.groupBy(_.dest).view.mapValues(_.size).toMap
    assert(gained("s2") + gained("s3") >= 4)
    // final loads even: every server within 1 of the mean
    val fin = Map("s1" -> 4, "s2" -> 1, "s3" -> 1).map { case (s, c) =>
      s -> (c + gained.getOrElse(s, 0))
    }
    assert(fin.values.max - fin.values.min <= 1, s"uneven drain: $fin")

    // excludes are never destinations
    val excl = RegionMover.unload(a, "s0", excludes = Set("s1", "s2"))
    assert(excl.forall(_.dest == "s3"))

    // meta stays home unless asked
    val withMeta = a.updated("s0",
      a("s0") :+ RegionInfo("meta", 9999L, isMeta = true))
    assert(!RegionMover.unload(withMeta, "s0").exists(_.region == "meta"))
    assert(RegionMover.unload(withMeta, "s0", moveMeta = true)
      .exists(_.region == "meta"))

    // reload replays the saved plan back onto the drained server
    val back = RegionMover.load(plans, "s0")
    assert(back.size == 6 && back.forall(_.dest == "s0"))
    assert(back.map(_.region).sorted == plans.map(_.region).sorted)
  }

  test("hbck: corrupt files quarantine into the mirrored .corrupt tree") {
    val root = java.nio.file.Files.createTempDirectory("hbck").toString
    val cells = Fixtures.cellsOrders(spark, sf0001).limit(500)
    HFiles.export(cells, 1, s"$root/t1/r0/d")
    HFiles.export(cells, 1, s"$root/t1/r1/d")
    // a garbage file and a truncated file in r1
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "t1", "r1", "d", "junk.hfile"),
      Array.fill[Byte](8192)(0x5A))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "t1", "r1", "d", "short.hfile"),
      Array.fill[Byte](10)(1))

    val r = HFilePrint.checkCorruption(spark, root)
    assert(r.checked == 4)
    assert(r.corrupt.map(p => new Path(p).getName).sorted ==
      Seq("junk.hfile", "short.hfile"))
    assert(r.quarantined.size == 2 && r.failures.isEmpty)
    // mirrored path: .corrupt/t1/r1/d/<file>
    assert(r.quarantined.forall(_.contains(".corrupt/t1/r1/d/")))
    // the good files stayed; a second sweep is clean
    val again = HFilePrint.checkCorruption(spark, root)
    assert(again.checked == 2 && again.corrupt.isEmpty)
    // quarantined store still readable? no — but the healthy stores are
    assert(HFiles.importCells(spark, s"$root/t1/r0/d").count() == 500)
  }
}
