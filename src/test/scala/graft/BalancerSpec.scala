package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.admin.Balancer
import graft.admin.Balancer.{RegionInfo, RegionPlan}

/** SimpleLoadBalancer twin vs the reference's own invariants
  * (TestSimpleLoadBalancer.testBalanceCluster /
  * assertClusterAsBalanced: after applying the plans every server
  * hosts between ⌊avg⌋ and ⌈avg⌉ regions). */
class BalancerSpec extends AnyFunSuite {

  private def cluster(loads: Int*): Map[String, Seq[RegionInfo]] =
    loads.zipWithIndex.map { case (n, si) =>
      f"srv$si%02d" -> (0 until n).map(i =>
        RegionInfo(f"s$si%02d-r$i%03d", si * 1000L + i))
    }.toMap

  private def applyPlans(a: Map[String, Seq[RegionInfo]],
      plans: Seq[RegionPlan]): Map[String, Int] = {
    val counts = collection.mutable.Map(a.map { case (s, r) => s -> r.size }.toSeq: _*)
    plans.foreach { p => counts(p.source) -= 1; counts(p.dest) += 1 }
    counts.toMap
  }

  private def assertBalanced(a: Map[String, Seq[RegionInfo]]): Unit = {
    val plans = Balancer.balanceTable(a)
    if (plans.isEmpty) {
      // a no-op is only legal when the slop gate says balanced
      assert(!Balancer.needsBalance(a.values.map(_.size)))
      return
    }
    val out = applyPlans(a, plans)
    val n = a.values.map(_.size).sum
    val minL = n / a.size
    val maxL = (n + a.size - 1) / a.size
    out.foreach { case (s, c) =>
      assert(c >= minL && c <= maxL, s"$s ended at $c outside [$minL,$maxL]")
    }
    // a region never moves twice and never "moves" to its own server
    assert(plans.map(_.region).distinct.size == plans.size)
    assert(plans.forall(p => p.source != p.dest))
  }

  test("reference distributions all end within [floor(avg), ceil(avg)]") {
    assertBalanced(cluster(0, 0, 0, 100))
    assertBalanced(cluster(1, 2, 3, 4, 5, 6))
    assertBalanced(cluster(10, 1))
    assertBalanced(cluster(514, 1432, 822, 213, 307))
    assertBalanced(cluster(0, 0, 144, 1, 0, 0))
    assertBalanced(cluster(47, 53))
  }

  test("slop gate: near-balanced clusters produce no plans") {
    // avg 4.5, band [floor(3.6), ceil(5.4)] = [3, 6] — (4, 5) is inside
    assert(Balancer.balanceTable(cluster(4, 5)).isEmpty)
    assert(!Balancer.needsBalance(Seq(4, 5)))
    assert(Balancer.needsBalance(Seq(10, 1)))
    // fewer regions than servers: everyone at 0 or 1 is balanced
    assert(Balancer.balanceTable(cluster(1, 0, 1, 0)).isEmpty)
  }

  test("sheds move the NEWEST regions first (descending regionId)") {
    val a = cluster(6, 0) // avg 3: shed 3 newest from srv00
    val plans = Balancer.balanceTable(a)
    assert(plans.map(_.region).sorted ==
      Seq("s00-r003", "s00-r004", "s00-r005"))
    assert(plans.forall(p => p.source == "srv00" && p.dest == "srv01"))
  }

  test("meta regions never move in the one-more shed pass") {
    // avg = 5/3 → min 1, max 2: srv00 sheds to 2; the extra shed needed
    // to fill srv02 to min must skip meta
    val meta = RegionInfo("meta", 99999L, isMeta = true)
    val a = Map(
      "srv00" -> ((0 until 4).map(i => RegionInfo(f"r$i%03d", i.toLong)) :+ meta),
      "srv01" -> Seq(RegionInfo("x", 5L)),
      "srv02" -> Seq.empty[RegionInfo])
    val plans = Balancer.balanceTable(a)
    assert(!plans.exists(_.region == "meta"))
    val out = applyPlans(a, plans)
    assert(out.values.forall(c => c >= 1 && c <= 2))
  }

  test("deterministic: same input, same plans") {
    val a = cluster(9, 6, 3, 3, 2, 1)
    val p1 = Balancer.balanceTable(a)
    val p2 = Balancer.balanceTable(a)
    assert(p1 == p2 && p1.size == 7)
    assert(applyPlans(a, p1).values.forall(_ == 4))
  }

  // ---- balanceCluster: the cluster-OVERALL mode ----

  private def multiCluster(perTable: Map[String, Seq[Int]])
      : Map[String, Map[String, Seq[RegionInfo]]] =
    perTable.map { case (t, loads) =>
      t -> loads.zipWithIndex.map { case (n, si) =>
        f"srv$si%02d" -> (0 until n).map(i =>
          RegionInfo(f"$t-s$si%02d-r$i%03d", si * 1000L + i))
      }.toMap
    }

  private def overallTotals(a: Map[String, Map[String, Seq[RegionInfo]]],
      plans: Map[String, Seq[RegionPlan]]): Map[String, Int] = {
    val servers = a.values.flatMap(_.keys).toSet
    val counts = collection.mutable.Map(
      servers.toSeq.map(_ -> 0): _*)
    a.values.foreach(_.foreach { case (s, rs) => counts(s) += rs.size })
    plans.values.flatten.foreach { p =>
      counts(p.source) -= 1; counts(p.dest) += 1
    }
    counts.toMap
  }

  test("five even tables drain the empty server (testImpactOfBalanceClusterOverall twin)") {
    // the reference's mockUniformCluster [5,5,5,5,5,0] WITH tables:
    // each of five tables is one region on each of srv00-srv04 —
    // per-table perfectly balanced (no idle >1, inside any slop band),
    // so the BYTABLE strategy can never drain srv05; the overall gate
    // must (totals [5,5,5,5,5,0] vs avg 25/6)
    val a = multiCluster((0 until 5).map(t =>
      s"t$t" -> Seq(1, 1, 1, 1, 1, 0)).toMap)
    assert((0 until 5).forall(t =>
      Balancer.balanceTable(a(s"t$t"), slop = 0.0).isEmpty))
    val plans = Balancer.balanceCluster(a, slop = 0.0)
    // one ⌈avg⌉-peel per table lands on srv05 until the totals close
    // the [4, 5] band: exactly four moves, from the name-rotating
    // survivor of each table's un-peel pass
    assert(plans == Map(
      "t0" -> Seq(RegionPlan("t0-s04-r000", "srv04", "srv05")),
      "t1" -> Seq(RegionPlan("t1-s03-r000", "srv03", "srv05")),
      "t2" -> Seq(RegionPlan("t2-s02-r000", "srv02", "srv05")),
      "t3" -> Seq(RegionPlan("t3-s01-r000", "srv01", "srv05"))))
    val totals = overallTotals(a, plans)
    assert(totals.values.max <= 5 && totals.values.min >= 4)
  }

  test("strictly: one table's pass lands every server on the overall average") {
    // testBalanceClusterOverallStrictly: table0 [3,3,4,4,4,4,5,5,5] +
    // table1 [2,2,2,2,2,2,2,2,1] — totals 54 over 9 servers must end
    // at exactly 6 each, and table1 (already in-band per-table AND
    // overall-balanced after table0's pass) contributes no plans
    val a = multiCluster(Map(
      "table0" -> Seq(3, 3, 4, 4, 4, 4, 5, 5, 5),
      "table1" -> Seq(2, 2, 2, 2, 2, 2, 2, 2, 1)))
    val plans = Balancer.balanceCluster(a, slop = 0.0)
    assert(!plans.contains("table1"))
    val totals = overallTotals(a, plans)
    assert(totals.values.forall(_ == 6),
      s"totals off the overall average: $totals")
    // table0 itself stays in its own [4, 5] band
    val t0 = collection.mutable.Map(
      a("table0").map { case (s, rs) => s -> rs.size }.toSeq: _*)
    plans("table0").foreach { p => t0(p.source) -= 1; t0(p.dest) += 1 }
    assert(t0.values.forall(c => c >= 4 && c <= 5))
  }

  test("overall-balanced cluster produces no plans at all") {
    val a = multiCluster(Map(
      "x" -> Seq(2, 2, 2), "y" -> Seq(1, 1, 1)))
    assert(Balancer.balanceCluster(a, slop = 0.0).isEmpty)
  }

  test("a server missing from a table's map holds none of it but receives") {
    // srv02 appears only under table y: for table x it is an implicit
    // zero and a legal overall destination
    val a = Map(
      "x" -> Map(
        "srv00" -> (0 until 4).map(i => RegionInfo(f"x-a$i%02d", i.toLong)),
        "srv01" -> (0 until 4).map(i => RegionInfo(f"x-b$i%02d", i.toLong))),
      "y" -> Map(
        "srv00" -> Seq(RegionInfo("y-a", 1L)),
        "srv01" -> Seq(RegionInfo("y-b", 2L)),
        "srv02" -> Seq.empty[RegionInfo]))
    val plans = Balancer.balanceCluster(a, slop = 0.0)
    val totals = overallTotals(a, plans)
    // 10 regions over 3 servers: overall band [3, 4]
    assert(totals.values.max <= 4 && totals.values.min >= 3,
      s"totals outside the overall band: $totals")
    assert(plans.values.flatten.exists(_.dest == "srv02"))
  }

  test("maintenance mode: no balancing, system regions to the one server") {
    val sysR = RegionInfo("meta", 1L, isMeta = true)
    val userR = RegionInfo("user-r", 2L)
    val isSys = (r: RegionInfo) => r.isMeta
    assert(Balancer.Maintenance.balanceCluster(
      multiCluster(Map("x" -> Seq(5, 0)))).isEmpty)
    assert(Balancer.Maintenance.assign(
      Seq(sysR, userR), Seq("srv00"), isSys) == Map("srv00" -> Seq(sysR)))
    assert(Balancer.Maintenance.assign(Seq(userR), Seq("srv00"), isSys).isEmpty)
    assert(Balancer.Maintenance.assignOne(sysR, Seq("srv00"), isSys)
      .contains("srv00"))
    assert(Balancer.Maintenance.assignOne(userR, Seq("srv00"), isSys).isEmpty)
    intercept[IllegalArgumentException](
      Balancer.Maintenance.assign(Seq(sysR), Seq("a", "b"), isSys))
  }

  test("a meta-locked table aborts cleanly and later tables still balance") {
    // table 'a' is over MAX on srv00 but every candidate is meta —
    // shedOne refuses, the should-not-happen guard aborts the table,
    // and the abort must leave the shared totals usable: table 'b'
    // still balances on its own merits, and no meta ever moves
    val meta = (i: Int) => RegionInfo(s"meta$i", 90L + i, isMeta = true)
    val a = Map(
      "a" -> Map(
        "srv00" -> Seq(meta(0), meta(1), meta(2)),
        "srv01" -> Seq(RegionInfo("a-n1", 1L)),
        "srv02" -> Seq.empty[RegionInfo]),
      "b" -> Map(
        "srv00" -> Seq.empty[RegionInfo],
        "srv01" -> Seq.empty[RegionInfo],
        "srv02" -> Seq(RegionInfo("b-n1", 1L), RegionInfo("b-n2", 2L))))
    val plans = Balancer.balanceCluster(a, slop = 0.0)
    assert(!plans.values.flatten.exists(_.region.startsWith("meta")))
    // b spreads off its pile despite a's abort
    assert(plans.get("b").exists(_.nonEmpty))
    plans.values.flatten.foreach(p => assert(p.source != p.dest))
  }

  test("property: no meta region ever moves; plans stay self-consistent") {
    val rnd = new scala.util.Random(42)
    (0 until 60).foreach { trial =>
      val nServers = 3 + rnd.nextInt(4)
      val nTables = 2 + rnd.nextInt(3)
      var id = 0L
      val a = (0 until nTables).map { t =>
        s"t$t" -> (0 until nServers).map { si =>
          val n = rnd.nextInt(7)
          f"srv$si%02d" -> (0 until n).map { _ =>
            id += 1
            RegionInfo(s"t$t-r$id", id, isMeta = rnd.nextInt(7) == 0)
          }
        }.toMap
      }.toMap
      val plans = Balancer.balanceCluster(a, slop = 0.0)
      val allRegions = a.map { case (t, m) =>
        t -> m.values.flatten.map(r => r.name -> r).toMap
      }
      plans.foreach { case (t, ps) =>
        // every plan names a real region of its table, never meta,
        // never a self-move, and no region moves twice
        assert(ps.map(_.region).distinct.size == ps.size, s"trial $trial")
        ps.foreach { p =>
          val r = allRegions(t).get(p.region)
          assert(r.isDefined && !r.get.isMeta && p.source != p.dest,
            s"trial $trial bad plan $p")
        }
      }
    }
  }

  test("balanceCluster is deterministic") {
    val a = multiCluster(Map(
      "t0" -> Seq(7, 1, 3, 0), "t1" -> Seq(2, 5, 0, 1)))
    val p1 = Balancer.balanceCluster(a)
    val p2 = Balancer.balanceCluster(a)
    assert(p1 == p2)
    val totals = overallTotals(a, p1)
    // 19 regions over 4 servers: overall band [4, 5] at slop 0.2 is
    // [floor(4.75*0.8), ceil(4.75*1.2)] = [3, 6]
    assert(totals.values.max <= 6 && totals.values.min >= 3)
  }
}
