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
}
