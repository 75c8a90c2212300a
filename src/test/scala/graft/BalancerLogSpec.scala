package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.admin.{BalancerLog, StochasticBalancer}
import graft.admin.StochasticBalancer.{RegionLoad, Weights}

/** Balancer decision/rejection rings
  * (namequeues/BalancerDecisionQueueService.java:60-125,
  * BalancerRejectionQueueService.java): bounded ring, newest-first
  * reads, 15-plan chunking, and the walk actually recording. */
class BalancerLogSpec extends AnyFunSuite {

  test("ring bounds at capacity, evicting oldest; reads newest-first with limit") {
    val log = new BalancerLog(capacity = 5)
    (1 to 8).foreach(i =>
      log.recordDecision(s"t$i", i.toDouble, 0.0, 10L, Seq(s"p$i")))
    val ds = log.decisions()
    assert(ds.size == 5, "capacity must bound the ring")
    assert(ds.map(_.table) == Seq("t8", "t7", "t6", "t5", "t4"),
      "newest-first, oldest evicted")
    assert(log.decisions(limit = 2).map(_.table) == Seq("t8", "t7"))
  }

  test("decisions with >15 plans chunk into 15-plan entries sharing the run's costs") {
    val log = new BalancerLog()
    val plans = (1 to 38).map(i => s"plan-$i")
    log.recordDecision("t", 0.9, 0.1, 20000L, plans)
    val ds = log.decisions()
    assert(ds.size == 3, "38 plans = 15 + 15 + 8 entries")
    // newest-first: the LAST chunk read first; chunks preserve order
    assert(ds.map(_.regionPlans.size) == Seq(8, 15, 15))
    assert(ds.flatMap(_.regionPlans.reverse).reverse == plans)
    assert(ds.forall(d => d.initTotalCost == 0.9 &&
      d.computedTotalCost == 0.1 && d.computedSteps == 20000L))
  }

  test("a computed walk records its decision; a gated walk records a rejection") {
    val log = new BalancerLog()
    val skewed = Map(
      "s0" -> (0 until 9).map(i => RegionLoad(f"r$i")),
      "s1" -> Seq.empty[RegionLoad], "s2" -> Seq.empty[RegionLoad])
    val res = StochasticBalancer.balanceTable(skewed,
      log = Some(log), logTable = "tx").get
    val ds = log.decisions()
    assert(ds.nonEmpty && ds.head.table == "tx")
    assert(ds.head.initTotalCost == res.initCost &&
      ds.head.computedTotalCost == res.finalCost)
    assert(ds.map(_.regionPlans.size).sum == res.plans.size)
    assert(ds.head.regionPlans.forall(p =>
      p.startsWith("region: ") && p.contains(" , source: ") &&
        p.contains(" , destination: ")))

    val balanced = Map(
      "s0" -> (0 until 3).map(i => RegionLoad(f"b0-$i")),
      "s1" -> (0 until 3).map(i => RegionLoad(f"b1-$i")),
      "s2" -> (0 until 3).map(i => RegionLoad(f"b2-$i")))
    assert(StochasticBalancer.balanceTable(balanced,
      log = Some(log), logTable = "ty").isEmpty)
    val rj = log.rejections()
    assert(rj.nonEmpty && rj.head.table == "ty")
    assert(rj.head.reason.contains("minCostNeedBalance"))
    // active cost functions carry name*cost*multiplier info strings
    assert(rj.head.costFuncInfo.nonEmpty &&
      rj.head.costFuncInfo.forall(_.count(_ == '*') == 2))
    assert(rj.head.costFuncInfo.exists(
      _.startsWith("RegionCountSkewCostFunction")))
    // functions that are not needed (no rate windows, no tables, no
    // cache, no rules) stay out of the info list — isNeeded parity
    assert(!rj.head.costFuncInfo.exists(_.contains("CPRequest")) &&
      !rj.head.costFuncInfo.exists(_.contains("CacheAware")) &&
      !rj.head.costFuncInfo.exists(_.contains("Heterogeneous")))
  }

  test("no log, no recording — walks unchanged (parity)") {
    val skewed = Map(
      "s0" -> (0 until 9).map(i => RegionLoad(f"r$i")),
      "s1" -> Seq.empty[RegionLoad], "s2" -> Seq.empty[RegionLoad])
    val base = StochasticBalancer.balanceTable(skewed).get
    val logged = StochasticBalancer.balanceTable(skewed,
      log = Some(new BalancerLog()), logTable = "t").get
    assert(base.plans == logged.plans &&
      base.initCost == logged.initCost &&
      base.finalCost == logged.finalCost)
  }
}
