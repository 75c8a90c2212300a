package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.admin.{Balancer, RSGroups}
import graft.admin.Balancer.RegionInfo
import graft.admin.RSGroups.Registry

/** RSGroup registry constraints (RSGroupInfoManagerImpl) and the
  * group-constrained balancing wrapper (RSGroupBasedLoadBalancer):
  * misplaced homing, within-group convergence, zero boundary
  * crossings. */
class RSGroupsSpec extends AnyFunSuite {

  private def reg0 = Registry(Set("a1", "a2", "b1", "b2", "b3", "d1"))
    .addRSGroup("ga").addRSGroup("gb")
    .moveServers(Set("a1", "a2"), "default", "ga")
    .moveServers(Set("b1", "b2", "b3"), "default", "gb")
    .setTableGroup("ta", "ga").setTableGroup("tb", "gb")

  test("the default group derives: every server no named group claims") {
    val r = reg0
    assert(r.defaultServers == Set("d1"))
    assert(r.serversOf("ga") == Set("a1", "a2"))
    assert(r.groupOfServer("b2") == "gb")
    assert(r.groupOfServer("d1") == "default")
    assert(r.groupOfTable("ta") == "ga")
    assert(r.groupOfTable("unbound") == "default")
    assert(r.listRSGroups == Seq("default", "ga", "gb"))
  }

  test("addRSGroup refuses duplicates and the reserved default name") {
    intercept[IllegalArgumentException](reg0.addRSGroup("ga"))
    intercept[IllegalArgumentException](reg0.addRSGroup("default"))
    intercept[IllegalArgumentException](reg0.addRSGroup("bad name"))
  }

  test("removeRSGroup refuses while servers or table bindings remain") {
    intercept[IllegalArgumentException](reg0.removeRSGroup("ga")) // servers
    val drained = reg0.moveServers(Set("a1", "a2"), "ga", "default")
    intercept[IllegalArgumentException](drained.removeRSGroup("ga")) // ta
    val unbound = drained.setTableGroup("ta", "default")
    assert(!unbound.removeRSGroup("ga").groups.contains("ga"))
    intercept[IllegalArgumentException](reg0.removeRSGroup("default"))
    intercept[IllegalArgumentException](reg0.removeRSGroup("nope"))
  }

  test("moveServers moves between pools; default releases/claims") {
    val r = reg0.moveServers(Set("b3"), "gb", "ga")
    assert(r.serversOf("ga") == Set("a1", "a2", "b3"))
    assert(r.serversOf("gb") == Set("b1", "b2"))
    // not in src group → refused
    intercept[IllegalArgumentException](
      reg0.moveServers(Set("d1"), "ga", "gb"))
    val released = r.moveServers(Set("b3"), "ga", "default")
    assert(released.defaultServers == Set("d1", "b3"))
  }

  test("balanceCluster: misplaced home first, groups converge, zero crossings") {
    val r = reg0
    // ta piled on a1 with one region astray on b1 (gb's server);
    // tb piled on b1 with one astray on d1 (default's server);
    // tc (unbound → default) entirely astray on a2
    val load = Map(
      "ta" -> Map(
        "a1" -> (0 until 7).map(i => RegionInfo(f"ta-r$i%02d", i.toLong)),
        "b1" -> Seq(RegionInfo("ta-r07", 7L))),
      "tb" -> Map(
        "b1" -> (0 until 8).map(i => RegionInfo(f"tb-r$i%02d", i.toLong)),
        "d1" -> Seq(RegionInfo("tb-r08", 8L))),
      "tc" -> Map(
        "a2" -> (0 until 3).map(i => RegionInfo(f"tc-r$i%02d", i.toLong))))
    val rep = RSGroups.balanceCluster(r, load, slop = 0.0)
    // homing: exactly the three astray sets, each landing in-group
    assert(rep.misplacedPlans.map(_.region).sorted ==
      Seq("ta-r07", "tb-r08", "tc-r00", "tc-r01", "tc-r02"))
    rep.misplacedPlans.foreach { p =>
      val table = p.region.takeWhile(_ != '-')
      assert(r.groupOfServer(p.dest) == r.groupOfTable(table),
        s"homed ${p.region} outside its group: ${p.dest}")
    }
    // end state: every region inside its group, floor/ceil per group
    val counts = collection.mutable.Map.empty[String, Int]
    rep.finalAssignment.foreach { case (sv, rs) =>
      counts(sv) = rs.size
      rs.foreach { ri =>
        val table = ri.name.takeWhile(_ != '-')
        assert(r.groupOfServer(sv) == r.groupOfTable(table),
          s"${ri.name} ended on $sv outside group ${r.groupOfTable(table)}")
      }
    }
    assert(counts("a1") == 4 && counts("a2") == 4) // 8 ta over ga's 2
    assert(Seq("b1", "b2", "b3").map(counts).sorted == Seq(3, 3, 3))
    assert(counts("d1") == 3) // default's lone server holds all tc
    // total conserved: 8 ta + 9 tb + 3 tc
    assert(counts.values.sum == 20)
  }

  test("balanceCluster: a group with no servers is refused (no fallback)") {
    val r = Registry(Set("x1")).addRSGroup("empty")
      .setTableGroup("t", "empty")
    intercept[IllegalArgumentException](RSGroups.balanceCluster(r,
      Map("t" -> Map("x1" -> Seq(RegionInfo("t-r0", 0L))))))
  }

  test("balanceCluster: the stochastic walk plugs in as the internal balancer") {
    import graft.admin.StochasticBalancer
    import graft.admin.StochasticBalancer.RegionLoad
    val r = reg0
    // ta: 12 regions piled on a1 — the stochastic walk must land the
    // 6/6 split within ga, and still never cross the group boundary
    val load = Map("ta" -> Map(
      "a1" -> (0 until 12).map(i => RegionInfo(f"ta-r$i%02d", i.toLong))))
    val rep = RSGroups.balanceCluster(r, load,
      internal = a => StochasticBalancer.balanceTable(
          a.view.mapValues(_.map(ri => RegionLoad(ri.name))).toMap)
        .map(_.plans).getOrElse(Nil))
    val counts = rep.finalAssignment.view.mapValues(_.size).toMap
    assert(counts == Map("a1" -> 6, "a2" -> 6), s"not converged: $counts")
    rep.finalAssignment.foreach { case (sv, _) =>
      assert(r.groupOfServer(sv) == "ga") }
  }

  test("balanceCluster: an in-place balanced cluster produces no plans") {
    val r = reg0
    val load = Map("ta" -> Map(
      "a1" -> Seq(RegionInfo("ta-r0", 0L), RegionInfo("ta-r1", 1L)),
      "a2" -> Seq(RegionInfo("ta-r2", 2L), RegionInfo("ta-r3", 3L))))
    val rep = RSGroups.balanceCluster(r, load, slop = 0.0)
    assert(rep.misplacedPlans.isEmpty && rep.groupPlans.isEmpty)
    assert(rep.finalAssignment.view.mapValues(_.size).toMap ==
      Map("a1" -> 2, "a2" -> 2))
  }
}
