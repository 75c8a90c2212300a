package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.admin.StochasticBalancer
import graft.admin.StochasticBalancer.{RegionLoad, Weights}

/** StochasticLoadBalancer twin: cost math against the reference's
  * DoubleArrayCost formulas, greedy-walk invariants, determinism. */
class StochasticBalancerSpec extends AnyFunSuite {

  private def cluster(loads: Int*): Map[String, Seq[RegionLoad]] =
    loads.zipWithIndex.map { case (n, si) =>
      f"srv$si%02d" -> (0 until n).map(i => RegionLoad(f"s$si%02d-r$i%03d"))
    }.toMap

  private def finalCounts(a: Map[String, Seq[RegionLoad]],
      plans: Seq[graft.admin.Balancer.RegionPlan]): Map[String, Int] = {
    val c = collection.mutable.Map(a.map { case (s, r) => s -> r.size }.toSeq: _*)
    plans.foreach { p => c(p.source) -= 1; c(p.dest) += 1 }
    c.toMap
  }

  test("DoubleArrayCost skew formulas match the reference's closed forms") {
    // perfectly balanced → the min-skew floor → cost 0
    assert(StochasticBalancer.arrayCost(Array(4, 4, 4, 4)) == 0.0)
    // floor/ceil split IS the min skew → still 0
    assert(StochasticBalancer.arrayCost(Array(4, 4, 5)) == 0.0)
    // all load on one server → the max skew → cost 1
    assert(math.abs(StochasticBalancer.arrayCost(Array(12, 0, 0)) - 1.0) < 1e-9)
    // getMaxSkew closed form: total=12, servers=3 → sqrt(64+2*16)
    assert(math.abs(StochasticBalancer.maxSkew(12, 3) - math.sqrt(96)) < 1e-12)
    // getMinSkew, non-integer mean: 10 over 4 → two at 3, two at 2
    val m = StochasticBalancer.minSkew(10, 4)
    assert(math.abs(m - math.sqrt(2 * 0.25 + 2 * 0.25)) < 1e-12)
  }

  test("count-skewed cluster converges to the exact floor/ceil split") {
    val a = cluster(40, 25, 10, 3, 2) // 80 regions / 5 → 16 each
    val r = StochasticBalancer.balanceTable(a).get
    val out = finalCounts(a, r.plans)
    assert(out.values.forall(_ == 16), s"non-balanced end state: $out")
    assert(r.finalCost < r.initCost)
    // each accepted move strictly improved the cost
    assert(r.acceptedMoves >= 33) // the minimum productive-move count
  }

  test("already-balanced cluster is under the minCostNeedBalance gate") {
    assert(StochasticBalancer.balanceTable(cluster(16, 16, 16, 15)).isEmpty)
  }

  test("seeded determinism: same seed same plans, different seed may differ") {
    val a = cluster(30, 10, 8)
    val r1 = StochasticBalancer.balanceTable(a, seed = 7L).get
    val r2 = StochasticBalancer.balanceTable(a, seed = 7L).get
    assert(r1.plans == r2.plans && r1.finalCost == r2.finalCost)
  }

  test("size skew alone drives moves when counts are already balanced") {
    // equal counts, one server holding all the bytes — only the size
    // cost (and read cost 0) can motivate the walk
    val a = Map(
      "s0" -> (0 until 8).map(i => RegionLoad(s"a$i", sizeBytes = 1L << 30)),
      "s1" -> (0 until 8).map(i => RegionLoad(s"b$i", sizeBytes = 0L)),
      "s2" -> (0 until 8).map(i => RegionLoad(s"c$i", sizeBytes = 0L)))
    val r = StochasticBalancer.balanceTable(a,
      weights = Weights(regionCount = 500, sizeSkew = 500, readSkew = 0,
        move = 7)).get
    val bytes = collection.mutable.Map("s0" -> 0L, "s1" -> 0L, "s2" -> 0L)
    a.foreach { case (s, rs) => bytes(s) += rs.map(_.sizeBytes).sum }
    r.plans.foreach { p =>
      val sz = 1L << 30 // every sized region weighs the same here
      if (p.region.startsWith("a")) { bytes(p.source) -= sz; bytes(p.dest) += sz }
    }
    val vals = bytes.values.toSeq.sorted
    // 8 GiB over 3 servers: the walk must spread to a 3/3/2-ish split
    assert(vals.max - vals.min <= (1L << 30),
      s"size skew not balanced: $bytes")
    assert(r.finalCost < r.initCost)
  }

  test("dominant server locality pulls every region to its max-locality server") {
    // TestStochasticLoadBalancer.testLocalityCost shape: locality
    // fractions per (region, server); with the locality weight dominant
    // the converged invariant is placement at each region's max
    val a = Map(
      "s0" -> (0 until 6).map(i => RegionLoad(f"r$i")),
      "s1" -> Seq.empty[RegionLoad], "s2" -> Seq.empty[RegionLoad])
    val tab = (0 until 6).flatMap { i =>
      Seq((f"r$i", f"s${i % 3}") -> 0.9, (f"r$i", f"s${(i + 1) % 3}") -> 0.3)
    }.toMap
    val r = StochasticBalancer.balanceTable(a,
      weights = Weights(regionCount = 0, sizeSkew = 0, readSkew = 0,
        move = 7, locality = 500),
      locality = tab).get
    val placed = collection.mutable.Map((0 until 6).map(i => f"r$i" -> "s0"): _*)
    r.plans.foreach(p => placed(p.region) = p.dest)
    (0 until 6).foreach(i => assert(placed(f"r$i") == f"s${i % 3}",
      s"r$i not on its max-locality server: $placed"))
    assert(r.finalCost < r.initCost)
  }

  test("locality-less walks are unchanged: empty table drops the function (isNeeded)") {
    val a = Map(
      "s0" -> (0 until 9).map(i => RegionLoad(f"r$i")),
      "s1" -> Seq(RegionLoad("x1")), "s2" -> Seq.empty[RegionLoad])
    val base = StochasticBalancer.balanceTable(a).get
    val withEmpty = StochasticBalancer.balanceTable(a,
      locality = Map.empty).get
    assert(base.plans == withEmpty.plans &&
      base.initCost == withEmpty.initCost &&
      base.finalCost == withEmpty.finalCost)
  }

  test("rack locality steers placement at rack granularity") {
    // RackLocalityCostFunction: regions' blocks live on rack A or B;
    // with rack locality dominant each region must land on a server in
    // its rack (either server of the rack satisfies the cost)
    val a = Map(
      "s0" -> (0 until 8).map(i => RegionLoad(f"r$i")),
      "s1" -> Seq.empty[RegionLoad],
      "s2" -> Seq.empty[RegionLoad], "s3" -> Seq.empty[RegionLoad])
    val racks = Map("s0" -> "ra", "s1" -> "ra", "s2" -> "rb", "s3" -> "rb")
    val tab = (0 until 8).map { i =>
      (f"r$i", if (i % 2 == 0) "ra" else "rb") -> 1.0
    }.toMap
    val r = StochasticBalancer.balanceTable(a,
      weights = Weights(regionCount = 0, sizeSkew = 0, readSkew = 0,
        move = 7, rackLocality = 500),
      rackLocality = tab, serverRack = racks).get
    val placed = collection.mutable.Map((0 until 8).map(i => f"r$i" -> "s0"): _*)
    r.plans.foreach(p => placed(p.region) = p.dest)
    (0 until 8).foreach { i =>
      val rack = racks(placed(f"r$i"))
      assert(rack == (if (i % 2 == 0) "ra" else "rb"),
        s"r$i on wrong rack: $placed")
    }
  }

  test("rateOf is the reference's sliding-window mean-of-deltas with reset fallback") {
    // CostFromRegionLoadAsRateFunction.getRegionLoadCost closed forms
    assert(StochasticBalancer.rateOf(Nil) == 0.0)           // empty window
    assert(StochasticBalancer.rateOf(Seq(5.0)) == 0.0)      // single census
    assert(StochasticBalancer.rateOf(Seq(10, 25, 40)) == 15.0)
    // counter reset: current < previous contributes the absolute value
    assert(StochasticBalancer.rateOf(Seq(100, 140, 40)) == 40.0)
    assert(StochasticBalancer.rateOf(Seq(10, 4)) == 4.0)
  }

  test("write-rate skew alone drives moves when counts are balanced") {
    // counts are (4,4,4) — the count cost is silent; srv0's regions
    // are the only writers (rate 10 each via a real two-census delta)
    val a = Map(
      "s0" -> (0 until 4).map(i =>
        RegionLoad(f"hot-r$i", writesWindow = Seq(100L * i, 100L * i + 10))),
      "s1" -> (0 until 4).map(i =>
        RegionLoad(f"c1-r$i", writesWindow = Seq(50L, 50L))),
      "s2" -> (0 until 4).map(i =>
        RegionLoad(f"c2-r$i", writesWindow = Seq(80L, 80L))))
    val r = StochasticBalancer.balanceTable(a,
      weights = Weights(regionCount = 0, sizeSkew = 0, readSkew = 0,
        move = 7, writeRate = 500)).get
    val rates = collection.mutable.Map("s0" -> 40.0, "s1" -> 0.0,
      "s2" -> 0.0)
    r.plans.foreach { p =>
      if (p.region.startsWith("hot")) {
        rates(p.source) -= 10.0; rates(p.dest) += 10.0
      }
    }
    // four indivisible rate-10 writers over three servers: (20,10,10)
    assert(rates.values.toSeq.sorted == Seq(10.0, 10.0, 20.0),
      s"rate not balanced: $rates")
    assert(r.finalCost < r.initCost)
  }

  test("memstore-rate skew steers like the reference's MemStoreSizeCostFunction") {
    val a = Map(
      "s0" -> (0 until 4).map(i =>
        RegionLoad(f"m-r$i", memstoreMBWindow = Seq(64.0, 72.0))),
      "s1" -> (0 until 4).map(i =>
        RegionLoad(f"z1-r$i", memstoreMBWindow = Seq(16.0, 16.0))),
      "s2" -> (0 until 4).map(i =>
        RegionLoad(f"z2-r$i", memstoreMBWindow = Seq(8.0, 8.0))))
    val r = StochasticBalancer.balanceTable(a,
      weights = Weights(regionCount = 0, sizeSkew = 0, readSkew = 0,
        move = 7, memstoreRate = 500)).get
    val rates = collection.mutable.Map("s0" -> 32.0, "s1" -> 0.0,
      "s2" -> 0.0)
    r.plans.foreach { p =>
      if (p.region.startsWith("m-")) {
        rates(p.source) -= 8.0; rates(p.dest) += 8.0
      }
    }
    assert(rates.values.toSeq.sorted == Seq(8.0, 8.0, 16.0),
      s"memstore rate not balanced: $rates")
  }

  test("table skew balances each table across servers independently") {
    // two tables, each piled on its own server: globally mild, per-
    // table maximal skew — TableSkewCostFunction must spread BOTH
    val a = Map(
      "s0" -> (0 until 4).map(i => RegionLoad(f"a-r$i", table = "ta")),
      "s1" -> (0 until 4).map(i => RegionLoad(f"b-r$i", table = "tb")))
    val r = StochasticBalancer.balanceTable(a,
      weights = Weights(regionCount = 0, sizeSkew = 0, readSkew = 0,
        move = 7, tableSkew = 500)).get
    val placed = collection.mutable.Map(
      (0 until 4).flatMap(i => Seq(f"a-r$i" -> "s0", f"b-r$i" -> "s1")): _*)
    r.plans.foreach(p => placed(p.region) = p.dest)
    for (t <- Seq("a", "b"); s <- Seq("s0", "s1"))
      assert(placed.count { case (n, sv) =>
          n.startsWith(t) && sv == s } == 2,
        s"table $t not 2/2 across servers: $placed")
  }

  test("table isolation vetoes both mixing directions; walks converge around it") {
    // meta alone on s2; user regions piled on s0 — the count cost
    // would love to fill the underloaded meta server, the conditional
    // must forbid it (and forbid moving meta into the user pool)
    val a = Map(
      "s0" -> ((0 until 9).map(i => RegionLoad(f"u-r$i")) :+
        RegionLoad("x1")),
      "s1" -> Seq.empty[RegionLoad],
      "s2" -> Seq(RegionLoad("meta")))
    val r = StochasticBalancer.balanceTable(a,
      isolated = Set("meta")).get
    val placed = collection.mutable.Map[String, String](
      ((0 until 9).map(i => f"u-r$i" -> "s0") ++
        Seq("x1" -> "s0", "meta" -> "s2")): _*)
    r.plans.foreach(p => placed(p.region) = p.dest)
    assert(placed("meta") == "s2", "meta must not leave its server")
    assert(!placed.exists { case (n, sv) => n != "meta" && sv == "s2" },
      s"user region crossed onto the isolated server: $placed")
    // users balance over the two NON-isolated servers
    val userCounts = Seq("s0", "s1").map(sv =>
      placed.count { case (n, s) => n != "meta" && s == sv })
    assert(userCounts.sorted == Seq(5, 5), s"users not balanced: $placed")
  }

  test("isolation-less walks replay bit-identical (conditionals off)") {
    val a = cluster(40, 25, 10, 3, 2)
    val base = StochasticBalancer.balanceTable(a).get
    val off = StochasticBalancer.balanceTable(a,
      isolated = Set.empty).get
    assert(base.plans == off.plans && base.finalCost == off.finalCost)
  }

  test("rate/table-less walks replay bit-identical (isNeeded parity)") {
    val a = cluster(40, 25, 10, 3, 2)
    val base = StochasticBalancer.balanceTable(a).get
    // single-census windows have no rate (reference returns 0 before
    // the second census) — the function must stay out of the walk
    val single = a.view.mapValues(_.map(r =>
      r.copy(writesWindow = Seq(7L)))).toMap
    val withSingle = StochasticBalancer.balanceTable(single).get
    assert(base.plans == withSingle.plans &&
      base.initCost == withSingle.initCost &&
      base.finalCost == withSingle.finalCost)
  }

  test("cp-request-rate skew steers like CPRequestCostFunction") {
    // the write-rate fixture shape over the coprocessor counter:
    // counts balanced, only srv0's regions fire cp requests
    val a = Map(
      "s0" -> (0 until 4).map(i =>
        RegionLoad(f"cp-r$i", cpWindow = Seq(100L * i, 100L * i + 10))),
      "s1" -> (0 until 4).map(i =>
        RegionLoad(f"d1-r$i", cpWindow = Seq(50L, 50L))),
      "s2" -> (0 until 4).map(i =>
        RegionLoad(f"d2-r$i", cpWindow = Seq(80L, 80L))))
    val r = StochasticBalancer.balanceTable(a,
      weights = Weights(regionCount = 0, sizeSkew = 0, readSkew = 0,
        move = 7, cpRate = 500)).get
    val rates = collection.mutable.Map("s0" -> 40.0, "s1" -> 0.0,
      "s2" -> 0.0)
    r.plans.foreach { p =>
      if (p.region.startsWith("cp")) {
        rates(p.source) -= 10.0; rates(p.dest) += 10.0
      }
    }
    assert(rates.values.toSeq.sorted == Seq(10.0, 10.0, 20.0),
      s"cp rate not balanced: $rates")
  }

  test("store-file table skew balances each table's BYTES across servers") {
    // StoreFileTableSkewCostFunction: per-table counts AND global
    // sizes already balanced (tableSkew/sizeSkew silent), yet each
    // table's storefile MASS piles on one server — only the per-table
    // size cost sees it. Converged: each table's two 4000-byte stores
    // split across servers.
    val skewed = Map(
      "s0" -> Seq(RegionLoad("a-r0", sizeBytes = 4000L, table = "ta"),
        RegionLoad("a-r1", sizeBytes = 4000L, table = "ta"),
        RegionLoad("b-r0", sizeBytes = 0L, table = "tb"),
        RegionLoad("b-r1", sizeBytes = 0L, table = "tb")),
      "s1" -> Seq(RegionLoad("a-r2", sizeBytes = 0L, table = "ta"),
        RegionLoad("a-r3", sizeBytes = 0L, table = "ta"),
        RegionLoad("b-r2", sizeBytes = 4000L, table = "tb"),
        RegionLoad("b-r3", sizeBytes = 4000L, table = "tb")))
    val r = StochasticBalancer.balanceTable(skewed,
      weights = Weights(regionCount = 0, sizeSkew = 0, readSkew = 0,
        move = 7, tableSkew = 0, storeFileTableSkew = 500)).get
    val placed = collection.mutable.Map(
      skewed.toSeq.flatMap { case (sv, rs) =>
        rs.map(x => x.name -> sv) }: _*)
    r.plans.foreach(p => placed(p.region) = p.dest)
    assert(Seq("a-r0", "a-r1").map(placed).toSet.size == 2,
      s"ta's bytes still piled: $placed")
    assert(Seq("b-r2", "b-r3").map(placed).toSet.size == 2,
      s"tb's bytes still piled: $placed")
    assert(r.finalCost < r.initCost)
  }

  test("store-file table skew stays out without sizes (isNeeded parity)") {
    // q126's shape — tables but NO sizes — must not activate the
    // store-file table skew: if it wrongly joined the walk, changing
    // its weight would change sumMultiplier and every normalized cost
    val tabled = Map(
      "s0" -> (0 until 4).map(i => RegionLoad(f"a-r$i", table = "ta")),
      "s1" -> (0 until 4).map(i => RegionLoad(f"b-r$i", table = "tb")),
      "s2" -> Seq.empty[RegionLoad])
    val on = StochasticBalancer.balanceTable(tabled,
      weights = Weights(regionCount = 0, sizeSkew = 0, readSkew = 0,
        move = 7, tableSkew = 500, storeFileTableSkew = 500)).get
    val off = StochasticBalancer.balanceTable(tabled,
      weights = Weights(regionCount = 0, sizeSkew = 0, readSkew = 0,
        move = 7, tableSkew = 500, storeFileTableSkew = 0)).get
    assert(on.plans == off.plans && on.initCost == off.initCost &&
      on.finalCost == off.finalCost)
  }

  test("heterogeneous capacity rules: first match wins, linear fill to capacity share") {
    // HeterogeneousRegionCountCostFunction: srv00/srv01 capacity 10
    // (rule "srv0[01]", first match wins), srv02 capacity 40 (the
    // default); 18 regions piled on srv00. targetUsage = 18/60 = 0.3;
    // zero cost forces counts ≤ round(cap·0.3) = (3, 3, 12), and
    // 3+3+12 == 18, so the converged counts are EXACTLY the
    // capacity-proportional fill — the "fill all RegionServers
    // linearly" contract from the reference's own javadoc
    val a = cluster(18, 0, 0)
    val r = StochasticBalancer.balanceTable(a,
      weights = Weights(regionCount = 0, sizeSkew = 0, readSkew = 0,
        move = 7, heterogeneous = 500),
      heteroRules = Seq("srv0[01]" -> 10), heteroDefault = 40).get
    val out = finalCounts(a, r.plans)
    assert(out == Map("srv00" -> 3, "srv01" -> 3, "srv02" -> 12),
      s"not the capacity-proportional fill: $out")
    assert(r.finalCost < r.initCost)
    // rules-less walks replay bit-identical (isNeeded parity)
    val base = StochasticBalancer.balanceTable(cluster(40, 25, 10)).get
    val off = StochasticBalancer.balanceTable(cluster(40, 25, 10),
      heteroRules = Nil).get
    assert(base.plans == off.plans && base.finalCost == off.finalCost)
  }

  test("dominant cache ratio pulls every region to its best-cached server") {
    // CacheAwareLoadBalancer: regions fully cached on their home
    // server, all starting elsewhere; the cache cost + cache-aware
    // generators must home everything
    val a = Map(
      "s0" -> (0 until 6).map(i => RegionLoad(f"r$i", sizeBytes = 1L)),
      "s1" -> Seq.empty[RegionLoad], "s2" -> Seq.empty[RegionLoad])
    val ratio = (0 until 6).map(i => (f"r$i", f"s${i % 3}") -> 1.0).toMap
    val r = StochasticBalancer.balanceTable(a,
      weights = Weights(regionCount = 20, sizeSkew = 0, readSkew = 0,
        move = 7, cache = 500),
      cacheRatio = ratio).get
    val placed = collection.mutable.Map((0 until 6).map(i => f"r$i" -> "s0"): _*)
    r.plans.foreach(p => placed(p.region) = p.dest)
    (0 until 6).foreach(i => assert(placed(f"r$i") == f"s${i % 3}",
      s"r$i not on its best-cached server: $placed"))
    assert(r.finalCost < r.initCost)
    // cache-less walks replay bit-identical (isNeeded parity — also
    // pins that the generator set and its rnd stream are unchanged)
    val base = StochasticBalancer.balanceTable(cluster(40, 25, 10)).get
    val off = StochasticBalancer.balanceTable(cluster(40, 25, 10),
      cacheRatio = Map.empty).get
    assert(base.plans == off.plans && base.initCost == off.initCost &&
      base.finalCost == off.finalCost)
  }

  private def placement(a: Map[String, Seq[RegionLoad]],
      plans: Seq[graft.admin.Balancer.RegionPlan])
      : Map[String, String] = {
    val placed = collection.mutable.Map(
      a.toSeq.flatMap { case (sv, rs) => rs.map(_.name -> sv) }: _*)
    plans.foreach(p => placed(p.region) = p.dest)
    placed.toMap
  }

  test("co-hosted replicas separate even past the cost gate (needs-balance override)") {
    // four groups, each primary+secondary co-hosted on its own server:
    // counts are (2,2,2,2) — perfectly balanced, so WITHOUT the
    // replica-colocation override (areSomeRegionReplicasColocatedOnHost)
    // the walk would be refused at the minCostNeedBalance gate; with it
    // the RegionReplicaHostCostFunction must drive every group apart
    val a = (0 until 4).map { si =>
      s"s$si" -> Seq(RegionLoad(s"g$si-p"),
        RegionLoad(s"g$si-r1", primary = s"g$si-p"))
    }.toMap
    val r = StochasticBalancer.balanceTable(a).get
    val placed = placement(a, r.plans)
    (0 until 4).foreach { g =>
      assert(placed(s"g$g-p") != placed(s"g$g-r1"),
        s"group g$g still co-hosted: $placed")
    }
    assert(r.finalCost < r.initCost)
  }

  test("rack replica cost separates replicas across racks") {
    // two racks of two servers; each group's replicas on DIFFERENT
    // servers of the SAME rack — the host cost is already zero, only
    // RegionReplicaRackCostFunction sees the co-racking
    val a = Map(
      "s0" -> Seq(RegionLoad("ga-p"), RegionLoad("gb-p")),
      "s1" -> Seq(RegionLoad("ga-r1", primary = "ga-p"),
        RegionLoad("gb-r1", primary = "gb-p")),
      "s2" -> Seq(RegionLoad("pad0"), RegionLoad("pad1")),
      "s3" -> Seq(RegionLoad("pad2"), RegionLoad("pad3")))
    val racks = Map("s0" -> "ra", "s1" -> "ra", "s2" -> "rb", "s3" -> "rb")
    val r = StochasticBalancer.balanceTable(a, serverRack = racks).get
    val placed = placement(a, r.plans)
    for (g <- Seq("ga", "gb"))
      assert(racks(placed(s"$g-p")) != racks(placed(s"$g-r1")),
        s"group $g still co-racked: $placed")
    // and never re-co-hosted while fixing the rack
    for (g <- Seq("ga", "gb"))
      assert(placed(s"$g-p") != placed(s"$g-r1"))
  }

  test("primary-count skew balances PRIMARIES when totals are already even") {
    // counts (4,4) balanced; s0 piles four primaries, s1 holds two
    // secondaries + two replica-less regions — only
    // PrimaryRegionCountSkewCostFunction sees the pile. g2/g3 have no
    // secondary on s1, so their primaries can rebalance WITHOUT ever
    // co-hosting a group (g0/g1 are pinned by the dominant replicaHost
    // — un-pinning them would need the reference's SwapRegionsAction,
    // graft's documented moves-only divergence)
    val a = Map(
      "s0" -> (0 until 4).map(i => RegionLoad(s"g$i-p")),
      "s1" -> Seq(RegionLoad("g0-r1", primary = "g0-p"),
        RegionLoad("g1-r1", primary = "g1-p"),
        RegionLoad("f0"), RegionLoad("f1")))
    // the replica multipliers (100000/10000) dilute the normalized
    // total exactly like the reference's — a pure primary pile (no
    // co-location, no idle/sloppy counts) sits under the default gate
    // there too, so tune minCostNeedBalance down like an operator would
    val r = StochasticBalancer.balanceTable(a,
      weights = Weights(regionCount = 0, sizeSkew = 0, readSkew = 0,
        move = 7, primaryCount = 500),
      minCostNeedBalance = 0.001).get
    val placed = placement(a, r.plans)
    val prims = (0 until 4).map(i => s"g$i-p") ++ Seq("f0", "f1")
    val primsPerSrv = Seq("s0", "s1").map(sv =>
      prims.count(placed(_) == sv))
    assert(primsPerSrv.sorted == Seq(3, 3),
      s"primaries not balanced: $placed")
    Seq(0, 1).foreach(i =>
      assert(placed(s"g$i-p") != placed(s"g$i-r1"),
        s"g$i co-hosted while balancing primaries: $placed"))
  }

  test("replica-less walks replay bit-identical (isNeeded parity incl. the conditional)") {
    val a = cluster(40, 25, 10, 3, 2)
    val base = StochasticBalancer.balanceTable(a).get
    // the conditional ON over a replica-less cluster must not change
    // the generator set, the veto, or the rnd stream
    val cond = StochasticBalancer.balanceTable(a,
      distributeReplicas = true).get
    assert(base.plans == cond.plans && base.initCost == cond.initCost &&
      base.finalCost == cond.finalCost)
  }

  test("DistributeReplicasConditional: repair generator un-hosts, veto never re-hosts") {
    // every group piled on s0 (counts 8/0/0/0 — passes the gate on
    // count skew alone); with the conditional on, the stochastic
    // replica generators are swapped for the repair generator and the
    // veto forbids ANY move that would co-host a group
    val a = Map(
      "s0" -> (0 until 4).flatMap(i => Seq(RegionLoad(s"g$i-p"),
        RegionLoad(s"g$i-r1", primary = s"g$i-p"))),
      "s1" -> Seq.empty[RegionLoad], "s2" -> Seq.empty[RegionLoad],
      "s3" -> Seq.empty[RegionLoad])
    val r = StochasticBalancer.balanceTable(a,
      distributeReplicas = true).get
    val placed = placement(a, r.plans)
    (0 until 4).foreach(i =>
      assert(placed(s"g$i-p") != placed(s"g$i-r1"),
        s"g$i still co-hosted under the conditional: $placed"))
    // replay the plans in order: NO intermediate state may co-host
    // (the veto is per-move, not just end-state)
    val where = collection.mutable.Map(
      a.toSeq.flatMap { case (sv, rs) => rs.map(_.name -> sv) }: _*)
    r.plans.foreach { p =>
      where(p.region) = p.dest
      // p.dest gaining p.region must not create a same-group pair —
      // except groups that started co-hosted and haven't split yet
      val grp = (n: String) => n.take(2)
      val dups = where.groupBy { case (n, sv) => (grp(n), sv) }
        .filter(_._2.size > 1).keys
      dups.foreach { case (g, sv) =>
        assert(sv == "s0", s"conditional re-co-hosted $g on $sv mid-walk")
      }
    }
  }

  test("incremental cost bookkeeping matches a from-scratch recomputation") {
    // walk 1 maintains every cost term (counts, sizes, replica
    // co-location, primaries) through O(1) per-move deltas; re-entering
    // the walk on the CONVERGED placement computes the same terms from
    // scratch — its initCost must equal walk 1's finalCost, or a delta
    // (apply or undo) drifted. Replica fixture with racks so the new
    // (c-1)^2 host/rack deltas and primCounts are all in play.
    val a = Map(
      "s0" -> ((0 until 4).flatMap(i => Seq(RegionLoad(s"g$i-p"),
        RegionLoad(s"g$i-r1", primary = s"g$i-p"))) ++
        Seq(RegionLoad("f0"), RegionLoad("f1"))),
      "s1" -> Seq(RegionLoad("f2")),
      "s2" -> Seq.empty[RegionLoad],
      "s3" -> Seq.empty[RegionLoad])
    val racks = Map("s0" -> "ra", "s1" -> "ra", "s2" -> "rb", "s3" -> "rb")
    // move weight 0 in BOTH walks: the MoveCostFunction term counts
    // moves made THIS run (zero at any walk's entry by definition), so
    // it is the one term that legitimately differs between the two
    val w = Weights(move = 0.0)
    val r1 = StochasticBalancer.balanceTable(a, weights = w,
      serverRack = racks).get
    val after = {
      val placed = placement(a, r1.plans)
      val regions = a.values.flatten.map(r => r.name -> r).toMap
      placed.toSeq.groupBy(_._2).map { case (sv, rs) =>
        sv -> rs.map { case (name, _) => regions(name) }.sortBy(_.name)
      } ++ a.keys.filterNot(placed.values.toSet).map(_ -> Seq.empty[RegionLoad])
    }
    val r2 = StochasticBalancer.balanceTable(after, weights = w,
      serverRack = racks, minCostNeedBalance = -1.0, maxSteps = 1).get
    assert(math.abs(r2.initCost - r1.finalCost) < 1e-9,
      s"delta drift: scratch ${r2.initCost} vs incremental ${r1.finalCost}")
  }

  test("conditional forces repair of a violation sitting under the cost gate") {
    // 50 groups over 4 servers, counts in the sloppy band, exactly ONE
    // co-hosted pair: its normalized cost (100000/50 over a ~101k
    // multiplier sum) is ~0.02 < minCostNeedBalance, so without the
    // shouldRunBalancer substitute (BalancerConditionals:82-86 — run
    // while the repair generator has an actionable move) the walk
    // would refuse and the violation would persist forever
    val a = {
      val perServer = Array.fill(4)(
        collection.mutable.Buffer.empty[RegionLoad])
      perServer(0) += RegionLoad("g00-p")
      perServer(0) += RegionLoad("g00-s", primary = "g00-p")
      (1 until 50).foreach { i =>
        perServer(i % 4) += RegionLoad(f"g$i%02d-p")
        perServer((i + 2) % 4) += RegionLoad(f"g$i%02d-s",
          primary = f"g$i%02d-p")
      }
      perServer.zipWithIndex.map { case (b, si) => s"s$si" -> b.toSeq }.toMap
    }
    val r = StochasticBalancer.balanceTable(a, distributeReplicas = true)
    assert(r.isDefined, "the conditional must force a run past the gate")
    val placed = placement(a, r.get.plans)
    assert(placed("g00-p") != placed("g00-s"),
      s"the under-gate violation was not repaired: ${r.get.plans}")
  }

  test("orphan secondaries with racks declared do not crash the replica generators") {
    // every declared primary is absent (decommissioned server): groups
    // are all singletons, so the rack CO-LOCATION machinery has no
    // work — but the generator wheel still includes the replica pair
    // and must fall back instead of indexing empty rack state
    val a = Map(
      "s0" -> Seq(RegionLoad("r1-s", primary = "r1-p"),
        RegionLoad("r2-s", primary = "r2-p"),
        RegionLoad("r3-s", primary = "r3-p")),
      "s1" -> Seq.empty[RegionLoad])
    val racks = Map("s0" -> "ra", "s1" -> "rb")
    val r = StochasticBalancer.balanceTable(a, serverRack = racks)
    assert(r.isDefined) // idle server forces the run; no crash is the point
  }

  test("replica-less walks accept a partial serverRack (locality callers)") {
    // serverRack is also the rack-locality input, where partial maps
    // were always legal; replica rack accounting must not eagerly
    // demand full coverage on walks that never read it
    val a = cluster(40, 25, 10, 3, 2)
    val base = StochasticBalancer.balanceTable(a).get
    val partial = StochasticBalancer.balanceTable(a,
      serverRack = Map("s0" -> "ra")).get
    assert(base.plans == partial.plans)
  }

  test("rack-level conditional veto blocks same-rack landings when racks suffice") {
    // 2 racks x 2 servers, one group of 2: primary on s0 (rack ra).
    // maxReplicas(2) <= numRacks(2) → the rack veto is live: moving the
    // secondary from s2 (rack rb) to s1 (rack ra, same rack as the
    // primary, different server) must be vetoed — the walk may move it
    // to s3 (rb) or leave it, but never land it in ra
    val a = Map(
      "s0" -> (Seq(RegionLoad("g0-p")) ++
        (0 until 6).map(i => RegionLoad(s"pad$i"))),
      "s1" -> Seq.empty[RegionLoad],
      "s2" -> Seq(RegionLoad("g0-r1", primary = "g0-p")),
      "s3" -> Seq.empty[RegionLoad])
    val racks = Map("s0" -> "ra", "s1" -> "ra", "s2" -> "rb", "s3" -> "rb")
    val r = StochasticBalancer.balanceTable(a, serverRack = racks,
      distributeReplicas = true).get
    val placed = placement(a, r.plans)
    assert(racks(placed("g0-r1")) == "rb",
      s"secondary landed in the primary's rack: $placed")
  }

  test("weighted cache ratio keeps a well-cached region put (ratioThreshold)") {
    // a region already cached >= 0.8 on its current server must not be
    // proposed by the cache generator even when another server is
    // fractionally better... and one below 0.8 with best == current
    // ratio must also stay (no self-move): only the genuinely
    // poorly-cached region moves
    val a = Map(
      "s0" -> Seq(RegionLoad("warm", sizeBytes = 1L),
        RegionLoad("cold", sizeBytes = 1L)),
      "s1" -> Seq(RegionLoad("pad0", sizeBytes = 1L)),
      "s2" -> Seq(RegionLoad("pad1", sizeBytes = 1L)))
    val ratio = Map(
      ("warm", "s0") -> 0.85, ("warm", "s1") -> 0.9, // warm stays: 0.85 >= 0.8
      ("cold", "s2") -> 1.0) // cold homes to s2
    val r = StochasticBalancer.balanceTable(a,
      weights = Weights(regionCount = 0, sizeSkew = 0, readSkew = 0,
        move = 7, cache = 500),
      cacheRatio = ratio)
    // the walk may be under the gate if only a sliver of cache cost
    // remains; either way warm must never move
    r.foreach(_.plans.foreach(p => assert(p.region != "warm",
      s"well-cached region moved: ${p}")))
    val placedCold = r.map(_.plans.collectFirst {
      case p if p.region == "cold" => p.dest })
    assert(r.isEmpty || placedCold.exists(_.contains("s2")) ||
      r.get.plans.isEmpty,
      s"cold should home to s2 when the walk runs: ${r.map(_.plans)}")
  }
}
