package graft.admin

import scala.collection.mutable

/** SimpleLoadBalancer twin (hbase-balancer/.../SimpleLoadBalancer.java:
  * 204-470, BaseLoadBalancer slop check :167-174): balance one table's
  * region count across servers so every server ends within
  * [MIN = ⌊avg⌋, MAX = ⌈avg⌉], moving as few regions as possible.
  *
  * The passes mirror the reference:
  *  1. slop gate — already-balanced clusters (max ≤ ⌈avg·(1+slop)⌉ and
  *     min ≥ ⌊avg·(1−slop)⌋) return no plans;
  *  2. walk most-loaded servers shedding down to MAX, NEWEST regions
  *     first (RegionInfoComparator — descending regionId);
  *  3. walk least-loaded servers filling to MIN, one region per server
  *     per round;
  *  4. if fills still run short, shed ONE more from each most-loaded
  *     (meta regions never move — SimpleLoadBalancer.java:389);
  *  5. leftover sheds go to the least-loaded servers up to MAX
  *     (balanceOverall).
  *
  * Deliberate divergence, documented: the reference SHUFFLES the
  * underloaded-server list and ping-pongs the fill direction so that
  * young regions spread differently across successive master calls
  * (HBASE-3609). An engine twin must be replayable, so fills walk the
  * underloaded servers in (load, name) order and the move queue drains
  * in region-name order — same invariants, deterministic plans.
  */
object Balancer {

  final case class RegionInfo(name: String, id: Long,
      isMeta: Boolean = false)

  final case class RegionPlan(region: String, source: String, dest: String)

  /** BaseLoadBalancer:167-174 — false when every load sits inside the
    * slop band around the average. */
  def needsBalance(loads: Iterable[Int], slop: Double = 0.2): Boolean = {
    if (loads.isEmpty) return false
    val avg = loads.sum.toDouble / loads.size
    val floor = math.floor(avg * (1 - slop)).toInt
    val ceiling = math.ceil(avg * (1 + slop)).toInt
    !(loads.max <= ceiling && loads.min >= floor)
  }

  /** One balanceTable pass. Returns the move plans (possibly empty). */
  def balanceTable(assignment: Map[String, Seq[RegionInfo]],
      slop: Double = 0.2): Seq[RegionPlan] = {
    val loads = assignment.map { case (s, rs) => s -> rs.size }
    if (!needsBalance(loads.values, slop)) return Nil
    val numRegions = loads.values.sum
    val numServers = assignment.size
    val avg = numRegions.toDouble / numServers
    val minL = avg.toInt // floor
    val maxL = math.ceil(avg).toInt

    // ServerAndLoad order: (load, name) ascending; the overloaded walk
    // descends it
    val byLoadAsc = assignment.keys.toSeq.sortBy(s => (loads(s), s))
    val byLoadDesc = byLoadAsc.reverse

    // region-name-ordered move queue. DIVERGENCE from the reference's
    // rpComparator ((source, region, dest) — RegionPlan.compareTo
    // :107-124): the per-table queue drains by region name alone, an
    // order q112's oracle replays and pins; [[balanceTableOverall]]
    // keys its queue (source, region) to match the comparator exactly.
    // Same move SET either way — only which concrete region fills
    // which slot differs, and each is oracle/spec-pinned in its place.
    val toMove = mutable.SortedMap.empty[String, RegionPlan]
    // how many regions each server has shed so far (= position in its
    // newest-first shed order), and the net count change per server
    val shed = mutable.Map.empty[String, Int].withDefaultValue(0)
    val delta = mutable.Map.empty[String, Int].withDefaultValue(0)
    def current(s: String): Int = loads(s) + delta(s)
    // newest-first shed order per server (id desc, name tiebreak)
    val shedOrder: Map[String, Seq[RegionInfo]] =
      assignment.map { case (s, rs) => s -> rs.sortBy(r => (-r.id, r.name)) }

    def shedOne(s: String): Boolean = {
      val order = shedOrder(s)
      var idx = shed(s)
      while (idx < order.size && order(idx).isMeta) idx += 1
      if (idx >= order.size) return false
      toMove(order(idx).name) = RegionPlan(order(idx).name, s, "")
      shed(s) = idx + 1
      delta(s) -= 1
      true
    }

    // pass 2: shed overloaded down to MAX
    for (s <- byLoadDesc if loads(s) > maxL) {
      val n = math.min(loads(s) - maxL, assignment(s).size)
      (0 until n).foreach(_ => shedOne(s))
    }

    val plans = mutable.ArrayBuffer.empty[RegionPlan]
    def assignOne(dest: String): Boolean = toMove.headOption match {
      case Some((name, p)) =>
        toMove.remove(name)
        plans += p.copy(dest = dest)
        delta(dest) += 1
        true
      case None => false
    }

    // pass 3: fill underloaded to MIN, round-robin one per round
    val underloaded = byLoadAsc.filter(s => loads(s) < minL)
    var progressed = true
    while (progressed && toMove.nonEmpty) {
      progressed = false
      for (s <- underloaded if current(s) < minL && toMove.nonEmpty)
        if (assignOne(s)) progressed = true
    }

    // pass 4: still-short fills shed ONE more from each most-loaded
    var needed = underloaded.map(s => math.max(0, minL - current(s))).sum
    if (needed > 0) {
      for (s <- byLoadDesc if needed > 0 && current(s) > minL)
        if (shedOne(s)) needed -= 1
      for (s <- underloaded if current(s) < minL)
        while (current(s) < minL && toMove.nonEmpty) assignOne(s)
    }

    // pass 5 (balanceOverall): leftovers go to the least-loaded up to
    // MAX, one each per round
    while (toMove.nonEmpty) {
      val candidates = byLoadAsc
        .filter(s => current(s) < maxL)
        .sortBy(s => (current(s), s))
      if (candidates.isEmpty)
        // every server is at MAX — return what we have (the reference
        // logs the leftover and returns its partial plan list)
        return plans.toSeq
      candidates.foreach(s => if (toMove.nonEmpty) assignOne(s))
    }
    plans.toSeq
  }

  /** SimpleLoadBalancer's CLUSTER-OVERALL mode — the default
    * `hbase.master.loadbalance.bytable=false` deployment
    * (SimpleLoadBalancer.java:115-129 setClusterLoad, :166-182
    * overallNeedsBalance, :458-606 balanceOverall): every table is
    * balanced to its own [⌊avg⌋, ⌈avg⌉] band, AND a shared cluster-wide
    * per-server load list steers each table's ⌈avg⌉-vs-⌊avg⌋ slack
    * toward the servers the whole CLUSTER loads least. A table runs
    * when its own servers are idle/sloppy (BaseLoadBalancer
    * .needsBalance) OR the cluster totals breach the overall slop band
    * (overallNeedsBalance) — which is how a cluster that is perfectly
    * balanced PER TABLE still drains its piled servers (the reference's
    * own testImpactOfBalanceClusterOverall shape: five tables each
    * even on five of six servers, s6 empty).
    *
    * Per table, after the per-table shed/fill passes, balanceOverall:
    *  1. fold the table's net count changes into the cluster totals;
    *  2. peel ONE region from every server sitting at the table's MAX
    *     (the ⌈avg⌉/⌊avg⌋ slack — SimpleLoadBalancer.java:489-504);
    *  3. order servers by cluster-wide load; the peels go to the n
    *     least-loaded (n = peel count), except that a peel whose SOURCE
    *     is itself among those n is dropped (un-peeled) rather than
    *     shuffled sideways (:552-576);
    *  4. a new plan landing where an earlier plan SOURCED resolves the
    *     cyclic pair: A→B then B→C rewrites to A→C (:585-599).
    *
    * Deterministic divergences (same class as [[balanceTable]]'s,
    * documented): the reference iterates a HashMap-ordered server list
    * and breaks load ties by that insertion order — graft iterates and
    * tie-breaks by server name; the reference's per-table fill shuffles
    * (see [[balanceTable]]).
    *
    * `loadOfAllTables` maps table → server → regions; servers a table
    * does not reach are treated as holding none of it (the union of
    * all tables' servers is the cluster). `overallSlop < 0` falls back
    * to `slop` (the hbase.regions.overallSlop default). Returns the
    * plans per table, tables with no moves omitted. */
  def balanceCluster(
      loadOfAllTables: Map[String, Map[String, Seq[RegionInfo]]],
      slop: Double = 0.2, overallSlop: Double = -1.0)
      : Map[String, Seq[RegionPlan]] = {
    val oSlop = if (overallSlop < 0) slop else overallSlop
    val servers = loadOfAllTables.values.flatMap(_.keys).toSeq.distinct.sorted
    if (servers.size < 2) return Map.empty
    // setClusterLoad: cluster-wide totals + the FIXED overall average
    val totals = mutable.Map.empty[String, Int]
    servers.foreach(s => totals(s) = 0)
    loadOfAllTables.values.foreach(_.foreach { case (s, rs) =>
      totals(s) += rs.size
    })
    // overallNeedsBalance is [[needsBalance]] over the live totals:
    // the total region count is invariant at table boundaries (every
    // peel is un-peeled or assigned), so the recomputed average equals
    // the reference's avgLoadOverall fixed at setClusterLoad time
    def overallNeedsBalance: Boolean = needsBalance(totals.values, oSlop)

    val out = Map.newBuilder[String, Seq[RegionPlan]]
    for ((table, declared) <- loadOfAllTables.toSeq.sortBy(_._1)) {
      val loads: Map[String, Int] =
        servers.map(s => s -> declared.get(s).fold(0)(_.size)).toMap
      // BaseLoadBalancer.needsBalance: idle server (one empty while
      // another holds >1) or sloppy counts; OR the cluster-level gate
      val idle = loads.values.exists(_ == 0) && loads.values.exists(_ > 1)
      if ((idle || needsBalance(loads.values, slop)) || overallNeedsBalance) {
        val plansT = balanceTableOverall(declared, loads, servers, totals)
        if (plansT.nonEmpty) out += table -> plansT
      }
    }
    out.result()
  }

  /** One table's pass under [[balanceCluster]]: the per-table
    * shed/fill of [[balanceTable]] plus the balanceOverall step that
    * consumes the shared cluster `totals` (mutated in place). */
  private def balanceTableOverall(declared: Map[String, Seq[RegionInfo]],
      loads: Map[String, Int], servers: Seq[String],
      totals: mutable.Map[String, Int]): Seq[RegionPlan] = {
    val numRegions = loads.values.sum
    val avg = numRegions.toDouble / servers.size
    val minL = avg.toInt // floor
    val maxL = math.ceil(avg).toInt
    val byLoadAsc = servers.sortBy(s => (loads(s), s))
    val byLoadDesc = byLoadAsc.reverse

    // rpComparator twin: the move queue drains (source, region)-least
    // first (RegionPlan.compareTo:107-124 — source server, then region)
    val toMove = mutable.SortedSet.empty[(String, String)]
    val shed = mutable.Map.empty[String, Int].withDefaultValue(0)
    val delta = mutable.Map.empty[String, Int].withDefaultValue(0)
    def current(s: String): Int = loads(s) + delta(s)
    val shedOrder: Map[String, Seq[RegionInfo]] =
      servers.map(s =>
        s -> declared.get(s).fold(Seq.empty[RegionInfo])(
          _.sortBy(r => (-r.id, r.name)))).toMap

    def shedOne(s: String): Boolean = {
      val order = shedOrder(s)
      var idx = shed(s)
      while (idx < order.size && order(idx).isMeta) idx += 1
      if (idx >= order.size) return false
      toMove += ((s, order(idx).name))
      shed(s) = idx + 1
      delta(s) -= 1
      true
    }

    val plans = mutable.ArrayBuffer.empty[RegionPlan]
    def assignOne(dest: String): Boolean = toMove.headOption match {
      case Some(key @ (src, region)) =>
        toMove.remove(key)
        plans += RegionPlan(region, src, dest)
        delta(dest) += 1
        true
      case None => false
    }

    // shed overloaded to MAX
    for (s <- byLoadDesc if loads(s) > maxL) {
      val n = math.min(loads(s) - maxL, shedOrder(s).size)
      (0 until n).foreach(_ => shedOne(s))
    }
    // fill underloaded to MIN, round-robin
    val underloaded = byLoadAsc.filter(s => loads(s) < minL)
    var progressed = true
    while (progressed && toMove.nonEmpty) {
      progressed = false
      for (s <- underloaded if current(s) < minL && toMove.nonEmpty)
        if (assignOne(s)) progressed = true
    }
    // still-short fills shed ONE more from each most-loaded
    var needed = underloaded.map(s => math.max(0, minL - current(s))).sum
    if (needed > 0) {
      for (s <- byLoadDesc if needed > 0 && current(s) > minL)
        if (shedOne(s)) needed -= 1
      for (s <- underloaded if current(s) < minL)
        while (current(s) < minL && toMove.nonEmpty) assignOne(s)
    }

    if (minL == maxL) {
      // perfectly divisible table: no ⌈avg⌉ slack to steer — the
      // reference skips balanceOverall entirely (and with it the
      // totals fold, mirrored here)
      return plans.toSeq
    }

    // balanceOverall step 1+2: fold this table's deltas into the
    // cluster totals, then peel one region from every server at MAX.
    // The fold and the should-not-happen guard run to completion
    // BEFORE any peel (divergence from the reference's interleaved
    // loop, in the abort branch only): an abort must leave the shared
    // totals fully folded and peel-free, or every later table in the
    // same balanceCluster call balances against corrupt counts.
    for (s <- servers) totals(s) += delta(s)
    for (s <- servers) {
      val tableCount = loads(s) + delta(s)
      if (tableCount > maxL || tableCount < minL) {
        // the reference's should-not-happen guard: stop this table
        // (reachable in graft when an overloaded server's regions are
        // all meta — shedOne skips them and the count stays over MAX)
        return plans.toSeq
      }
    }
    for (s <- servers if loads(s) + delta(s) == maxL) {
      // the peel honors the meta skip like every other shed (the
      // reference's balanceOverall does not check isMetaRegion — a
      // divergence in favor of graft's own documented invariant)
      var idx = shed(s)
      val order = shedOrder(s)
      while (idx < order.size && order(idx).isMeta) idx += 1
      if (idx < order.size) {
        toMove += ((s, order(idx).name))
        totals(s) -= 1
      }
    }
    // cyclic-pair candidates: only the plans that existed BEFORE this
    // balanceOverall assignment round (the reference builds returnMap
    // at :560-568 from regionsToReturn as-of entry), newest-first,
    // each usable once
    val returnIdx = mutable.Map.empty[String, mutable.ArrayBuffer[Int]]
    plans.indices.foreach(j =>
      returnIdx.getOrElseUpdate(plans(j).dest,
        mutable.ArrayBuffer.empty[Int]) += j)
    // step 3: cluster-wide least-loaded order, FIXED here (step 4's
    // un-peels adjust loads but never re-rank — the reference sorts
    // once and indexes into the sorted list)
    val ordered = servers.sortBy(s => (totals(s), s))
    val posOf = ordered.zipWithIndex.toMap
    val assignLength = toMove.size
    // step 4: a peel whose source is itself among the n least-loaded
    // is dropped (first peel per such source), its count restored
    val sources = mutable.Set.empty[String]
    val unpeel = mutable.ArrayBuffer.empty[(String, String)]
    for (key @ (src, _) <- toMove.toSeq) {
      val first = sources.add(src)
      if (posOf(src) < assignLength && first) {
        unpeel += key
        totals(src) += 1
      }
    }
    unpeel.foreach(toMove -= _)
    // step 5: assign the surviving peels to the least-loaded
    // non-source slots, resolving cyclic pairs as they appear
    for (i <- 0 until assignLength) {
      val sv = ordered(i)
      if (!sources.contains(sv) && toMove.nonEmpty) {
        assignOne(sv)
        totals(sv) += 1
        val last = plans.last
        returnIdx.get(last.source).filter(_.nonEmpty).foreach { pos =>
          val j = pos.remove(pos.size - 1)
          plans(j) = plans(j).copy(dest = last.dest)
          plans.remove(plans.size - 1)
        }
      }
    }
    plans.toSeq
  }

  /** MaintenanceLoadBalancer twin (hbase-server/.../balancer/
    * MaintenanceLoadBalancer.java:62-99) — the balancer a cluster runs
    * in maintenance mode, where exactly one server is up and only
    * SYSTEM tables may be served: balancing is a no-op (there is
    * nowhere to move anything), and every assignment form places the
    * system regions on the single server while leaving user regions
    * unassigned. */
  object Maintenance {
    def balanceCluster(
        loadOfAllTables: Map[String, Map[String, Seq[RegionInfo]]])
        : Map[String, Seq[RegionPlan]] = Map.empty

    /** roundRobinAssignment / retainAssignment: system regions → the
      * one server; none when no system regions need placing. */
    def assign(regions: Seq[RegionInfo], servers: Seq[String],
        isSystem: RegionInfo => Boolean): Map[String, Seq[RegionInfo]] = {
      require(servers.size == 1,
        s"maintenance mode runs exactly one server, got ${servers.size}")
      val sys = regions.filter(isSystem)
      if (sys.nonEmpty) Map(servers.head -> sys) else Map.empty
    }

    /** randomAssignment: a system region goes to the one server, a
      * user region stays unassigned (the reference returns null). */
    def assignOne(region: RegionInfo, servers: Seq[String],
        isSystem: RegionInfo => Boolean): Option[String] = {
      require(servers.size == 1,
        s"maintenance mode runs exactly one server, got ${servers.size}")
      if (isSystem(region)) Some(servers.head) else None
    }
  }
}
