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

    // region-name-ordered move queue (rpComparator twin)
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
}
