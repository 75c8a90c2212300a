package graft.admin

import scala.util.Random

/** StochasticLoadBalancer core twin (hbase-balancer/.../
  * StochasticLoadBalancer.java:571-744, DoubleArrayCost.java:68-130,
  * CostFunction.scale:113-122) — the reference's DEFAULT balancer: a
  * greedy stochastic walk over candidate actions, accepting only
  * cost-improving moves (undo otherwise), over a weighted sum of
  * normalized cost functions.
  *
  * Cost functions twinned exactly (weight = the reference default):
  *  - region count skew (500) — DoubleArrayCost over per-server
  *    region counts: sqrt Σ(n−mean)², scaled between the min
  *    achievable skew (floor/ceil split) and the max (everything on
  *    one server) — DoubleArrayCost.getMinSkew/getMaxSkew verbatim;
  *  - store file size skew (5, CostFromRegionLoadFunction) — the same
  *    form over per-server summed region sizes;
  *  - read request skew (5) — over per-server summed read counts;
  *  - move cost (7, MoveCostFunction) — moves scaled against
  *    min(maxMoves = 25% of regions, totalRegions);
  *  - write/memstore/coprocessor-request RATE skews (5 each,
  *    CostFromRegionLoadAsRateFunction over the census windows);
  *  - per-table count skew (35, TableSkewCostFunction) and per-table
  *    STOREFILE-size skew (35, StoreFileTableSkewCostFunction);
  *  - cache affinity (20, CacheAwareLoadBalancer's
  *    CacheAwareCostFunction + generator pair) over an injected
  *    (region, server) → cached-ratio table;
  *  - heterogeneous capacity fill (500,
  *    HeterogeneousRegionCountCostFunction) over injected
  *    hostname-regex → limit rules.
  * Every optional function follows CostFunction.isNeeded: a fixture
  * that supplies no input for it contributes neither cost nor
  * multiplier, so input-less walks replay bit-identical.
  *
  * Candidate generators: LOAD (a region off the most-loaded server to
  * the least-loaded — LoadCandidateGenerator) and RANDOM (uniform
  * region to a uniform other server — RandomCandidateGenerator),
  * picked uniformly. The twin's action space is single MOVES: the
  * reference's generators may also propose region SWAPS
  * (SwapRegionsAction) when both picked servers hold regions — a swap
  * is two moves, every converged invariant is move-reachable, and the
  * seeded path is pinned by spec either way (documented divergence;
  * the conditional-repair generators SlopFixingCandidateGenerator /
  * TableIsolationCandidateGenerator are likewise subsumed by graft's
  * mover/RSGroups homing jobs, per SURVEY Q128). The RNG is INJECTED (seed parameter): the
  * reference's walk is wall-clock-bounded and ThreadLocalRandom-fed;
  * an engine twin must replay, so time bounds are step bounds and the
  * seed pins the path. Locality/rack costs (ServerLocalityCostFunction
  * 25 / RackLocalityCostFunction 15) run over an INJECTED (region,
  * entity) → locality-fraction table — the no-HDFS twin of
  * RegionHDFSBlockLocationFinder's block census (q119).
  */
object StochasticBalancer {

  /** `writesWindow`/`memstoreMBWindow`/`cpWindow` are the region's
    * sliding metrics windows — consecutive census values of
    * writeRequestsCount / memStoreSizeMB / cpRequestsCount
    * (BalancerRegionLoad's deque; graft feeds them from the q120
    * two-census metricsRate view). `table` feeds the per-table skew
    * costs; empty = table skew not in play. `primary` names the
    * primary region this one is a READ REPLICA of (empty = this
    * region IS a primary) — the twin of RegionInfo.getReplicaId > 0,
    * where the reference groups replicas by ReplicaKey (table + start/
    * stop key, replicas/ReplicaKey.java:28-43); graft's regions are
    * name-keyed, so the primary's NAME is the group key. Any region
    * with a non-empty `primary` turns the replica cost functions,
    * generators and needs-balance override on (BalancerClusterState
    * .hasRegionReplicas). */
  final case class RegionLoad(name: String, sizeBytes: Long = 0L,
      reads: Long = 0L, writesWindow: Seq[Long] = Nil,
      memstoreMBWindow: Seq[Double] = Nil, table: String = "",
      cpWindow: Seq[Long] = Nil, primary: String = "")

  /** `locality`/`rackLocality` are the reference's default multipliers
    * (ServerLocalityCostFunction 25, RackLocalityCostFunction 15 —
    * LocalityBasedCostFunction.java); `writeRate`/`memstoreRate`/
    * `cpRate` are WriteRequestCostFunction 5 / MemStoreSizeCostFunction
    * 5 / CPRequestCostFunction 5 (CPRequestCostFunction.java:32);
    * `tableSkew` is TableSkewCostFunction 35; `storeFileTableSkew` is
    * StoreFileTableSkewCostFunction 35
    * (StoreFileTableSkewCostFunction.java:40); `cache` is the
    * CacheAwareCostFunction 20 (CacheAwareLoadBalancer.java
    * DEFAULT_CACHE_COST); `heterogeneous` is
    * HeterogeneousRegionCountCostFunction 500
    * (HeterogeneousRegionCountCostFunction.java:81 — the reference
    * warns regionCount should be 0 when it steers). `primaryCount` is
    * PrimaryRegionCountSkewCostFunction 500 (PrimaryRegionCountSkew
    * CostFunction.java:32 — "primary regions serve majority of
    * reads/writes"); `replicaHost`/`replicaRack` are
    * RegionReplicaHostCostFunction 100000 / RegionReplicaRack
    * CostFunction 10000 (RegionReplicaHostCostFunction.java:35,
    * RegionReplicaRackCostFunction.java:34) — deliberately dominant:
    * co-hosted replicas defeat the point of replication, so their
    * cost towers over every skew term. All three ride isNeeded =
    * hasRegionReplicas: replica-less walks never see them. */
  final case class Weights(regionCount: Double = 500.0,
      sizeSkew: Double = 5.0, readSkew: Double = 5.0, move: Double = 7.0,
      locality: Double = 25.0, rackLocality: Double = 15.0,
      writeRate: Double = 5.0, memstoreRate: Double = 5.0,
      tableSkew: Double = 35.0, cpRate: Double = 5.0,
      storeFileTableSkew: Double = 35.0, cache: Double = 20.0,
      heterogeneous: Double = 500.0, primaryCount: Double = 500.0,
      replicaHost: Double = 100000.0, replicaRack: Double = 10000.0)

  /** CostFromRegionLoadAsRateFunction.getRegionLoadCost — the
    * sliding-window RATE of a per-region counter: the mean of
    * successive deltas, where a drop (counter reset — the region
    * reopened on another server) contributes the post-reset absolute
    * value instead of a negative delta. Windows shorter than 2 have no
    * rate (the reference returns 0 for them). */
  def rateOf(window: Seq[Double]): Double = {
    if (window.size < 2) return 0.0
    var prev = window.head
    var cost = 0.0
    window.tail.foreach { cur =>
      cost += (if (cur >= prev) cur - prev else cur)
      prev = cur
    }
    math.max(0.0, cost / (window.size - 1))
  }

  /** CostFunction.scale with the epsilon guards collapsed to the
    * pure-math form (costs here are exact doubles). */
  private def scale(min: Double, max: Double, value: Double): Double =
    if (max <= min || value <= min) 0.0
    else math.max(0.0, math.min(1.0, (value - min) / (max - min)))

  /** DoubleArrayCost.computeCost: sqrt Σ(x−mean)² scaled to
    * [minSkew, maxSkew]. */
  def arrayCost(stats: Array[Double]): Double = {
    if (stats.isEmpty) return 0.0
    val total = stats.sum
    val count = stats.length.toDouble
    val mean = total / count
    val dev = math.sqrt(stats.map(n => (mean - n) * (mean - n)).sum)
    scale(minSkew(total, count), maxSkew(total, count), dev)
  }

  /** DoubleArrayCost.getMinSkew — the deviation of the best possible
    * (floor/ceil) split. */
  def minSkew(total: Double, numServers: Double): Double = {
    if (numServers == 0) return 0.0
    val mean = total / numServers
    val min =
      if (numServers > total)
        (numServers - total) * mean * mean + (1 - mean) * (1 - mean) * total
      else {
        val numHigh = (total - math.floor(mean) * numServers).toInt
        val numLow = (numServers - numHigh).toInt
        numHigh * (math.ceil(mean) - mean) * (math.ceil(mean) - mean) +
          numLow * (mean - math.floor(mean)) * (mean - math.floor(mean))
      }
    math.sqrt(min)
  }

  /** DoubleArrayCost.getMaxSkew — all load on one server. */
  def maxSkew(total: Double, numServers: Double): Double = {
    if (numServers == 0) return 0.0
    val mean = total / numServers
    math.sqrt((total - mean) * (total - mean) + (numServers - 1) * mean * mean)
  }

  final case class Result(plans: Seq[Balancer.RegionPlan],
      initCost: Double, finalCost: Double, acceptedMoves: Long)

  /** One balanceTable walk. Returns None when the weighted average
    * imbalance is under `minCostNeedBalance` (the reference's 0.025
    * gate — StochasticLoadBalancer.java:131).
    *
    * `locality` is the injected (region, server) → locality-fraction
    * table — the no-HDFS twin of RegionHDFSBlockLocationFinder's block
    * census (LocalityBasedCostFunction.java: cost = 1 −
    * currentLocality/bestLocality, where best sums each region's max
    * achievable fraction). `rackLocality` + `serverRack` are the
    * RackLocalityCostFunction pair over the same closed form at rack
    * granularity. Like the reference's CostFunction.isNeeded, an empty
    * table drops its function from the multiplier sum entirely, so
    * locality-less walks (q114) are bit-identical to before. */
  /** `isolated` is the BalancerConditionals table-isolation veto
    * (hbase-balancer/.../TableIsolationConditional.isViolatingServer:
    * MetaTableIsolationConditional / SystemTableIsolationConditional):
    * regions named here may only share a server with other isolated
    * regions, and non-isolated regions may never move onto a server
    * hosting them — every violating candidate is REJECTED before
    * costing (the reference's conditional veto in candidate
    * acceptance). The twin covers the PRESERVING half; the reference's
    * repair generator (TableIsolationCandidateGenerator, which
    * un-mixes a dirty start) is the mover/RSGroups' homing job in
    * graft. Empty set = conditionals off — bit-identical walks. */
  /** `cacheRatio` is the CacheAwareLoadBalancer's injected
    * (region, server) → cached-fraction table — the no-bucket-cache
    * twin of ServerMetrics.getRegionCachedInfo ∪ the
    * regionCacheRatioOnOldServerMap (CacheAwareLoadBalancer
    * .updateRegionLoad + BalancerClusterState
    * .getRegionCacheRatioOnRegionServer:629-668: the current server's
    * observed ratio, plus historical ratios on servers that still hold
    * the region's blocks in a persistent bucket cache). Non-empty, it
    * (a) adds the CacheAwareCostFunction term — cost = 1 −
    * Σ size·ratio(r, server(r)) / Σ size·max_s ratio(r, s), maintained
    * incrementally like locality — and (b) swaps the candidate
    * generators for the cache-aware pair (CacheAwareSkewnessCandidate
    * Generator picks the LEAST-cached region off the loaded server;
    * CacheAwareCandidateGenerator proposes moving a poorly-cached
    * region to its best-cached server under the reference's
    * moveRegionToOldServer conditions). Regions weight by sizeBytes
    * (the reference's weighted ratio uses region size; a region with
    * no size contributes nothing, exactly getRegionSizeMinusColdDataMB
    * <= 0). Empty = bit-identical walks.
    *
    * `heteroRules`/`heteroDefault` are the
    * HeterogeneousRegionCountCostFunction rule set — (hostname-regex,
    * region-limit) pairs, first match wins, `heteroDefault` when none
    * match (the reference parses them from a rules file; graft injects
    * them directly — same limits, no FS dependency). Non-empty, the
    * capacity-normalized skew cost joins the walk
    * (HeterogeneousRegionCountCostFunction.cost:139-155); empty =
    * bit-identical walks. Set `weights.regionCount` to 0 when it
    * steers, per the reference's own warning.
    *
    * `log` is the balancer decision/rejection ring ([[BalancerLog]]):
    * when supplied, a refused run records WHY (the needs-balance
    * reason + active cost functions) and a computed run records the
    * decision (costs, steps, plans — chunked at 15 per entry). None =
    * no recording, walks unchanged.
    *
    * Region replicas (any RegionLoad with a non-empty `primary`) turn
    * three things on, mirroring BalancerClusterState.hasRegionReplicas:
    * (a) the PrimaryRegionCountSkew / RegionReplicaHost /
    * RegionReplicaRack cost functions (the rack one only with >1 rack
    * declared, RegionReplicaRackCostFunction.loadCosts); (b) the
    * replica candidate generators (RegionReplicaCandidateGenerator /
    * RegionReplicaRackCandidateGenerator — move a co-located SECONDARY
    * off its group, falling back rack→server→random exactly like the
    * reference's generate chain); (c) the needs-balance override —
    * a cluster with ANY same-group co-location balances even under
    * `minCostNeedBalance` (StochasticLoadBalancer
    * .areSomeRegionReplicasColocatedOnHost/OnRack:362-399, gated on
    * servers/racks >= maxReplicas like the reference).
    *
    * `distributeReplicas` is the DistributeReplicasConditional
    * (DistributeReplicasConditional.java:36-93): a hard VETO — no move
    * may land a region on a server (or, when racks are declared and
    * numRacks >= maxReplicas, a rack) already hosting another replica
    * of its group. Like the reference (BalancerConditionals
    * .isReplicaDistributionEnabled), enabling it swaps the stochastic
    * replica generators for the conditional's own repair generator
    * (DistributeReplicasCandidateGenerator.java:45-92: find a
    * co-located group, move its secondary to a veto-passing server)
    * and swaps the colocation needs-balance override for the
    * conditional's own (BalancerConditionals.shouldRunBalancer — run
    * while the repair generator has an actionable server-level
    * co-location). The reference pairs that repair
    * generator with a SlopFixingCandidateGenerator (most-loaded →
    * least-loaded under the veto, DistributeReplicasConditional
    * .java:44-46); graft's retained LOAD generator plays that role —
    * same move shape, same veto, one fewer bespoke generator. */
  def balanceTable(assignment: Map[String, Seq[RegionLoad]],
      weights: Weights = Weights(), maxSteps: Int = 20000,
      minCostNeedBalance: Double = 0.025, seed: Long = 42L,
      locality: Map[(String, String), Double] = Map.empty,
      rackLocality: Map[(String, String), Double] = Map.empty,
      serverRack: Map[String, String] = Map.empty,
      isolated: Set[String] = Set.empty,
      cacheRatio: Map[(String, String), Double] = Map.empty,
      heteroRules: Seq[(String, Int)] = Nil,
      heteroDefault: Int = 200,
      log: Option[BalancerLog] = None,
      logTable: String = "",
      distributeReplicas: Boolean = false)
      : Option[Result] = {
    val servers = assignment.keys.toArray.sorted
    val nServers = servers.length
    val regions = servers.zipWithIndex.flatMap { case (s, si) =>
      assignment(s).map(r => (r, si))
    }
    val nRegions = regions.length
    if (nRegions == 0 || nServers < 2) return None
    val loc = regions.map(_._2) // region -> server index (mutable)
    val counts = new Array[Double](nServers)
    val sizes = new Array[Double](nServers)
    val reads = new Array[Double](nServers)
    regions.zipWithIndex.foreach { case ((r, si), _) =>
      counts(si) += 1; sizes(si) += r.sizeBytes.toDouble
      reads(si) += r.reads.toDouble
    }
    var moves = 0L
    val maxMoves = math.max((nRegions * 0.25).toInt, 30) // moveCost cap

    // rate cost functions (WriteRequestCostFunction /
    // MemStoreSizeCostFunction, both CostFromRegionLoadAsRateFunction):
    // each region's rate is fixed by its window, so the per-server sum
    // updates incrementally and exactly on every move. isNeeded parity
    // (the q119 precedent): a fixture that supplies no window (q114,
    // q119) contributes neither cost nor multiplier — those walks
    // replay bit-identical to the rate-less build.
    val wrRate = regions.map { case (r, _) =>
      rateOf(r.writesWindow.map(_.toDouble)) }
    val msRate = regions.map { case (r, _) => rateOf(r.memstoreMBWindow) }
    // CPRequestCostFunction (CPRequestCostFunction.java:28-41): the
    // identical CostFromRegionLoadAsRateFunction plumbing over the
    // coprocessor-request counter window
    val cpRt = regions.map { case (r, _) =>
      rateOf(r.cpWindow.map(_.toDouble)) }
    val useWrite = regions.exists(_._1.writesWindow.size >= 2)
    val useMem = regions.exists(_._1.memstoreMBWindow.size >= 2)
    val useCp = regions.exists(_._1.cpWindow.size >= 2)
    val writeRates = new Array[Double](nServers)
    val memRates = new Array[Double](nServers)
    val cpRates = new Array[Double](nServers)
    regions.zipWithIndex.foreach { case ((_, si), i) =>
      writeRates(si) += wrRate(i); memRates(si) += msRate(i)
      cpRates(si) += cpRt(i)
    }
    // TableSkewCostFunction: one DoubleArrayCost of per-server counts
    // PER TABLE, cost = the SUM of the per-table scaled costs (the
    // reference sums rather than averages — TableSkewCostFunction
    // .cost(), a >1-capable term by design; twinned as-is)
    val tableNames = regions.map(_._1.table).distinct.filter(_.nonEmpty)
    val useTable = tableNames.nonEmpty
    val tableCounts: Map[String, Array[Double]] =
      tableNames.map(_ -> new Array[Double](nServers)).toMap
    regions.foreach { case (r, si) =>
      if (r.table.nonEmpty) tableCounts(r.table)(si) += 1
    }
    // StoreFileTableSkewCostFunction (StoreFileTableSkewCostFunction
    // .java:52-141): the same per-table DoubleArrayCost shape over
    // per-server SUMMED storefile sizes (graft's sizeBytes is the
    // single-census storefileSizeMB metric — one load per region, so
    // the reference's multi-load average is the value itself). isNeeded
    // parity: only a fixture that supplies BOTH a table and a size for
    // some region activates it — table-less or size-less walks (q114,
    // q125, q126) replay bit-identical.
    val useStoreSkew =
      regions.exists(r => r._1.table.nonEmpty && r._1.sizeBytes > 0)
    val tableSizes: Map[String, Array[Double]] =
      if (useStoreSkew) tableNames.map(_ -> new Array[Double](nServers)).toMap
      else Map.empty
    if (useStoreSkew) regions.foreach { case (r, si) =>
      if (r.table.nonEmpty) tableSizes(r.table)(si) += r.sizeBytes.toDouble
    }
    // HeterogeneousRegionCountCostFunction (HeterogeneousRegionCount
    // CostFunction.java:139-155, 263-279): per-server region limits
    // from first-matching rule (the reference iterates a HashMap —
    // unordered on OVERLAPPING rules; graft pins declaration order, a
    // documented determinism divergence), capacity-normalized
    // over-target skew, averaged over servers
    val useHetero = heteroRules.nonEmpty
    require(!useHetero ||
      (heteroRules.forall(_._2 > 0) && heteroDefault > 0),
      "heterogeneous region limits must be positive")
    val heteroPat = heteroRules.map { case (re, lim) =>
      (java.util.regex.Pattern.compile(re), lim) }
    val heteroLimit: Array[Double] =
      if (!useHetero) Array.empty
      else servers.map { sn =>
        heteroPat.collectFirst {
          case (p, lim) if p.matcher(sn).matches() => lim
        }.getOrElse(heteroDefault).toDouble
      }
    val heteroCapacity = heteroLimit.sum
    def heteroCost(): Double = {
      val targetUsage = nRegions.toDouble / heteroCapacity
      var c = 0.0
      var i = 0
      while (i < nServers) {
        val limit = heteroLimit(i)
        val n = counts(i)
        if (n / limit > targetUsage)
          c += (n - math.round(limit * targetUsage)) / limit
        i += 1
      }
      c / nServers
    }
    // isolation veto state: per-server isolated-region counts; a move
    // violates iff it would mix isolated and non-isolated regions on
    // the destination (both directions — isViolatingServer)
    val isoFlag = regions.map { case (r, _) => isolated(r.name) }
    val isoCounts = new Array[Int](nServers)
    regions.zipWithIndex.foreach { case ((_, si), i) =>
      if (isoFlag(i)) isoCounts(si) += 1
    }
    def isoViolates(ri: Int, dest: Int): Boolean =
      if (isolated.isEmpty) false
      else if (isoFlag(ri)) isoCounts(dest) < counts(dest).toInt
      else isoCounts(dest) > 0

    // region-replica state: regions group by their primary's name (the
    // ReplicaKey twin — replicas/ReplicaKey.java keys on table+start/
    // stop, i.e. the primary's identity; graft regions are name-keyed).
    // Per-group sizes give maxCost = every group fully co-hosted
    // (RegionReplicaGroupingCostFunction.getMaxCost); per-server and
    // per-rack co-location counts give the live cost, maintained with
    // O(1) deltas per move (the reference recomputes the two affected
    // groups — regionMoved; the (c-1)^2 form makes the delta exact).
    val hasReplicas = regions.exists(_._1.primary.nonEmpty)
    val primKey = regions.map { case (r, _) =>
      if (r.primary.nonEmpty) r.primary else r.name }
    val groupIds = primKey.distinct.zipWithIndex.toMap
    val primOf: Array[Int] = primKey.map(groupIds)
    val groupSize = new Array[Int](groupIds.size)
    primOf.foreach(g => groupSize(g) += 1)
    val maxReplicas = if (hasReplicas) groupSize.max else 1
    def sqColoc(c: Int): Long = if (c > 1) (c - 1L) * (c - 1L) else 0L
    val repMaxCost: Long = groupSize.map(sqColoc).sum
    val isPrimary = regions.map(_._1.primary.isEmpty)
    val primCounts = new Array[Double](nServers)
    regions.zipWithIndex.foreach { case ((_, si), i) =>
      if (isPrimary(i)) primCounts(si) += 1
    }
    // per-server group->count maps + the running (c-1)^2 totals
    val colocSrv = Array.fill(nServers)(
      collection.mutable.Map.empty[Int, Int])
    regions.zipWithIndex.foreach { case ((_, si), i) =>
      val m = colocSrv(si); m(primOf(i)) = m.getOrElse(primOf(i), 0) + 1
    }
    var curRepHost: Long =
      colocSrv.iterator.map(_.valuesIterator.map(sqColoc).sum).sum
    val rackNames = serverRack.values.toSeq.distinct.sorted
    val rackIdx = rackNames.zipWithIndex.toMap
    val nRacks = rackNames.length
    // rack accounting (index array + per-rack maps) exists exactly
    // when a replica consumer can read it: the rack cost/generator
    // (replicas present) or the conditional's rack veto. A replica-less
    // walk with a partial serverRack (locality callers) is untouched;
    // full coverage is only require'd when the accounting is live.
    val needRackAcct = nRacks > 1 && (hasReplicas || distributeReplicas)
    val srvRack: Array[Int] =
      if (!needRackAcct) Array.empty
      else servers.map(s => rackIdx(serverRack.getOrElse(s,
        throw new IllegalArgumentException(
          s"replica rack accounting needs a rack for every server: $s"))))
    val useRepRack = hasReplicas && nRacks > 1 && repMaxCost > 0
    val colocRack =
      if (!needRackAcct) Array.empty[collection.mutable.Map[Int, Int]]
      else Array.fill(nRacks)(collection.mutable.Map.empty[Int, Int])
    if (colocRack.nonEmpty) regions.zipWithIndex.foreach { case ((_, si), i) =>
      val m = colocRack(srvRack(si))
      m(primOf(i)) = m.getOrElse(primOf(i), 0) + 1
    }
    var curRepRack: Long =
      if (colocRack.isEmpty) 0L
      else colocRack.iterator.map(_.valuesIterator.map(sqColoc).sum).sum
    // host cost needs >1 host (RegionReplicaHostCostFunction.loadCosts:
    // numHosts > 1; graft's servers ARE its hosts — one process per
    // server name, documented in SURVEY §2.10)
    val useRepHost = hasReplicas && nServers > 1 && repMaxCost > 0
    val usePrimCount = hasReplicas

    // DistributeReplicasConditional.checkViolation: the destination
    // group (server always; rack when racks are declared AND can hold
    // one replica each — the generator's own numRacks guard,
    // DistributeReplicasCandidateGenerator.java:52-55) must not already
    // hold a replica of the moving region's group
    def repViolates(ri: Int, dest: Int): Boolean =
      distributeReplicas && (
        colocSrv(dest).getOrElse(primOf(ri), 0) > 0 ||
          (colocRack.nonEmpty && nRacks >= maxReplicas &&
            srvRack(dest) != srvRack(loc(ri)) &&
            colocRack(srvRack(dest)).getOrElse(primOf(ri), 0) > 0))

    def violates(ri: Int, dest: Int): Boolean =
      isoViolates(ri, dest) || repViolates(ri, dest)

    // locality state: current sum is maintained incrementally on each
    // (applied or undone) move; best is fixed — Σ per-region max
    require(rackLocality.isEmpty || servers.forall(serverRack.contains),
      "rack locality needs a rack for every server")
    def locOf(tab: Map[(String, String), Double], region: String,
        entity: String): Double = tab.getOrElse((region, entity), 0.0)
    def rackOf(si: Int): String = serverRack.getOrElse(servers(si), "")
    var curLoc = regions.indices.map(i =>
      locOf(locality, regions(i)._1.name, servers(loc(i)))).sum
    val bestLoc = regions.map(r =>
      servers.map(s => locOf(locality, r._1.name, s)).max).sum
    var curRack = regions.indices.map(i =>
      locOf(rackLocality, regions(i)._1.name, rackOf(loc(i)))).sum
    val racks = serverRack.values.toSeq.distinct
    val bestRack =
      if (rackLocality.isEmpty) 0.0
      else regions.map(r =>
        racks.map(k => locOf(rackLocality, r._1.name, k)).max).sum
    // isNeeded must gate the MULTIPLIER and the TERM identically: a
    // table whose best locality is 0 (a census found no blocks)
    // contributes no cost, so leaving its weight in the sum would only
    // dilute every other function's normalized cost — possibly under
    // the needs-balance gate on a cluster that balanced before the
    // table was supplied
    val useLoc = locality.nonEmpty && bestLoc > 0
    val useRack = rackLocality.nonEmpty && bestRack > 0

    // CacheAwareCostFunction state (CacheAwareLoadBalancer.java
    // CacheAwareCostFunction.recomputeCacheRatio / regionMoved): each
    // region weights by its size; current = Σ weight·ratio(r, host),
    // best = Σ weight·max_s ratio(r, s) — fixed, like bestLoc. The
    // free-cache-space simulation half (serverBlockCacheFreeSize,
    // potentialCacheRatioAfterMove) needs live bucket-cache telemetry
    // graft has no source for — documented boundary; the ratio table
    // already carries the persisted-cache facts the cost ranks by.
    def cacheOf(region: String, server: String): Double =
      cacheRatio.getOrElse((region, server), 0.0)
    val cacheW = regions.map(_._1.sizeBytes.toDouble)
    var curCache = regions.indices.map(i =>
      cacheW(i) * cacheOf(regions(i)._1.name, servers(loc(i)))).sum
    val bestCache =
      if (cacheRatio.isEmpty) 0.0
      else regions.indices.map(i =>
        cacheW(i) * servers.map(s => cacheOf(regions(i)._1.name, s)).max).sum
    val useCache = cacheRatio.nonEmpty && bestCache > 0
    // per-region best server for the cache-aware candidate generator
    // (getOrComputeServerWithBestRegionCachedRatio's tie rule: equal
    // ratios keep the CURRENT host; otherwise first-best wins)
    val cacheBestSrv: Array[Int] =
      if (!useCache) Array.empty
      else regions.indices.map { i =>
        val name = regions(i)._1.name
        var best = 0; var bestR = 0.0
        var s = 0
        while (s < nServers) {
          val r = cacheOf(name, servers(s))
          if (r > bestR || (r == bestR && s == loc(i))) { best = s; bestR = r }
          s += 1
        }
        best
      }.toArray

    val sumMultiplier =
      weights.regionCount + weights.sizeSkew + weights.readSkew +
        weights.move + (if (useLoc) weights.locality else 0.0) +
        (if (useRack) weights.rackLocality else 0.0) +
        (if (useWrite) weights.writeRate else 0.0) +
        (if (useMem) weights.memstoreRate else 0.0) +
        (if (useCp) weights.cpRate else 0.0) +
        (if (useTable) weights.tableSkew else 0.0) +
        (if (useStoreSkew) weights.storeFileTableSkew else 0.0) +
        (if (useCache) weights.cache else 0.0) +
        (if (useHetero) weights.heterogeneous else 0.0) +
        (if (usePrimCount) weights.primaryCount else 0.0) +
        (if (useRepHost) weights.replicaHost else 0.0) +
        (if (useRepRack) weights.replicaRack else 0.0)

    def cost(): Double =
      weights.regionCount * arrayCost(counts) +
        weights.sizeSkew * arrayCost(sizes) +
        weights.readSkew * arrayCost(reads) +
        weights.move * scale(0, math.min(maxMoves, nRegions), moves.toDouble) +
        (if (useLoc) weights.locality * (1.0 - curLoc / bestLoc) else 0.0) +
        (if (useRack)
          weights.rackLocality * (1.0 - curRack / bestRack) else 0.0) +
        (if (useWrite) weights.writeRate * arrayCost(writeRates) else 0.0) +
        (if (useMem) weights.memstoreRate * arrayCost(memRates) else 0.0) +
        (if (useCp) weights.cpRate * arrayCost(cpRates) else 0.0) +
        (if (useTable) weights.tableSkew *
          tableNames.iterator.map(t => arrayCost(tableCounts(t))).sum
         else 0.0) +
        (if (useStoreSkew) weights.storeFileTableSkew *
          tableNames.iterator.map(t => arrayCost(tableSizes(t))).sum
         else 0.0) +
        (if (useCache)
          weights.cache * scale(0, 1, 1.0 - curCache / bestCache) else 0.0) +
        (if (useHetero) weights.heterogeneous * heteroCost() else 0.0) +
        (if (usePrimCount) weights.primaryCount * arrayCost(primCounts)
         else 0.0) +
        (if (useRepHost) weights.replicaHost *
          scale(0, repMaxCost.toDouble, curRepHost.toDouble) else 0.0) +
        (if (useRepRack) weights.replicaRack *
          scale(0, repMaxCost.toDouble, curRepRack.toDouble) else 0.0)

    var currentCost = cost()
    val initCost = currentCost
    def costFuncInfo(): Seq[String] = {
      def f(name: String, c: Double, m: Double, needed: Boolean) =
        if (needed && m > 0) Some(s"$name*$c*$m") else None
      Seq(
        f("RegionCountSkewCostFunction", arrayCost(counts),
          weights.regionCount, needed = true),
        f("StoreFileCostFunction", arrayCost(sizes), weights.sizeSkew,
          needed = true),
        f("ReadRequestCostFunction", arrayCost(reads), weights.readSkew,
          needed = true),
        f("MoveCostFunction",
          scale(0, math.min(maxMoves, nRegions), moves.toDouble),
          weights.move, needed = true),
        f("ServerLocalityCostFunction",
          if (useLoc) 1.0 - curLoc / bestLoc else 0.0, weights.locality,
          useLoc),
        f("RackLocalityCostFunction",
          if (useRack) 1.0 - curRack / bestRack else 0.0,
          weights.rackLocality, useRack),
        f("WriteRequestCostFunction", arrayCost(writeRates),
          weights.writeRate, useWrite),
        f("MemStoreSizeCostFunction", arrayCost(memRates),
          weights.memstoreRate, useMem),
        f("CPRequestCostFunction", arrayCost(cpRates), weights.cpRate,
          useCp),
        f("TableSkewCostFunction",
          tableNames.iterator.map(t => arrayCost(tableCounts(t))).sum,
          weights.tableSkew, useTable),
        f("StoreFileTableSkewCostFunction",
          if (useStoreSkew)
            tableNames.iterator.map(t => arrayCost(tableSizes(t))).sum
          else 0.0, weights.storeFileTableSkew, useStoreSkew),
        f("CacheAwareCostFunction",
          if (useCache) 1.0 - curCache / bestCache else 0.0, weights.cache,
          useCache),
        f("HeterogeneousRegionCountCostFunction",
          if (useHetero) heteroCost() else 0.0, weights.heterogeneous,
          useHetero),
        f("PrimaryRegionCountSkewCostFunction", arrayCost(primCounts),
          weights.primaryCount, usePrimCount),
        f("RegionReplicaHostCostFunction",
          if (useRepHost)
            scale(0, repMaxCost.toDouble, curRepHost.toDouble)
          else 0.0, weights.replicaHost, useRepHost),
        f("RegionReplicaRackCostFunction",
          if (useRepRack)
            scale(0, repMaxCost.toDouble, curRepRack.toDouble)
          else 0.0, weights.replicaRack, useRepRack)
      ).flatten
    }
    // needsBalance's replica-colocation override (StochasticLoad
    // Balancer.areSomeRegionReplicasColocatedOnHost/OnRack:362-399):
    // any same-group co-location on a server (when servers can hold
    // one replica each) or rack forces a run past the cost gate.
    // When the conditional owns distribution the reference skips
    // those two checks (:363,:381) but SUBSTITUTES BalancerConditionals
    // .shouldRunBalancer (needsBalance:453-456): the balancer still
    // runs whenever the repair generator has an actionable move — i.e.
    // server-level co-location exists (the generator's weighing scan
    // is server-level; rack violations are the veto's job). Without
    // the substitute, a small violation whose normalized cost sits
    // under minCostNeedBalance would never be repaired.
    val colocForcesRun = hasReplicas && (
      if (distributeReplicas) curRepHost > 0
      else
        (nServers >= maxReplicas && useRepHost && curRepHost > 0) ||
          (useRepRack && nRacks >= maxReplicas && curRepRack > 0))
    // needsBalance's idle/sloppy triggers (BaseLoadBalancer
    // .idleRegionServerExist:133-144 / sloppyRegionServerExist:147-169,
    // slop default 0.2): an empty server while another holds >1, or a
    // count outside average*(1±slop), runs the balancer past the cost
    // gate — the reference's counterweight to the huge replica
    // multipliers diluting the normalized total. The sloppy check is
    // skipped under table isolation (StochasticLoadBalancer
    // .needsBalance:444-447 — isolation makes count piles deliberate).
    val idleForcesRun =
      counts.exists(_ > 1.0) && counts.exists(_ == 0.0)
    val sloppyForcesRun = isolated.isEmpty && {
      val slop = 0.2
      val avg = nRegions.toDouble / nServers
      counts.max.toInt > math.ceil(avg * (1 + slop)).toInt ||
        counts.min.toInt < math.floor(avg * (1 - slop)).toInt
    }
    if (initCost / sumMultiplier < minCostNeedBalance &&
      !colocForcesRun && !idleForcesRun && !sloppyForcesRun) {
      // getBalanceReason's under-threshold branch, recorded like
      // sendRejectionReasonToRingBuffer(reason, costFunctions)
      log.foreach(_.recordRejection(logTable,
        s"imbalance=${initCost / sumMultiplier} <= " +
          s"minCostNeedBalance($minCostNeedBalance)", costFuncInfo()))
      return None
    }

    val rnd = new Random(seed)
    var accepted = 0L
    var step = 0
    // CacheAwareLoadBalancer's ratioThreshold / cacheRatioDiffThreshold
    // (CACHE_RATIO_THRESHOLD_DEFAULT 0.8; moveRegionToOldServer's 0.6f)
    val cacheRatioThreshold = 0.8
    val cacheDiffThreshold = 0.6
    while (step < maxSteps) {
      // pick a candidate action. With a cache table active the
      // generator set is EXACTLY the CacheAware pair — the reference's
      // createCandidateGenerators REPLACES the base set (no random
      // generator, so a well-cached region is never even proposed);
      // with replicas it GAINS the replica pair (createCandidate
      // Generators:238-246), or the conditional's repair generator
      // when distribution is conditional-owned (:232-237); without
      // either the LOAD/RANDOM pick — and its rnd stream — is
      // bit-identical to before (isNeeded parity).
      val gen =
        if (useCache) { if (rnd.nextBoolean()) 0 else 2 }
        else if (hasReplicas && !distributeReplicas)
          rnd.nextInt(4) match { case 0 => 0; case 1 => 1; case 2 => 3
            case _ => 4 }
        else if (hasReplicas && distributeReplicas)
          rnd.nextInt(3) match { case 0 => 0; case 1 => 1; case _ => 5 }
        else if (rnd.nextBoolean()) 0 else 1
      // RandomCandidateGenerator — also the fallback the replica
      // generators chain to when they find no co-location
      def randomPick(): (Int, Int) = {
        val r = rnd.nextInt(nRegions)
        val dest = rnd.nextInt(nServers)
        if (dest == loc(r)) (-1, -1) else (r, dest)
      }
      def otherServer(si: Int): Int = {
        val d = rnd.nextInt(nServers - 1); if (d >= si) d + 1 else d
      }
      // RegionReplicaCandidateGenerator.selectCoHostedRegionPerGroup:
      // uniformly pick one co-located group in this server/rack, then
      // move its first SECONDARY (never the primary — the reference's
      // selectedPrimaryIndex != regionIndex guard)
      def selectCoHosted(members: IndexedSeq[Int],
          coloc: collection.mutable.Map[Int, Int]): Int = {
        val colocated = coloc.iterator.collect {
          case (g, c) if c > 1 => g }.toArray.sorted
        if (colocated.isEmpty) -1
        else {
          val g = colocated(rnd.nextInt(colocated.length))
          members.find(i => primOf(i) == g && !isPrimary(i)).getOrElse(-1)
        }
      }
      def replicaServerPick(): (Int, Int) = {
        val si = rnd.nextInt(nServers)
        val ri = selectCoHosted(
          regions.indices.filter(loc(_) == si), colocSrv(si))
        if (ri == -1) randomPick() else (ri, otherServer(si))
      }
      val (ri, to) =
        if (gen == 0) {
          // LOAD generator: most-loaded server → least-loaded. Under a
          // cache table this is CacheAwareSkewnessCandidateGenerator:
          // the LEAST-CACHED region leaves the loaded server
          // (pickLeastCachedRegion — deterministic, first-min wins)
          val from = counts.indices.maxBy(counts(_))
          val dest = counts.indices.minBy(counts(_))
          val cand = regions.indices.filter(loc(_) == from)
          if (cand.isEmpty || from == dest) (-1, -1)
          else if (useCache)
            (cand.minBy(i => cacheOf(regions(i)._1.name, servers(from))),
              dest)
          else (cand(rnd.nextInt(cand.length)), dest)
        } else if (gen == 1) {
          // RANDOM generator: uniform region → uniform other server
          randomPick()
        } else if (gen == 3) {
          // RegionReplicaCandidateGenerator.generate: random server →
          // co-hosted secondary → random other server (the reference's
          // possible swap partner is graft's moves-only divergence)
          replicaServerPick()
        } else if (gen == 4) {
          // RegionReplicaRackCandidateGenerator.generate: random rack →
          // co-racked secondary → random server of another rack;
          // <=1 rack falls back to the server variant (super.generate)
          if (nRacks <= 1) replicaServerPick()
          else {
            val rk = rnd.nextInt(nRacks)
            val ri = selectCoHosted(
              regions.indices.filter(i => srvRack(loc(i)) == rk),
              colocRack(rk))
            if (ri == -1) randomPick()
            else {
              val d = rnd.nextInt(nRacks - 1)
              val toRack = if (d >= rk) d + 1 else d
              val srvs = servers.indices.filter(srvRack(_) == toRack)
              (ri, srvs(rnd.nextInt(srvs.length)))
            }
          }
        } else if (gen == 5) {
          // DistributeReplicasCandidateGenerator.generateCandidate
          // (single-move form of the reference's 100k batch — graft's
          // walk is one action per step): scan servers from a random
          // offset for a co-located group, move its secondary to the
          // first veto-passing server in a random-offset dest scan
          var found = (-1, -1)
          val start = rnd.nextInt(nServers)
          var k = 0
          while (k < nServers && found._1 == -1) {
            val si = (start + k) % nServers
            val ri = selectCoHosted(
              regions.indices.filter(loc(_) == si), colocSrv(si))
            if (ri != -1) {
              val dstart = rnd.nextInt(nServers)
              var j = 0
              while (j < nServers && found._1 == -1) {
                val d = (dstart + j) % nServers
                if (d != si && !violates(ri, d)) found = (ri, d)
                j += 1
              }
            }
            k += 1
          }
          found
        } else {
          // CacheAwareCandidateGenerator: move a poorly-cached region
          // to its best-cached server, under moveRegionToOldServer's
          // conditions — skip regions already well-cached here
          // (>= ratioThreshold), move when the best server is fully
          // cached, equally cached, or current/best < diff threshold
          val cand = regions.indices.filter { i =>
            val name = regions(i)._1.name
            val cur = cacheOf(name, servers(loc(i)))
            val best = cacheOf(name, servers(cacheBestSrv(i)))
            // only regions with a RECORDED ratio on the target server
            // are candidates (the reference draws candidates from
            // regionCacheRatioOnOldServerMap entries, never from
            // ratio-less regions)
            cacheBestSrv(i) != loc(i) &&
              cacheRatio.contains((name, servers(cacheBestSrv(i)))) &&
              cur < cacheRatioThreshold &&
              (best == 1.0 || best == cur ||
                (best > 0.0 && cur / best < cacheDiffThreshold))
          }
          if (cand.isEmpty) (-1, -1)
          else {
            val i = cand(rnd.nextInt(cand.length))
            (i, cacheBestSrv(i))
          }
        }
      if (ri >= 0 && !violates(ri, to)) {
        val from = loc(ri)
        val rl = regions(ri)._1
        def apply(src: Int, dst: Int, d: Long): Unit = {
          counts(src) -= 1; counts(dst) += 1
          sizes(src) -= rl.sizeBytes.toDouble; sizes(dst) += rl.sizeBytes.toDouble
          reads(src) -= rl.reads.toDouble; reads(dst) += rl.reads.toDouble
          if (useLoc) curLoc +=
            locOf(locality, rl.name, servers(dst)) -
              locOf(locality, rl.name, servers(src))
          if (useRack) curRack +=
            locOf(rackLocality, rl.name, rackOf(dst)) -
              locOf(rackLocality, rl.name, rackOf(src))
          if (useWrite) {
            writeRates(src) -= wrRate(ri); writeRates(dst) += wrRate(ri)
          }
          if (useMem) {
            memRates(src) -= msRate(ri); memRates(dst) += msRate(ri)
          }
          if (useCp) {
            cpRates(src) -= cpRt(ri); cpRates(dst) += cpRt(ri)
          }
          if (useTable && rl.table.nonEmpty) {
            val tc = tableCounts(rl.table); tc(src) -= 1; tc(dst) += 1
          }
          if (useStoreSkew && rl.table.nonEmpty) {
            val ts = tableSizes(rl.table)
            ts(src) -= rl.sizeBytes.toDouble
            ts(dst) += rl.sizeBytes.toDouble
          }
          if (useCache) curCache +=
            cacheW(ri) * (cacheOf(rl.name, servers(dst)) -
              cacheOf(rl.name, servers(src)))
          if (isoFlag(ri)) { isoCounts(src) -= 1; isoCounts(dst) += 1 }
          // maps also feed the veto, so maintain them whenever either
          // consumer is live (a conditional-on, replica-less walk must
          // not read stale co-location)
          if (hasReplicas || distributeReplicas) {
            if (usePrimCount && isPrimary(ri)) {
              primCounts(src) -= 1; primCounts(dst) += 1
            }
            // the two affected groups' (c-1)^2 deltas — the O(1) form
            // of RegionReplicaGroupingCostFunction.regionMoved
            val g = primOf(ri)
            val ms = colocSrv(src); val md = colocSrv(dst)
            val cs = ms(g)
            if (cs == 1) ms.remove(g) else ms(g) = cs - 1
            val cd = md.getOrElse(g, 0); md(g) = cd + 1
            if (useRepHost) curRepHost +=
              sqColoc(cd + 1) - sqColoc(cd) + sqColoc(cs - 1) - sqColoc(cs)
            if (colocRack.nonEmpty && srvRack(src) != srvRack(dst)) {
              val mrs = colocRack(srvRack(src))
              val mrd = colocRack(srvRack(dst))
              val crs = mrs(g)
              if (crs == 1) mrs.remove(g) else mrs(g) = crs - 1
              val crd = mrd.getOrElse(g, 0); mrd(g) = crd + 1
              if (useRepRack) curRepRack +=
                sqColoc(crd + 1) - sqColoc(crd) +
                  sqColoc(crs - 1) - sqColoc(crs)
            }
          }
          moves += d; loc(ri) = dst
        }
        apply(from, to, +1)
        val newCost = cost()
        if (currentCost - newCost > 1e-12) {
          currentCost = newCost
          accepted += 1
        } else {
          apply(to, from, -1) // undo
        }
      }
      step += 1
    }

    val plans = regions.indices.flatMap { i =>
      val (r, initial) = regions(i)
      if (loc(i) != initial)
        Some(Balancer.RegionPlan(r.name, servers(initial), servers(loc(i))))
      else None
    }
    // sendRegionPlansToRingBuffer's record: the run's costs + steps +
    // "region/source/destination" plan strings (table prefixed when
    // the fixture carries one, matching the reference's format)
    log.foreach { l =>
      // one name→table map, not a regions scan per plan (a large
      // cluster's run can carry thousands of plans)
      val tableOf = regions.iterator.collect {
        case (r, _) if r.table.nonEmpty => r.name -> r.table
      }.toMap
      l.recordDecision(logTable,
        initCost / sumMultiplier, currentCost / sumMultiplier,
        step.toLong,
        plans.map { p =>
          val tab = tableOf.get(p.region)
            .map(t => s"table: $t , ").getOrElse("")
          s"${tab}region: ${p.region} , source: ${p.source} , " +
            s"destination: ${p.dest}"
        })
    }
    Some(Result(plans, initCost / sumMultiplier,
      currentCost / sumMultiplier, accepted))
  }
}
