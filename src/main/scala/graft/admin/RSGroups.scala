package graft.admin

import scala.collection.immutable.SortedMap

/** RegionServer groups — the reference's rsgroup feature
  * (hbase-server/src/main/java/org/apache/hadoop/hbase/rsgroup/
  * RSGroupBasedLoadBalancer.java, RSGroupInfoManagerImpl.java,
  * hbase-common/.../rsgroup/RSGroupInfo.java): named server pools that
  * tables pin to, with every balance plan computed WITHIN the group.
  * The RPC/admin transport half stays out of scope (SURVEY §2.10);
  * this is the queryable half — the registry's constraint checks and
  * the group-aware balancing wrapper over the engine's own balancers.
  *
  * Semantics twinned:
  *  - the DEFAULT group ("default", RSGroupInfo.DEFAULT_GROUP) is
  *    implicit: it owns every server no named group claims
  *    (RSGroupInfoManagerImpl.getDefaultServers), so moving a server
  *    into a named group removes it from default automatically;
  *  - addRSGroup refuses duplicates and the reserved default name
  *    (RSGroupInfoManagerImpl.addRSGroup:295-308);
  *  - removeRSGroup refuses a group that still holds servers or is
  *    still referenced by a table binding (:370-397);
  *  - moveServers moves between named groups; moving to default just
  *    releases the server from its named group (:324-353);
  *  - a table binds to at most one group; unbound tables belong to
  *    default (RSGroupUtil.getRSGroupInfo's orElse(defaultInfo));
  *  - balanceCluster first computes the MISPLACED regions — hosted on
  *    a server outside their table's group — exactly like
  *    correctAssignments (RSGroupBasedLoadBalancer.java:306-345),
  *    homes them onto their group's servers (the reference emits
  *    dest-less plans and lets the assignment manager call
  *    roundRobinAssignment, which routes back into the same group
  *    filter — generateGroupAssignments:227-252; the twin composes the
  *    two steps deterministically: least-loaded server first,
  *    region-name order), then runs the internal balancer per group on
  *    the corrected+homed load (:148-168). No region ever crosses its
  *    group boundary.
  */
object RSGroups {

  val DefaultGroup = "default"

  /** Immutable registry state: named groups → their server pools
    * (disjoint), table → group bindings, and the online-server census
    * the default group derives from. */
  final case class Registry(
      groups: SortedMap[String, Set[String]],
      tableGroups: SortedMap[String, String],
      allServers: Set[String]) {

    require(!groups.contains(DefaultGroup),
      "the default group is implicit — it cannot be registered")
    locally {
      val claimed = groups.values.toSeq.flatten
      require(claimed.distinct.size == claimed.size,
        "a server can belong to at most one group")
    }
    require(tableGroups.values.forall(g =>
        g == DefaultGroup || groups.contains(g)),
      "table bound to an unknown group")

    /** getDefaultServers: every online server no named group claims. */
    def defaultServers: Set[String] = allServers -- groups.values.flatten

    def serversOf(group: String): Set[String] =
      if (group == DefaultGroup) defaultServers
      else groups.getOrElse(group,
        throw new IllegalArgumentException(s"RSGroup $group does not exist"))

    /** RSGroupUtil.getRSGroupInfo(...).orElse(defaultInfo). */
    def groupOfTable(table: String): String =
      tableGroups.getOrElse(table, DefaultGroup)

    /** getRSGroupOfServer. */
    def groupOfServer(server: String): String =
      groups.collectFirst { case (g, ss) if ss(server) => g }
        .getOrElse(DefaultGroup)

    def listRSGroups: Seq[String] =
      (groups.keySet + DefaultGroup).toSeq.sorted

    /** addRSGroup:295-308 — duplicate and reserved names refused. */
    def addRSGroup(name: String): Registry = {
      require(name.nonEmpty && name.forall(c =>
          c.isLetterOrDigit || c == '_'),
        s"illegal RSGroup name $name") // checkGroupName
      require(name != DefaultGroup && !groups.contains(name),
        s"Group already exists: $name")
      copy(groups = groups.updated(name, Set.empty))
    }

    /** removeRSGroup:370-397 — refuses while servers or table
      * bindings reference the group. */
    def removeRSGroup(name: String): Registry = {
      val servers = serversOf(name) // throws on unknown
      require(name != DefaultGroup, s"$name is a reserved group")
      require(servers.isEmpty,
        s"RSGroup $name has ${servers.size} servers; remove them first")
      val bound = tableGroups.collect { case (t, g) if g == name => t }
      require(bound.isEmpty,
        s"RSGroup $name is still referenced by ${bound.mkString(", ")}")
      copy(groups = groups - name)
    }

    /** moveServers:324-353. Moving TO default just releases the
      * servers from their named group (default is derived); moving
      * FROM default claims unowned servers. */
    def moveServers(servers: Set[String], src: String, dst: String)
        : Registry = {
      require(servers.subsetOf(serversOf(src)),
        s"servers ${servers -- serversOf(src)} are not in group $src")
      serversOf(dst) // existence check
      val afterSrc =
        if (src == DefaultGroup) groups
        else groups.updated(src, groups(src) -- servers)
      val afterDst =
        if (dst == DefaultGroup) afterSrc
        else afterSrc.updated(dst, afterSrc(dst) ++ servers)
      copy(groups = afterDst)
    }

    /** setRSGroup(tables, group):1252-1255 — bind tables to a group;
      * binding to default removes the explicit binding. */
    def setTableGroup(table: String, group: String): Registry = {
      serversOf(group) // existence check
      if (group == DefaultGroup) copy(tableGroups = tableGroups - table)
      else copy(tableGroups = tableGroups.updated(table, group))
    }
  }

  object Registry {
    def apply(allServers: Set[String]): Registry =
      Registry(SortedMap.empty[String, Set[String]],
        SortedMap.empty[String, String], allServers)
  }

  /** One homed misplaced-region move (correctAssignments' dest-less
    * RegionPlan + the follow-up in-group round-robin, composed). */
  final case class GroupReport(
      misplacedPlans: Seq[Balancer.RegionPlan],
      groupPlans: Seq[Balancer.RegionPlan],
      finalAssignment: Map[String, Seq[Balancer.RegionInfo]])

  /** RSGroupBasedLoadBalancer.balanceCluster:130-176 twin: correct
    * misplaced regions home first, then balance each group internally
    * on the corrected load. Tables of one group merge into one cluster
    * state (the reference's default byTable=false path). `slop` feeds
    * the default internal balancer (the engine's SimpleLoadBalancer);
    * slop = 0 demands the exact floor/ceil end state. `internal`
    * swaps the per-group balancer — the reference wraps whatever
    * `hbase.rsgroup.grouploadbalancer.class` names (its default is the
    * stochastic walk): pass
    * `a => StochasticBalancer.balanceTable(a.view.mapValues(_.map(r =>
    * RegionLoad(r.name))).toMap).map(_.plans).getOrElse(Nil)` for that
    * shape (RSGroupsSpec pins it).
    *
    * Invariants (the q124 oracle): no final assignment crosses a
    * group boundary; every group's servers end within the internal
    * balancer's band; a group's total region count is conserved. */
  def balanceCluster(reg: Registry,
      load: Map[String, Map[String, Seq[Balancer.RegionInfo]]],
      slop: Double = 0.2,
      internal: Map[String, Seq[Balancer.RegionInfo]]
        => Seq[Balancer.RegionPlan] = null): GroupReport = {
    val internalBalancer =
      Option(internal).getOrElse(
        (a: Map[String, Seq[Balancer.RegionInfo]]) =>
          Balancer.balanceTable(a, slop))
    // correctAssignments:306-345 — split each table's load into
    // in-place regions and misplaced ones (hosted outside the group)
    val misplaced = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Balancer.RegionInfo)] // (group, src, region)
    // group -> server -> regions (corrected, all the group's tables)
    val corrected = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String,
        Vector[Balancer.RegionInfo]]]
    for ((table, perServer) <- load.toSeq.sortBy(_._1)) {
      val group = reg.groupOfTable(table)
      val pool = reg.serversOf(group)
      require(pool.nonEmpty,
        s"group $group of table $table has no servers (the reference " +
          "routes these to a BOGUS server unless fallback is enabled)")
      val slot = corrected.getOrElseUpdate(group,
        scala.collection.mutable.Map.empty)
      pool.foreach(s => if (!slot.contains(s)) slot(s) = Vector.empty)
      for ((server, regions) <- perServer.toSeq.sortBy(_._1)) {
        if (pool(server))
          slot(server) = slot(server) ++ regions
        else
          regions.sortBy(_.name).foreach(r =>
            misplaced += ((group, server, r)))
      }
    }

    // home the misplaced: region-name order, each to the currently
    // least-loaded (count, name) server of its group — the
    // deterministic composition of the dest-less plan + the group-
    // filtered round-robin assignment
    val homingPlans = misplaced.toSeq
      .sortBy { case (g, _, r) => (g, r.name) }
      .map { case (group, src, region) =>
        val slot = corrected(group)
        val dest = slot.keys.toSeq.sortBy(s => (slot(s).size, s)).head
        slot(dest) = slot(dest) :+ region
        Balancer.RegionPlan(region.name, src, dest)
      }

    // per-group internal balance on the corrected + homed state
    val groupPlans = scala.collection.mutable.ArrayBuffer
      .empty[Balancer.RegionPlan]
    val finalAssign = scala.collection.mutable.Map
      .empty[String, Vector[Balancer.RegionInfo]]
    for (group <- corrected.keys.toSeq.sorted) {
      val slot = corrected(group)
      val assignment = slot.map { case (s, rs) => s -> (rs: Seq[Balancer.RegionInfo]) }.toMap
      val plans = internalBalancer(assignment)
      groupPlans ++= plans
      val byRegion = plans.map(p => p.region -> p.dest).toMap
      for ((server, regions) <- slot; r <- regions) {
        val dest = byRegion.getOrElse(r.name, server)
        finalAssign(dest) = finalAssign.getOrElse(dest, Vector.empty) :+ r
      }
    }
    GroupReport(homingPlans, groupPlans.toSeq,
      finalAssign.view.mapValues(v => v.sortBy(_.name): Seq[Balancer.RegionInfo]).toMap)
  }
}
