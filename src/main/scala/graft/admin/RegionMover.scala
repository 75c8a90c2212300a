package graft.admin

/** RegionMover twin (hbase-server/.../util/RegionMover.java:86-376) —
  * the graceful-drain tool: `unload` moves every region off one
  * server (spreading over the remaining servers, least-loaded first,
  * skipping excluded/decommissioned hosts) and RETURNS the moved list
  * — the reference writes it to the plan file; `load` replays that
  * list back onto the server after maintenance. Meta moves only when
  * explicitly asked (RegionMover.java:348-355).
  */
object RegionMover {

  import Balancer.{RegionInfo, RegionPlan}

  /** Drain `server`: one plan per region, destinations round-robin
    * over the other servers ordered by ascending (load, name) —
    * re-evaluated as moves land so the spread stays even. Excluded
    * servers never receive. Meta regions stay unless `moveMeta`. */
  def unload(assignment: Map[String, Seq[RegionInfo]], server: String,
      excludes: Set[String] = Set.empty, moveMeta: Boolean = false)
      : Seq[RegionPlan] = {
    require(assignment.contains(server), s"unknown server $server")
    val targets = collection.mutable.Map(
      assignment.collect {
        case (s, rs) if s != server && !excludes(s) => s -> rs.size
      }.toSeq: _*)
    require(targets.nonEmpty, "no eligible destination servers")
    val toMove = assignment(server)
      .filter(r => moveMeta || !r.isMeta)
      .sortBy(r => (-r.id, r.name)) // newest first, like the balancer
    toMove.map { r =>
      val dest = targets.keys.toSeq.sortBy(s => (targets(s), s)).head
      targets(dest) += 1
      RegionPlan(r.name, server, dest)
    }
  }

  /** Reload a drained server from its saved plan: the inverse moves
    * (RegionMover.load — reads the plan file, moves them back). */
  def load(plans: Seq[RegionPlan], server: String): Seq[RegionPlan] =
    plans.map(p => RegionPlan(p.region, p.dest, server))
}
