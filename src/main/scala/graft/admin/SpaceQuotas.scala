package graft.admin

/** Space-quota twin — the reference's master-side quota machinery
  * (hbase-server/.../quotas/):
  *
  *  - [[regionSizesFromFs]]: FileSystemUtilizationChore.java:74-165 —
  *    a region's size is the sum of its store files' on-disk lengths;
  *    the REPORT is what flows to the master, the chore never rescans.
  *  - [[targetState]]: TableQuotaSnapshotStore.getTargetState
  *    (TableQuotaSnapshotStore.java:93-112) — usage = Σ reported
  *    region sizes (+ snapshot sizes charged to the table); observance
  *    is usage <= limit, violation carries the quota's policy.
  *  - [[observe]]: QuotaObserverChore._chore / processTablesWithQuotas
  *    / processNamespacesWithQuotas (QuotaObserverChore.java:141-460)
  *    — table quotas are enacted first; a namespace quota is enacted
  *    on each table of the namespace ONLY where no table-level
  *    violation already applies ("the table quota takes priority over
  *    the namespace quota"). A table with neither stays unconstrained.
  *  - Enforcement bits: policies/ —
  *    NoInsertsViolationPolicyEnforcement.check (blocks Put / Append /
  *    Increment, allows Delete), NoWritesViolationPolicyEnforcement
  *    (blocks Delete too), NoWritesCompactionsViolationPolicyEnforcement
  *    .areCompactionsDisabled, DisableTableViolationPolicyEnforcement
  *    (table offline — every mutation refused). [[checkBulkLoad]] is
  *    DefaultViolationPolicyEnforcement.computeBulkLoadSize:61-78 —
  *    files are admitted while the RUNNING sum fits limit - usage.
  *
  * All of this is per-(table, namespace) METADATA arithmetic — the
  * master's own altitude. At 100 TB the only data-sized pass is the
  * region-size census, which the RS fleet computes store-locally and
  * reports upward (here: one groupBy over store metadata, never cells).
  */
object SpaceQuotas {

  /** Violation policies, reference names (SpaceViolationPolicy.java). */
  val Disable = "DISABLE"
  val NoWritesCompactions = "NO_WRITES_COMPACTIONS"
  val NoWrites = "NO_WRITES"
  val NoInserts = "NO_INSERTS"

  /** A declared quota: subject is a table name or a namespace. */
  final case class SpaceQuota(limitBytes: Long, policy: String)

  /** SpaceQuotaSnapshot.java: the (usage, limit, status) triple. */
  final case class Snapshot(usage: Long, limit: Long,
      inViolation: Boolean, policy: Option[String])

  /** The per-table outcome of one observer pass: the snapshot that
    * governs the table plus which quota supplied it. */
  final case class Enacted(table: String, namespace: String,
      snapshot: Snapshot, source: String) // source: TABLE | NAMESPACE | NONE

  /** TableQuotaSnapshotStore.getTargetState: violation iff usage
    * exceeds the soft limit; `snapshotBytes` is the archive footprint
    * charged to the subject (getSnapshotSizesForTable). */
  def targetState(regionBytes: Long, snapshotBytes: Long,
      quota: SpaceQuota): Snapshot = {
    val usage = regionBytes + snapshotBytes
    if (usage <= quota.limitBytes) Snapshot(usage, quota.limitBytes, false, None)
    else Snapshot(usage, quota.limitBytes, true, Some(quota.policy))
  }

  /** One QuotaObserverChore pass. `tableUsage` maps table →
    * (namespace, usage bytes); quotas key on table name / namespace.
    * Emits one Enacted per table carrying the governing snapshot:
    * table quota first, then the namespace quota for tables without a
    * table-level VIOLATION (QuotaObserverChore.java:384-460 — a
    * table-level violation shields the table from the namespace
    * policy; a table quota in observance does not). */
  def observe(tableUsage: Map[String, (String, Long)],
      tableQuotas: Map[String, SpaceQuota],
      namespaceQuotas: Map[String, SpaceQuota],
      snapshotBytes: Map[String, Long] = Map.empty): Seq[Enacted] = {
    val nsUsage: Map[String, Long] =
      tableUsage.groupBy(_._2._1).map { case (ns, m) =>
        ns -> m.values.map(_._2).sum
      }
    val nsState: Map[String, Snapshot] = namespaceQuotas.map { case (ns, q) =>
      ns -> targetState(nsUsage.getOrElse(ns, 0L), 0L, q)
    }
    tableUsage.toSeq.sortBy(_._1).map { case (table, (ns, bytes)) =>
      val tableState = tableQuotas.get(table)
        .map(q => targetState(bytes, snapshotBytes.getOrElse(table, 0L), q))
      tableState match {
        case Some(s) if s.inViolation =>
          // table-level violation policy wins outright
          Enacted(table, ns, s, "TABLE")
        case _ =>
          nsState.get(ns) match {
            case Some(n) if n.inViolation =>
              // namespace policy transitions THIS table (usage/limit
              // shown are the namespace's — transitionTable receives
              // the namespace targetSnapshot verbatim)
              Enacted(table, ns, n, "NAMESPACE")
            case _ =>
              tableState match {
                case Some(s) => Enacted(table, ns, s, "TABLE")
                case None =>
                  nsState.get(ns) match {
                    case Some(n) => Enacted(table, ns, n, "NAMESPACE")
                    case None =>
                      Enacted(table, ns, Snapshot(bytes, -1L, false, None), "NONE")
                  }
              }
          }
      }
    }
  }

  /** Which mutation kinds a policy refuses (the policies package's
    * per-enforcement check(Mutation) overrides). */
  def mutationBlocked(policy: Option[String], mutation: String): Boolean =
    policy match {
      case None => false
      case Some(Disable) => true // table offline — everything refused
      case Some(NoWrites) | Some(NoWritesCompactions) =>
        Set("PUT", "APPEND", "INCREMENT", "DELETE")(mutation.toUpperCase)
      case Some(NoInserts) =>
        Set("PUT", "APPEND", "INCREMENT")(mutation.toUpperCase)
      case Some(other) =>
        throw new IllegalArgumentException(s"unknown policy $other")
    }

  /** NoWritesCompactionsViolationPolicyEnforcement.areCompactionsDisabled. */
  def compactionsDisabled(policy: Option[String]): Boolean =
    policy.contains(NoWritesCompactions)

  /** DISABLE takes the table offline on transition
    * (QuotaObserverChore.updateTableQuota → disableTableIfNotDisabled). */
  def tableDisabled(policy: Option[String]): Boolean =
    policy.contains(Disable)

  /** DefaultViolationPolicyEnforcement.computeBulkLoadSize: admit
    * files while the running total fits the remaining headroom;
    * returns Right(total) or Left(the offending file). */
  def checkBulkLoad(snapshot: Snapshot,
      fileSizes: Seq[(String, Long)]): Either[String, Long] = {
    val available = snapshot.limit - snapshot.usage
    var size = 0L
    fileSizes.foreach { case (path, len) =>
      size += len
      if (size > available) return Left(path)
    }
    Right(size)
  }

  /** FileSystemUtilizationChore twin: region size = Σ store file
    * lengths under `root/data/<table>/<region>/<store>/`. A driver
    * metadata pass per REGION (the RS's own shape — fleet parallelism
    * is across regionservers, each walking only its local stores). */
  def regionSizesFromFs(spark: org.apache.spark.sql.SparkSession,
      root: String): Map[(String, String), Long] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val dataPath = new org.apache.hadoop.fs.Path(s"$root/data")
    val fs = dataPath.getFileSystem(hconf)
    if (!fs.exists(dataPath)) return Map.empty
    (for {
      t <- fs.listStatus(dataPath).toSeq if t.isDirectory
      r <- fs.listStatus(t.getPath).toSeq if r.isDirectory
    } yield {
      val bytes = (for {
        st <- fs.listStatus(r.getPath).toSeq if st.isDirectory
        f <- fs.listStatus(st.getPath).toSeq if f.isFile
      } yield f.getLen).sum
      (t.getPath.getName, r.getPath.getName) -> bytes
    }).toMap
  }
}
