package graft

import graft.admin.SpaceQuotas
import graft.admin.SpaceQuotas._

/** Space-quota twin vs the reference's semantics
  * (QuotaObserverChore.java, TableQuotaSnapshotStore.java:93,
  * policies (check() impls), FileSystemUtilizationChore.java). */
class SpaceQuotasSpec extends SparkSpec {

  test("targetState: observance at the limit, violation above it") {
    val q = SpaceQuota(100L, NoWrites)
    assert(targetState(100L, 0L, q) == Snapshot(100L, 100L, false, None))
    assert(targetState(101L, 0L, q) ==
      Snapshot(101L, 100L, true, Some(NoWrites)))
    // snapshot bytes charge against the same limit
    // (getSnapshotSizesForTable)
    assert(targetState(60L, 50L, q).inViolation)
  }

  test("observe: table violation shields the table from the namespace policy") {
    val usage = Map(
      "t1" -> ("na", 100L), // table quota, violated
      "t2" -> ("na", 50L)) // no table quota
    val tq = Map("t1" -> SpaceQuota(80L, NoWrites))
    val nq = Map("na" -> SpaceQuota(120L, NoInserts)) // ns total 150 > 120
    val out = observe(usage, tq, nq).map(e => e.table -> e).toMap
    assert(out("t1").source == "TABLE" &&
      out("t1").snapshot.policy.contains(NoWrites))
    // t2 inherits the NAMESPACE snapshot verbatim (usage/limit are the
    // namespace's — transitionTable receives the ns targetSnapshot)
    assert(out("t2").source == "NAMESPACE" &&
      out("t2").snapshot == Snapshot(150L, 120L, true, Some(NoInserts)))
  }

  test("observe: table quota in OBSERVANCE does not shield from the namespace") {
    val usage = Map("t1" -> ("na", 100L), "t2" -> ("na", 50L))
    val tq = Map("t1" -> SpaceQuota(200L, Disable)) // observant
    val nq = Map("na" -> SpaceQuota(120L, NoInserts))
    val out = observe(usage, tq, nq).map(e => e.table -> e).toMap
    // QuotaObserverChore.java:425-436 — only a table-level VIOLATION
    // takes priority; an observant table quota yields to the ns policy
    assert(out("t1").source == "NAMESPACE" && out("t1").snapshot.inViolation)
    assert(out("t2").source == "NAMESPACE")
  }

  test("observe: no quotas anywhere → unconstrained") {
    val out = observe(Map("t" -> ("ns", 5L)), Map.empty, Map.empty)
    assert(out.head.source == "NONE" && !out.head.snapshot.inViolation)
  }

  test("mutation blocking matrix per policy") {
    val all = Seq("PUT", "APPEND", "INCREMENT", "DELETE")
    assert(all.forall(!mutationBlocked(None, _)))
    assert(all.filter(mutationBlocked(Some(NoInserts), _)) ==
      Seq("PUT", "APPEND", "INCREMENT")) // Deletes allowed
    assert(all.forall(mutationBlocked(Some(NoWrites), _)))
    assert(all.forall(mutationBlocked(Some(NoWritesCompactions), _)))
    assert(all.forall(mutationBlocked(Some(Disable), _)))
    assert(compactionsDisabled(Some(NoWritesCompactions)))
    assert(!compactionsDisabled(Some(NoWrites)))
    assert(tableDisabled(Some(Disable)) && !tableDisabled(Some(NoWrites)))
  }

  test("checkBulkLoad: admits while the running sum fits the headroom") {
    val snap = Snapshot(usage = 70L, limit = 100L, false, None)
    assert(checkBulkLoad(snap, Seq("a" -> 10L, "b" -> 20L)) == Right(30L))
    // third file tips the running sum over limit - usage = 30
    assert(checkBulkLoad(snap,
      Seq("a" -> 10L, "b" -> 20L, "c" -> 1L)) == Left("c"))
    // a single oversized file is rejected by name
    assert(checkBulkLoad(snap, Seq("big" -> 31L)) == Left("big"))
  }

  test("regionSizesFromFs: region size = sum of store file lengths") {
    val root = java.nio.file.Files.createTempDirectory("sqfs").toString
    def put(path: String, n: Int): Unit = {
      val p = java.nio.file.Paths.get(root, path)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, Array.fill[Byte](n)(7))
    }
    put("data/ta/r0/d/f1.hfile", 100)
    put("data/ta/r0/d/f2.hfile", 50)
    put("data/ta/r0/e/f3.hfile", 25) // second store, same region
    put("data/ta/r1/d/f4.hfile", 10)
    put("data/tb/r0/d/f5.hfile", 3)
    val sizes = SpaceQuotas.regionSizesFromFs(spark, root)
    assert(sizes == Map(
      ("ta", "r0") -> 175L, ("ta", "r1") -> 10L, ("tb", "r0") -> 3L))
    // report → observer end-to-end: ta violates, tb observes
    val byTable = sizes.groupBy(_._1._1)
      .map { case (t, m) => t -> ("ns1", m.values.sum) }
    val out = observe(byTable,
      Map("ta" -> SpaceQuota(150L, NoInserts),
        "tb" -> SpaceQuota(10L, NoInserts)), Map.empty)
      .map(e => e.table -> e).toMap
    assert(out("ta").snapshot.inViolation && !out("tb").snapshot.inViolation)
  }
}
