package graft

import org.apache.spark.sql.functions._

import graft.functions.{AclFunctions, AclKernel, AclWriteObserver, AuthManager}
import graft.model.Fixtures
import graft.read.Resolve

/** Cell-level ACLs (AccessControlFilter CHECK_CELL_DEFAULT;
  * AuthManager.authorizeCell:437): grant parsing, group principals,
  * the table-grant override, and pre-version-gate placement.
  */
class AccessControlSpec extends SparkSpec {
  import spark.implicits._

  test("grant parsing and action implication") {
    assert(AclKernel.parse("alice:RW,bob:R,@eng:XCA") ===
      Map("alice" -> Set('R', 'W'), "bob" -> Set('R'), "@eng" -> Set('X', 'C', 'A')))
    assert(AclKernel.cellAuthorizes("alice:RW", Set("alice"), 'R'))
    assert(AclKernel.cellAuthorizes("alice:RW", Set("alice"), 'W'))
    assert(!AclKernel.cellAuthorizes("alice:RW", Set("alice"), 'A'))
    assert(!AclKernel.cellAuthorizes("alice:RW", Set("bob"), 'R'))
    // group principals extend the user's identity set
    assert(AclKernel.cellAuthorizes("@eng:R", Set("alice", "@eng"), 'R'))
    // no ACL grants nothing at cell scope
    assert(!AclKernel.cellAuthorizes(null, Set("alice"), 'R'))
    assert(!AclKernel.cellAuthorizes("", Set("alice"), 'R'))
  }

  test("malformed grants throw") {
    for (bad <- Seq("alice", ":RW", "alice:RQ", " :RW"))
      assertThrows[IllegalArgumentException](AclKernel.parse(bad))
  }

  test("grant authoring whitespace is tolerated, not silently denied") {
    assert(AclKernel.parse("alice:RW, bob:R , @eng : X") ===
      Map("alice" -> Set('R', 'W'), "bob" -> Set('R'), "@eng" -> Set('X')))
    assert(AclKernel.cellAuthorizes("alice:RW, bob:R", Set("bob"), 'R'))
  }

  test("table grant admits every cell — cell ACLs extend, never restrict") {
    val cells = Seq(
      ("r1", "d", "q", 1L, "Put", "open", "alice:R"),
      ("r1", "d", "q", 2L, "Put", "closed", "bob:R"),
      ("r1", "d", "q", 3L, "Put", "untagged", null)
    ).toDF("row", "family", "qualifier", "ts", "type", "value", "acl")
    val withGrant = cells.filter(
      AclFunctions.acl_check(col("acl"), "alice", tableGrant = true))
    assert(withGrant.count() === 3)
    val cellOnly = cells.filter(AclFunctions.acl_check(col("acl"), "alice"))
    assert(cellOnly.select("value").as[String].collect().toSet === Set("open"))
  }

  test("AuthManager scope cascade: global > namespace > table > family > qualifier") {
    import AuthManager._
    val grants = Seq(
      Grant("root", Global, Set('R', 'W', 'X', 'C', 'A')),
      Grant("@ops", Namespace("prod"), Set('R', 'W')),
      Grant("alice", Table("prod:events"), Set('R')),
      Grant("bob", Table("prod:events", Some("d")), Set('R', 'W')),
      Grant("carol", Table("prod:events", Some("d"), Some("props")), Set('R')))
    // global implies everything
    assert(authorize(grants, "root", Set.empty, "any:tbl", Some("x"), Some("y"), 'A'))
    // namespace grant (via group) covers its tables, not others
    assert(authorize(grants, "dave", Set("@ops"), "prod:events", Some("d"), None, 'W'))
    assert(!authorize(grants, "dave", Set("@ops"), "stage:events", None, None, 'R'))
    // table grant with no family implies all families, only its actions
    assert(authorize(grants, "alice", Set.empty, "prod:events", Some("m"), Some("q"), 'R'))
    assert(!authorize(grants, "alice", Set.empty, "prod:events", None, None, 'W'))
    // family-scope grant binds to its family
    assert(authorize(grants, "bob", Set.empty, "prod:events", Some("d"), Some("q"), 'W'))
    assert(!authorize(grants, "bob", Set.empty, "prod:events", Some("m"), None, 'W'))
    // qualifier-scope grant binds to its qualifier
    assert(authorize(grants, "carol", Set.empty, "prod:events", Some("d"), Some("props"), 'R'))
    assert(!authorize(grants, "carol", Set.empty, "prod:events", Some("d"), Some("other"), 'R'))
    // bare table names live in the default namespace
    assert(namespaceOf("t") === "default" && namespaceOf("ns:t") === "ns")
  }

  test("write gate: strict preBatchMutate throws, permissive filters") {
    import AuthManager._
    val grants = Seq(Grant("alice", Table("t", Some("d")), Set('W')))
    val batch = Seq(
      ("r1", "d", "q", 1L, "Put", "ok"),
      ("r1", "m", "q", 1L, "Put", "blocked")
    ).toDF("row", "family", "qualifier", "ts", "type", "value")
    val strict = new AclWriteObserver(grants, "alice", Set.empty, "t")
    val ex = intercept[SecurityException](strict.preBatchMutate(batch))
    assert(ex.getMessage.contains("m"))
    val permissive = new AclWriteObserver(grants, "alice", Set.empty, "t", strict = false)
    assert(permissive.preBatchMutate(batch).select("family")
      .as[String].collect().toSeq === Seq("d"))
    // fully-authorized batch passes through untouched (same plan)
    val okOnly = batch.filter(col("family") === "d")
    assert(strict.preBatchMutate(okOnly).count() === 1)
  }

  test("acl cellFilter adds no exchange to the resolve plan") {
    // backs the round-5 plan audit: enforcement rides the existing
    // cellFilter slot map-side — same number of Exchanges as the
    // unfiltered resolve
    val cells = Fixtures.cellsEventsV(spark, sf0001)
      .withColumn("acl", when((col("row").cast("long") + col("ts")) % 2 === 0, "alice:R"))
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(
        df.queryExecution.executedPlan.toString).length
    val plain = Resolve.latest(cells, maxVersions = 2)
    val gated = Resolve.latest(cells, maxVersions = 2,
      cellFilter = Some(AclFunctions.acl_check(col("acl"), "alice")))
    assert(exchanges(gated) === exchanges(plain))
  }

  test("acl filter runs BEFORE the version gate: unreadable newest frees its slot") {
    // same placement contract as VisibilityLabelFilter / q69
    // (AccessControlFilter.java:100-117 does its own version counting)
    val cells = Seq(
      ("r1", "d", "q", 3L, "Put", "v3", "bob:R"),
      ("r1", "d", "q", 2L, "Put", "v2", "alice:R"),
      ("r1", "d", "q", 1L, "Put", "v1", "alice:R")
    ).toDF("row", "family", "qualifier", "ts", "type", "value", "acl")
    val out = Resolve.latest(cells, maxVersions = 2,
        cellFilter = Some(AclFunctions.acl_check(col("acl"), "alice")))
      .select("ts").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L))
  }
}
