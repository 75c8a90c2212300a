package graft

import org.apache.spark.sql.functions._

import graft.functions.{AclFunctions, AclKernel}
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
    for (bad <- Seq("alice", ":RW", "alice:RQ"))
      assertThrows[IllegalArgumentException](AclKernel.parse(bad))
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
