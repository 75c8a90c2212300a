package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.{shim => colshim}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Cell-level ACLs — the per-cell half of the reference's
  * AccessController security model (hbase-server security/access/:
  * AccessController.java:176, AccessControlFilter.java:131
  * CHECK_CELL_DEFAULT, AuthManager.authorizeCell:437,
  * PermissionStorage.getCellPermissionsForUser; actions
  * Permission.java R/W/X/C/A).
  *
  * Model: the reference attaches a serialized user→permissions map to
  * a cell as an ACL tag (Mutation.setACL → ACL_TAG_TYPE); graft's
  * analogue is a reserved string column of comma-separated
  * `principal:actions` grants — `"alice:RW,bob:R,@eng:R"` — where a
  * `@`-prefixed principal is a group, exactly the reference's
  * group-name convention (AuthUtil.isGroupPrincipal).
  *
  * Evaluation matches CHECK_CELL_DEFAULT: a cell is readable iff the
  * user holds a table/CF-scope grant (decided upstream of the scan —
  * pass it as `tableGrant`) OR the cell's own ACL implies the action
  * for the user or one of their groups. Cell ACLs therefore EXTEND
  * access to users without table grants; they never revoke a
  * table-grant holder (AccessControlFilter.java:131-139 — the `||`).
  * A cell with no ACL column/empty grants nothing at cell scope.
  * Enforcement placement matches the filter: per cell, BEFORE the
  * version gate (AccessControlFilter tracks its own per-column
  * version count, :100-117) — pass as `Resolve.latest(cellFilter=…)`
  * the same way as [[VisibilityFunctions.vis_match]].
  */
object AclKernel {

  /** Parse `"alice:RW,@eng:R"` → principal → action set. Malformed
    * entries (no ':') throw, mirroring the reference's failed tag
    * parse being an error path (AuthManager.authorizeCell:452). */
  def parse(acl: String): Map[String, Set[Char]] =
    acl.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { grant =>
      grant.split(":", 2) match {
        case Array(p0, actions0) if p0.trim.nonEmpty =>
          val actions = actions0.trim
          // an EMPTY action set ("bob:") is a valid deny-all grant,
          // not a parse error: cells already stored with one must not
          // turn every later scan's per-cell eval into an exception
          // (unknown action LETTERS still throw, as does a missing ':')
          actions.foreach(a => require("RWXCA".contains(a),
            s"unknown action '$a' in grant '$grant' (Permission: R/W/X/C/A)"))
          p0.trim -> actions.toSet
        case _ =>
          throw new IllegalArgumentException(s"malformed ACL grant '$grant'")
      }
    }.toMap

  // ACL policies repeat heavily across cells — memoize per thread,
  // bounded (same shape as VisKernel's expression memo)
  private val memo = new ThreadLocal[java.util.LinkedHashMap[String, Map[String, Set[Char]]]] {
    override def initialValue() =
      new java.util.LinkedHashMap[String, Map[String, Set[Char]]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Map[String, Set[Char]]]) = size() > 1024
      }
  }

  /** Does the cell's ACL imply `action` for any of `principals` (the
    * user plus their `@group`s)? Null/empty ACL grants nothing. */
  def cellAuthorizes(acl: String, principals: Set[String], action: Char): Boolean = {
    if (acl == null || acl.isEmpty) return false
    val m = memo.get()
    var grants = m.get(acl)
    if (grants == null) { grants = parse(acl); m.put(acl, grants) }
    principals.exists(p => grants.get(p).exists(_.contains(action)))
  }
}

/** `acl_check(aclCol)` — true iff the cell admits the given user (or
  * groups) for `action`, or `tableGrant` already admits everything.
  * See [[AclKernel]]. */
final case class AclCheck(child: Expression, principals: Seq[String],
    action: String, tableGrant: Boolean)
    extends UnaryExpression {

  private lazy val principalSet = principals.toSet

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    if (tableGrant) return true
    val v = child.eval(input)
    v != null && AclKernel.cellAuthorizes(
      v.asInstanceOf[UTF8String].toString, principalSet, action.head)
  }

  // per-cell gate on the resolve hot path — generated code calls the
  // memoizing kernel (static-forwarder pattern) so the ACL check stays
  // inside the WholeStageCodegen span; a table-level grant folds to a
  // constant. Null ACL column = no cell grant = not authorized.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (tableGrant)
      ev.copy(code = code"final boolean ${ev.value} = true;",
        isNull = FalseLiteral)
    else {
      val c = child.genCode(ctx)
      val p = ctx.addReferenceObj("principalSet", principalSet,
        "scala.collection.immutable.Set")
      val act = s"'${action.head}'" // pre-rendered: Char can't interpolate
      ev.copy(code = code"""
${c.code}
final boolean ${ev.value} = !${c.isNull} &&
  graft.functions.AclKernel.cellAuthorizes(${c.value}.toString(), $p, $act);""",
        isNull = FalseLiteral)
    }

  override protected def withNewChildInternal(newChild: Expression): AclCheck =
    copy(child = newChild)
}

object AclFunctions {
  /** Column form: `acl_check(col("acl"), "alice", Set("@eng"), 'R')`.
    * `tableGrant` is the upstream table/CF authorization verdict —
    * when true every cell passes (cell ACLs extend, never restrict). */
  def acl_check(acl: Column, user: String, groups: Set[String] = Set.empty,
      action: Char = 'R', tableGrant: Boolean = false): Column = {
    require("RWXCA".contains(action), "action must be one of R/W/X/C/A")
    colshim.column(AclCheck(colshim.expression(acl),
      (groups + user).toSeq.sorted, action.toString, tableGrant))
  }
}

/** Table/namespace/global-scope authorization — the upper half of the
  * reference's security model (AuthManager.java: authorizeUserGlobal
  * :212, authorizeUserNamespace:245, authorizeUserTable:271,
  * authorizeUserFamily:300; PermissionStorage ACL rows). Scope
  * implication follows the reference: a GLOBAL grant implies every
  * namespace/table; a NAMESPACE grant implies every table in it; a
  * TABLE grant with no family implies every family; a FAMILY grant
  * with no qualifier implies every qualifier. Principals are users or
  * `@group` names, matched against the caller's identity set. The
  * verdict feeds [[AclFunctions.acl_check]]'s `tableGrant` flag — cell
  * ACLs then extend (never restrict) that verdict, CHECK_CELL_DEFAULT.
  */
object AuthManager {

  sealed trait Scope
  case object Global extends Scope
  final case class Namespace(ns: String) extends Scope
  /** family/qualifier None = all (reference's null-family/qualifier). */
  final case class Table(table: String, family: Option[String] = None,
      qualifier: Option[String] = None) extends Scope

  final case class Grant(principal: String, scope: Scope, actions: Set[Char]) {
    actions.foreach(a => require("RWXCA".contains(a), s"unknown action '$a'"))
  }

  /** Namespace of a (possibly `ns:table`-qualified) table name —
    * TableName.getNamespaceAsString semantics, default namespace for
    * bare names. */
  def namespaceOf(table: String): String = {
    val i = table.indexOf(':')
    if (i < 0) "default" else table.substring(0, i)
  }

  /** Does any grant authorize `action` on (table, family, qualifier)
    * for the user (plus groups)? Checked global → namespace → table →
    * family → qualifier, the reference's authorize() cascade. */
  def authorize(grants: Seq[Grant], user: String, groups: Set[String],
      table: String, family: Option[String], qualifier: Option[String],
      action: Char): Boolean = {
    val principals = groups + user
    val ns = namespaceOf(table)
    grants.exists { g =>
      principals.contains(g.principal) && g.actions.contains(action) &&
      (g.scope match {
        case Global         => true
        case Namespace(n)   => n == ns
        case Table(t, f, q) =>
          t == table &&
          f.forall(gf => family.contains(gf)) &&
          q.forall(gq => qualifier.contains(gq))
      })
    }
  }

  /** Table-scope shortcut for read gating: true ⇒ pass as
    * `acl_check(tableGrant = true)`. */
  def tableGrant(grants: Seq[Grant], user: String, groups: Set[String],
      table: String, family: Option[String] = None, action: Char = 'R'): Boolean =
    authorize(grants, user, groups, table, family, None, action)
}

/** Write-path enforcement — the AccessController.preBatchMutate gate
  * (AccessController.java:176 install; prePut/preDelete/preBatchMutate
  * reject unauthorized mutations with AccessDeniedException). graft's
  * analogue is a [[graft.read.Observers]] WriteObserver: strict mode
  * throws on the first unauthorized mutation family (the coprocessor
  * contract — the batch fails, it is not silently trimmed); permissive
  * mode filters instead, for pipelines that quarantine rather than
  * abort. The check is per distinct (family) of the batch — a
  * driver-metadata-sized aggregate, not a per-row collect.
  */
final class AclWriteObserver(grants: Seq[AuthManager.Grant], user: String,
    groups: Set[String], table: String, strict: Boolean = true)
    extends graft.read.WriteObserver {

  override def preBatchMutate(batch: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val families = batch.select("family").distinct()
      .collect().map(_.getString(0)).toSeq // O(families), bounded
    val denied = families.filterNot(f =>
      AuthManager.authorize(grants, user, groups, table, Some(f), None, 'W'))
    if (denied.isEmpty) batch
    else if (strict)
      throw new SecurityException(
        s"AccessDenied: user '$user' lacks WRITE on $table families ${denied.mkString(",")}")
    else batch.filter(!col("family").isin(denied: _*))
  }
}
