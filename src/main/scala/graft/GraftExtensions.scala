package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.codec.OrderedEncode
import graft.functions.{DotFold, MinHashSigs}

/** Session-extension entry point: registers graft's native codegen
  * expressions on any session via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) — the sanctioned
  * deployment path for a library of custom Catalyst surfaces, so SQL
  * users get `dot_fold` / `ordered_encode` / `minhash_sigs` /
  * `vis_match` without programmatic registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, cls: Class[_]) =
    new ExpressionInfo(cls.getName, null, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_fold"),
      info("dot_fold", classOf[DotFold]),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_fold expects (array, array)")
        DotFold(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("ordered_encode"),
      info("ordered_encode", classOf[OrderedEncode]),
      (children: Seq[Expression]) => children match {
        case Seq(c)    => OrderedEncode(c, desc = false)
        case Seq(c, d) => OrderedEncode(c, d.eval() == true)
        case _ => throw new IllegalArgumentException(
          "ordered_encode expects (col) or (col, desc)")
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs", classOf[MinHashSigs]),
      (children: Seq[Expression]) => {
        // mirror the programmatic API's k∈1..64 contract here: the SQL
        // path must fail at plan time, not with an executor-side
        // ArrayIndexOutOfBounds (MinHashKernel has exactly 64 salts)
        require(children.length == 2, "minhash_sigs expects (array<string>, k)")
        require(children(1).foldable, "minhash_sigs: k must be a literal integer")
        val k = children(1).eval() match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"minhash_sigs: k must be an integer literal, got $other")
        }
        require(k >= 1 && k <= 64, s"minhash_sigs: k must be in 1..64, got $k")
        MinHashSigs(children.head, k)
      }))
    ext.injectFunction((
      // layout-faithful twin: reference OrderedBytes wire bytes
      FunctionIdentifier("ordered_encode_hb"),
      info("ordered_encode_hb", classOf[OrderedEncode]),
      (children: Seq[Expression]) => children match {
        case Seq(c)    => OrderedEncode(c, desc = false, hb = true)
        case Seq(c, d) => OrderedEncode(c, d.eval() == true, hb = true)
        case _ => throw new IllegalArgumentException(
          "ordered_encode_hb expects (col) or (col, desc)")
      }))
    ext.injectFunction((
      // acl_check(acl, user[, groups...]) — the READ gate form
      // (action fixed to 'R', no table grant; richer forms live on the
      // Column API). Principals are plan-time literals, like vis_match
      // auths — the caller identity is scan-constant in the reference.
      FunctionIdentifier("acl_check"),
      info("acl_check", classOf[graft.functions.AclCheck]),
      (children: Seq[Expression]) => {
        require(children.length >= 2, "acl_check expects (acl, user, groups...)")
        val principals = children.tail.map { c =>
          require(c.foldable, "acl_check: principals must be string literals")
          c.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => throw new IllegalArgumentException(
              s"acl_check: principals must be strings, got $other")
          }
        }
        graft.functions.AclCheck(children.head, principals.sorted, "R",
          tableGrant = false)
      }))
    ext.injectFunction((
      FunctionIdentifier("vis_match"),
      info("vis_match", classOf[graft.functions.VisibilityMatch]),
      (children: Seq[Expression]) => {
        // vis_match(expr, auth1, auth2, ...) — auths must be string
        // literals (the Authorizations set is scan-constant in the
        // reference); fail at plan time, not per-row
        require(children.nonEmpty, "vis_match expects (expr, auths...)")
        val auths = children.tail.map { c =>
          require(c.foldable, "vis_match: auths must be string literals")
          c.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => throw new IllegalArgumentException(
              s"vis_match: auths must be strings, got $other")
          }
        }
        graft.functions.VisibilityMatch(children.head, auths.sorted)
      }))
  }
}
