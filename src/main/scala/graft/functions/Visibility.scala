package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.{shim => colshim}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Cell-visibility expression evaluation — the reference's visibility
  * labels subsystem (hbase-server security/visibility/:
  * ExpressionParser.java:42, Operator.java:24-26,
  * VisibilityLabelFilter.java, DefaultVisibilityLabelServiceImpl).
  *
  * Grammar (ExpressionParser.java): labels, `&`, `|`, `!`, parens, and
  * double-quoted labels with `\"`/`\\` escapes. The reference's stack
  * parser gives `&` and `|` EQUAL precedence, left-associative (a new
  * operator wraps the whole expression built so far —
  * ExpressionParser.processANDorOROp:261), and `!` binds to the next
  * node. So `a|b&c` parses as `(a|b)&c` — NOT the C precedence.
  *
  * Evaluation against a user's Authorizations (the label set the scan
  * carries): leaf = set membership, `!leaf` = absence, `&`/`|` =
  * boolean. A cell with no expression (null/empty) is visible to
  * everyone (only tagged cells are checked —
  * VisibilityLabelFilter.filterCell). Enforcement placement matches
  * the reference: the filter runs per-cell BEFORE the version gate, so
  * an invisible newest version does not consume a version slot — pass
  * [[VisibilityFunctions.vis_match]] as `Resolve.latest(cellFilter=…)`.
  */
object VisKernel {

  sealed trait Node
  final case class Leaf(label: String) extends Node
  final case class Not(child: Node) extends Node
  final case class Op(and: Boolean, children: Vector[Node]) extends Node

  /** Parse per the reference's token set. Throws IllegalArgumentException
    * on malformed input (the reference's ParseException twin). */
  def parse(s: String): Node = {
    var i = 0
    val n = s.length
    def err(msg: String) =
      throw new IllegalArgumentException(s"visibility parse error at $i in '$s': $msg")
    def skipWs(): Unit = while (i < n && s.charAt(i) == ' ') i += 1
    // primary := '!' primary | '(' expr ')' | label | '"' quoted '"'
    def primary(): Node = {
      skipWs()
      if (i >= n) err("unexpected end")
      s.charAt(i) match {
        case '!' => i += 1; Not(primary())
        case '(' =>
          i += 1
          val e = expr()
          skipWs()
          if (i >= n || s.charAt(i) != ')') err("expected )")
          i += 1
          e
        case '"' =>
          i += 1
          val sb = new StringBuilder
          while (i < n && s.charAt(i) != '"') {
            if (s.charAt(i) == '\\' && i + 1 < n &&
                (s.charAt(i + 1) == '"' || s.charAt(i + 1) == '\\')) i += 1
            sb.append(s.charAt(i)); i += 1
          }
          if (i >= n) err("unterminated quote")
          i += 1
          Leaf(sb.toString)
        case c if c == '&' || c == '|' || c == ')' => err(s"unexpected '$c'")
        case _ =>
          val start = i
          while (i < n && !"&|!()\" ".contains(s.charAt(i))) i += 1
          if (i == start) err("empty label")
          Leaf(s.substring(start, i))
      }
    }
    // expr := primary (('&'|'|') primary)*  — equal precedence, a new
    // operator WRAPS the accumulated left side (reference stack parser)
    def expr(): Node = {
      var acc = primary()
      skipWs()
      while (i < n && (s.charAt(i) == '&' || s.charAt(i) == '|')) {
        val and = s.charAt(i) == '&'
        i += 1
        val rhs = primary()
        acc = acc match {
          case Op(a, cs) if a == and => Op(a, cs :+ rhs)
          case other                 => Op(and, Vector(other, rhs))
        }
        skipWs()
      }
      acc
    }
    val root = expr()
    skipWs()
    if (i != n) err("trailing input")
    root
  }

  def eval(node: Node, auths: Set[String]): Boolean = node match {
    case Leaf(l)     => auths.contains(l)
    case Not(c)      => !eval(c, auths)
    case Op(true, cs)  => cs.forall(eval(_, auths))
    case Op(false, cs) => cs.exists(eval(_, auths))
  }

  // Expressions repeat heavily across cells (a corpus has few distinct
  // policies) — memoize parses per thread, bounded.
  private val memo = new ThreadLocal[java.util.LinkedHashMap[String, Node]] {
    override def initialValue() =
      new java.util.LinkedHashMap[String, Node](64, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, Node]) =
          size() > 1024
      }
  }

  def visible(expr: String, auths: Set[String]): Boolean = {
    if (expr == null || expr.isEmpty) return true
    eval(parsed(expr), auths)
  }

  private def parsed(expr: String): Node = {
    val m = memo.get()
    var node = m.get(expr)
    if (node == null) { node = parse(expr); m.put(expr, node) }
    node
  }

  /** Every leaf label the expression references (negated or not). */
  def labels(n: Node): Set[String] = n match {
    case Leaf(l)   => Set(l)
    case Not(c)    => labels(c)
    case Op(_, cs) => cs.flatMap(labels).toSet
  }

  /** Strict [[visible]]: additionally REJECTS (throws) any expression
    * referencing a label outside `defined` — the registry-backed
    * InvalidLabelException twin (without a registry every label string
    * is silently legal; see VisibilityAdmin). */
  def visibleStrict(expr: String, auths: Set[String],
      defined: Set[String]): Boolean = {
    if (expr == null || expr.isEmpty) return true
    val node = parsed(expr)
    val bad = labels(node).find(!defined(_))
    if (bad.isDefined)
      throw new IllegalArgumentException(
        s"undefined visibility label '${bad.get}' in '$expr'")
    eval(node, auths)
  }

  /** Canonical form of a visibility expression — the string twin of
    * the reference's tag serialization: `ExpressionExpander` rewrites
    * the parse tree to an OR of AND-clauses (NOT pushed to leaves),
    * `VisibilityUtils.createVisibilityExpTags` sorts the ordinals
    * inside each clause-tag, and the delete-vs-put comparison sorts
    * the tag LIST (`DefaultVisibilityLabelServiceImpl
    * .sortTagsBasedOnOrdinal:604` before `compareTagsOrdinals`). So
    * two expressions delete-match iff their sorted-DNF forms are
    * equal — `a&b` ≡ `b&a`, `a|b` ≡ `b|a`, `!!a` ≡ `a` — and the
    * empty/null expression canonicalizes to "" (matches only
    * untagged cells, `matchVisibility:577-583`). Negated labels
    * render as `!x` and sort with their ordinal sign the way negative
    * ordinals do. */
  def canonical(expr: String): String = {
    if (expr == null || expr.isEmpty) return ""
    val m = canonMemo.get()
    var c = m.get(expr)
    if (c == null) {
      c = dnf(parse(expr))
        .map(_.distinct.sorted.mkString("&"))
        .distinct.sorted.mkString("|")
      m.put(expr, c)
    }
    c
  }

  /** Sorted-DNF expansion (ExpressionExpander twin). Visibility
    * policies are tiny (a handful of labels), so the worst-case
    * exponential product never bites; results are memoized per
    * distinct expression anyway. */
  private def dnf(n: Node): Vector[Vector[String]] = n match {
    case Leaf(l)          => Vector(Vector(l))
    case Not(Leaf(l))     => Vector(Vector("!" + l))
    case Not(Not(c))      => dnf(c)
    case Not(Op(and, cs)) => dnf(Op(!and, cs.map(Not))) // De Morgan
    case Op(false, cs)    => cs.flatMap(dnf)
    case Op(true, cs) =>
      cs.map(dnf).reduceLeft((a, b) => for { x <- a; y <- b } yield x ++ y)
  }

  private val canonMemo = new ThreadLocal[java.util.LinkedHashMap[String, String]] {
    override def initialValue() =
      new java.util.LinkedHashMap[String, String](64, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, String]) =
          size() > 1024
      }
  }
}

/** `vis_match(expr)` — true iff the cell's visibility expression admits
  * the given Authorizations. Null/empty expression → visible (untagged
  * cells are never checked). With `defined` set, evaluation is STRICT:
  * an expression referencing an unregistered label fails the task
  * (the registry-backed InvalidLabelException twin). */
final case class VisibilityMatch(child: Expression, auths: Seq[String],
    defined: Option[Seq[String]] = None)
    extends UnaryExpression {

  private lazy val authSet = auths.toSet
  private lazy val definedSet = defined.map(_.toSet)

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) true
    else {
      val s = v.asInstanceOf[UTF8String].toString
      definedSet match {
        case Some(d) => VisKernel.visibleStrict(s, authSet, d)
        case None    => VisKernel.visible(s, authSet)
      }
    }
  }

  // generated code calls the memoizing kernel directly (the static-
  // forwarder pattern of MinHashKernel/LshKernel), so the per-cell
  // filter stays inside the WholeStageCodegen span of the resolve
  // pipeline instead of breaking it with an interpreted fallback.
  // NOT nullSafeCodeGen: a null expression means UNTAGGED = visible.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val authsRef =
      ctx.addReferenceObj("authSet", authSet, "scala.collection.immutable.Set")
    val call = definedSet match {
      case Some(d) =>
        val dRef =
          ctx.addReferenceObj("definedSet", d, "scala.collection.immutable.Set")
        s"graft.functions.VisKernel.visibleStrict(${c.value}.toString(), $authsRef, $dRef)"
      case None =>
        s"graft.functions.VisKernel.visible(${c.value}.toString(), $authsRef)"
    }
    ev.copy(code = code"""
${c.code}
final boolean ${ev.value} = ${c.isNull} ? true : $call;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): VisibilityMatch =
    copy(child = newChild)
}

/** `vis_canonical(expr)` — the sorted-DNF canonical form used for
  * delete-scope matching (see [[VisKernel.canonical]]). Null → ""
  * (the untagged class). */
final case class VisCanonical(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) UTF8String.EMPTY_UTF8
    else UTF8String.fromString(
      VisKernel.canonical(v.asInstanceOf[UTF8String].toString))
  }

  // null → "" (the untagged class), so not nullSafeCodeGen either
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val u = "org.apache.spark.unsafe.types.UTF8String"
    ev.copy(code = code"""
${c.code}
final $u ${ev.value} = ${c.isNull} ? $u.EMPTY_UTF8 :
  $u.fromString(graft.functions.VisKernel.canonical(${c.value}.toString()));""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): VisCanonical =
    copy(child = newChild)
}

object VisibilityFunctions {
  /** Column form: `vis_match(col("vis"), Set("public", "finance"))`. */
  def vis_match(expr: Column, auths: Set[String]): Column =
    colshim.column(VisibilityMatch(colshim.expression(expr), auths.toSeq.sorted))

  /** Strict column form: like [[vis_match]] but any expression
    * referencing a label outside `defined` (the registry dictionary,
    * VisibilityAdmin.listLabels) fails the scan instead of silently
    * never matching. */
  def vis_match_strict(expr: Column, auths: Set[String],
      defined: Set[String]): Column =
    colshim.column(VisibilityMatch(colshim.expression(expr),
      auths.toSeq.sorted, Some(defined.toSeq.sorted)))

  /** Column form of [[VisKernel.canonical]]. */
  def vis_canonical(expr: Column): Column =
    colshim.column(VisCanonical(colshim.expression(expr)))
}
