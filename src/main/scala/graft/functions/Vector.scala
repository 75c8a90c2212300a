package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{shim => colshim}
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** `dot_fold(a, b)`: the sequential-double-fold dot product of two
  * numeric array columns — `((0.0 + a0*b0) + a1*b1) + …` with every
  * element cast to double first. This is the exact arithmetic of
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _ + _)` (and of the
  * DuckDB oracle's `list_reduce(list_transform(...))`), but as a native
  * codegen expression: one fused loop inside whole-stage codegen
  * instead of two interpreted higher-order functions allocating an
  * intermediate array per row. On the all-pairs similarity path this
  * is the difference between an O(n²)·interpreter-dispatch plan and an
  * O(n²)·SIMD-friendly loop.
  *
  * Reference context: HBase has no vector ops; this backs the graft
  * LLM-pipeline extension operators (SURVEY.md §2 ext: embedding
  * near-dup, ANN top-k) the way `ColumnInterpreter`
  * (hbase-client/.../coprocessor/ColumnInterpreter.java:52) backs its
  * pluggable aggregations: a typed kernel under a declarative surface.
  */
case class DotFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_fold"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def numericArray(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType | ShortType | ByteType, _) => true
      case _ => false
    }
    if (numericArray(left) && numericArray(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_fold needs numeric array inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def getD(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => arr.getFloat(i).toDouble
    case DoubleType  => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case ShortType   => arr.getShort(i).toDouble
    case ByteType    => arr.getByte(i).toDouble
    case _           => sys.error(s"unsupported element type $t")
  }

  // zip_with/aggregate (and the oracle's list_reduce) return NULL on a
  // null element or a length mismatch — so must the fused form
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x  = a.asInstanceOf[ArrayData]
    val y  = b.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n  = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i   = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += getD(x, i, lt) * getD(y, i, rt)
      i += 1
    }
    acc
  }

  private def genGet(arr: String, i: String, t: DataType): String = t match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case ByteType    => s"(double) $arr.getByte($i)"
    case _           => sys.error(s"unsupported element type $t")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${genGet(a, i, elemType(left))} * ${genGet(b, i, elemType(right))};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

/** Column wrappers + SQL registration for graft's native expressions. */
object VectorFunctions {

  /** Sequential-fold dot product (see [[DotFold]]). */
  def dot_fold(a: Column, b: Column): Column =
    colshim.column(DotFold(colshim.expression(a), colshim.expression(b)))

  /** L2 norm via the same fold: `sqrt(dot_fold(v, v))`. Factoring the
    * norm out per vector (instead of per pair) is bit-identical to the
    * per-pair form because it is the same fold over the same array. */
  def l2_norm(v: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot_fold(v, v))

  /** Register `dot_fold` in a session's FunctionRegistry (SQL surface). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_fold"),
      new ExpressionInfo(classOf[DotFold].getName, null, "dot_fold"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_fold expects (array, array)")
        DotFold(children.head, children(1))
      })
}
