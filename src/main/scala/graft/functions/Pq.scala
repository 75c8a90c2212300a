package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{shim => colshim}
import org.apache.spark.sql.types._

/** Single-pass product-quantization kernels. Same rationale as
  * [[LshBucketsExpr]]: the composed form (m × ks literal centroid
  * arrays inlined as `array_max(array(struct(dot_fold(...)...)))`)
  * blows the JVM's per-method JIT budget inside whole-stage codegen
  * and silently drops the fused stage to interpreter speed. The
  * kernels keep the generated method one call wide; the codebook
  * travels as a broadcast-referenced flat double[] —
  * `books[(s*ks + i)*dsub + j]` — not as literal source code.
  *
  * Arithmetic is bit-identical to the composed form (and the DuckDB
  * oracle): per subspace, argmax over centroids of `v_s·c − ‖c‖²/2`
  * with ties to the LARGER centroid id (array_max struct semantics);
  * ADC terms `floor((q_s·c_{code_s})·1e6)` as longs, summed. All dots
  * are left-to-right double folds.
  */
case class PqAssignExpr(child: Expression, books: Array[Double],
    m: Int, ks: Int, dsub: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_assign"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_assign needs array<float|double>, got $t")
  }

  // per-expression-instance, not a global identity-keyed memo: a global
  // map keyed by the (freshly flattened per call) books array would
  // accumulate entries forever on long-lived executors
  @transient private lazy val halvesArr: Array[Double] =
    PqKernel.computeHalves(books, m, ks, dsub)

  override protected def nullSafeEval(v: Any): Any =
    PqKernel.assign(v.asInstanceOf[ArrayData], books, halvesArr, m, ks, dsub, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[]")
    val href = ctx.addReferenceObj("pqHalves", halvesArr, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqKernel.assign($c, $ref, $href, $m, $ks, $dsub, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssignExpr =
    copy(child = newChild)
}

/** ADC score of a (unit-normalized) query vector against a code array. */
case class PqAdcExpr(left: Expression, right: Expression, books: Array[Double],
    m: Int, ks: Int, dsub: Int) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc needs (array<float|double>, array<int>), got ($l, $r)")
  }

  override protected def nullSafeEval(qv: Any, code: Any): Any =
    PqKernel.adc(qv.asInstanceOf[ArrayData], code.asInstanceOf[ArrayData],
      books, m, ks, dsub, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[]")
    defineCodeGen(ctx, ev, (q, c) =>
      s"graft.functions.PqKernel.adc($q, $c, $ref, $m, $ks, $dsub, $isFloat)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcExpr = copy(left = newLeft, right = newRight)
}

object PqKernel {

  /** ‖c‖²/2 per centroid, the same left fold as the driver-side
    * `c.map(x*x).sum / 2` of the composed form. Computed once per
    * expression instance (see PqAssignExpr.halvesArr), never memoized
    * globally. */
  def computeHalves(books: Array[Double], m: Int, ks: Int,
      dsub: Int): Array[Double] = {
    val out = new Array[Double](m * ks)
    var c = 0
    while (c < m * ks) {
      var acc = 0.0
      var j = 0
      while (j < dsub) { val x = books(c * dsub + j); acc += x * x; j += 1 }
      out(c) = acc / 2
      c += 1
    }
    out
  }

  private def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Code array: per subspace, argmax of v_s·c − ‖c‖²/2; equal scores
    * keep the LARGER id (array_max-over-struct tie semantics of the
    * composed form). Malformed input (wrong length, null element) →
    * all-zero codes, like [[LshBucketsKernel.buckets]]. */
  def assign(arr: ArrayData, books: Array[Double], half: Array[Double],
      m: Int, ks: Int, dsub: Int, isFloat: Boolean): ArrayData = {
    val out = new Array[Int](m)
    val dim = m * dsub
    if (arr.numElements() != dim) return new GenericArrayData(out)
    var d = 0
    while (d < dim) {
      if (arr.isNullAt(d)) return new GenericArrayData(out)
      d += 1
    }
    var s = 0
    while (s < m) {
      var best = Double.NegativeInfinity
      var bestI = 0
      var i = 0
      while (i < ks) {
        var acc = 0.0
        val off = (s * ks + i) * dsub
        var j = 0
        while (j < dsub) { acc += elem(arr, s * dsub + j, isFloat) * books(off + j); j += 1 }
        val score = acc - half(s * ks + i)
        if (score >= best) { best = score; bestI = i }
        i += 1
      }
      out(s) = bestI
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC: Σ_s floor((q_s · c_{code_s})·1e6) as longs — identical to the
    * composed `floor(dot_fold(slice(q), cvec)·1e6).cast(long)` sum.
    * Malformed input (query length ≠ m·dsub, null elements, code length
    * ≠ m, code id outside [0, ks)) scores Long.MinValue — it sorts
    * LAST in the descending rank, the same end state as the composed
    * form's null score under NULLS LAST; never an out-of-bounds read. */
  def adc(qv: ArrayData, code: ArrayData, books: Array[Double], m: Int,
      ks: Int, dsub: Int, isFloat: Boolean): Long = {
    val dim = m * dsub
    if (qv.numElements() != dim || code.numElements() != m) return Long.MinValue
    var d = 0
    while (d < dim) {
      if (qv.isNullAt(d)) return Long.MinValue
      d += 1
    }
    var total = 0L
    var s = 0
    while (s < m) {
      if (code.isNullAt(s)) return Long.MinValue
      val c = code.getInt(s)
      if (c < 0 || c >= ks) return Long.MinValue
      var acc = 0.0
      val off = (s * ks + c) * dsub
      var j = 0
      while (j < dsub) { acc += elem(qv, s * dsub + j, isFloat) * books(off + j); j += 1 }
      total += math.floor(acc * 1e6).toLong
      s += 1
    }
    total
  }
}

object PqFunctions {
  /** Flatten books to the kernel layout `[(s*ks + i)*dsub + j]`. */
  def flatten(books: Array[Array[Array[Double]]]): Array[Double] =
    books.flatMap(_.flatMap(_.toSeq))

  def pq_assign(v: Column, books: Array[Double], m: Int, ks: Int,
      dsub: Int): Column = {
    require(books.length == m * ks * dsub, "books length must be m*ks*dsub")
    colshim.column(PqAssignExpr(colshim.expression(v), books, m, ks, dsub))
  }

  def pq_adc(qv: Column, code: Column, books: Array[Double], m: Int, ks: Int,
      dsub: Int): Column = {
    require(books.length == m * ks * dsub, "books length must be m*ks*dsub")
    colshim.column(PqAdcExpr(colshim.expression(qv), colshim.expression(code),
      books, m, ks, dsub))
  }
}
