package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{shim => colshim}
import org.apache.spark.sql.types._

/** Single-pass hyperplane-LSH kernel. `lsh_buckets(v, dim, tables,
  * nbits)` computes all `tables` bucket ids of a vector — bit b of
  * table t set iff `v · plane(t,b) >= 0` — arithmetic identical to the
  * composed form `array(sum_b(when(dot_fold(v, lit(plane)) >= 0,
  * 1<<b)))` and to the DuckDB oracle's literal-plane CTE, but as ONE
  * compact loop over a precomputed plane matrix.
  *
  * Why a kernel and not composition: the composed form inlines
  * tables×nbits dot_fold loops, each carrying a dim-element literal
  * array, into the enclosing whole-stage-codegen method. Past the
  * JVM's per-method JIT limit the WHOLE fused stage (join probes,
  * similarity arithmetic, aggregation included) silently drops to
  * bytecode-interpreter speed — measured ~50x on the kNN-graph
  * self-join. The kernel keeps the generated stage method one call
  * wide, exactly like [[MinHashSigs]] on the MinHash path.
  */
case class LshBucketsExpr(child: Expression, dim: Int, tables: Int, nbits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lsh_buckets needs array<float|double>, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    LshBucketsKernel.buckets(v.asInstanceOf[ArrayData], dim, tables, nbits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBucketsKernel.buckets($c, $dim, $tables, $nbits, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

object LshBucketsKernel {

  /** ±1 hyperplane component for (table, bit, dim index) — THE plane
    * definition shared by the Column surface and the SQL-oracle
    * generator (graft.ext.Similarity.plane delegates here, and the
    * DuckDB twins embed the same values as literals). */
  def planeSign(table: Int, bit: Int, d: Int): Double =
    if ((scala.util.hashing.MurmurHash3.stringHash(s"$table:$bit:$d", 42) & 1) == 1) 1.0
    else -1.0

  /** Flat plane matrix [t*nbits*dim + b*dim + d], cached per shape. */
  private val planeCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int, Int), Array[Double]]

  def planes(dim: Int, tables: Int, nbits: Int): Array[Double] =
    planeCache.getOrElseUpdate((dim, tables, nbits), {
      val out = new Array[Double](tables * nbits * dim)
      var t = 0
      while (t < tables) {
        var b = 0
        while (b < nbits) {
          var d = 0
          while (d < dim) {
            out((t * nbits + b) * dim + d) = planeSign(t, b, d)
            d += 1
          }
          b += 1
        }
        t += 1
      }
      out
    })

  /** All `tables` bucket ids in one pass. Malformed vectors (length !=
    * dim, or any null element) land in bucket 0 of every table — the
    * exact convention of the composed form, where dot_fold yields null
    * and `when(null >= 0)` contributes no bit. */
  def buckets(arr: ArrayData, dim: Int, tables: Int, nbits: Int,
      isFloat: Boolean): ArrayData = {
    val out = new Array[Long](tables)
    val n = arr.numElements()
    if (n != dim) return new GenericArrayData(out)
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (arr.isNullAt(d)) return new GenericArrayData(out)
      v(d) = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      d += 1
    }
    val pl = planes(dim, tables, nbits)
    var t = 0
    while (t < tables) {
      var bkt = 0L
      var b = 0
      while (b < nbits) {
        var acc = 0.0
        var off = (t * nbits + b) * dim
        var i = 0
        while (i < dim) {
          acc += pl(off + i) * v(i)
          i += 1
        }
        if (acc >= 0) bkt |= (1L << b)
        b += 1
      }
      out(t) = bkt
      t += 1
    }
    new GenericArrayData(out)
  }
}

object LshFunctions {
  /** See [[LshBucketsExpr]]; `nbits` ≤ 62. */
  def lsh_buckets(v: Column, dim: Int, tables: Int, nbits: Int): Column = {
    require(dim > 0 && tables > 0 && nbits > 0 && nbits <= 62,
      s"lsh_buckets: need dim/tables/nbits > 0 and nbits <= 62 (got $dim/$tables/$nbits)")
    colshim.column(LshBucketsExpr(colshim.expression(v), dim, tables, nbits))
  }
}
