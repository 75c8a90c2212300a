package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{shim => colshim}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash kernel. `minhash_sigs(shs, k)` computes, for
  * each of k salted 48-bit hashes, the minimum over a document's
  * shingle array — arithmetic identical to k separate
  * `array_min(transform(shs, x -> hash48(x, i)))` columns (TextHash
  * .hash48: first 12 hex chars of `md5(i ++ ":" ++ x)` as a long) and
  * to the DuckDB oracle's per-band `min(...)`, but in ONE traversal
  * with a thread-local reused MD5 digest and zero per-element
  * UTF8String→String→concat allocations. The k-transforms form is k
  * interpreted higher-order passes re-hashing every shingle; this is
  * the map-side kernel that makes MinHash-LSH dedup md5-bound instead
  * of interpreter-bound (the fused-loop device [[DotFold]] applies to
  * the similarity path).
  */
case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sigs needs array<string>, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    MinHashKernel.sigs(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashKernel.sigs($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashKernel {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Salt byte prefixes "<i>:" for i in 0..63, precomputed. */
  private val salts: Array[Array[Byte]] =
    Array.tabulate(64)(i => (i.toString + ":").getBytes("UTF-8"))

  /** 48-bit salted hash — bit-identical to TextHash.hash48 (first 12
    * hex chars of md5 = first 6 bytes, big-endian, always ≥ 0). */
  def hash48(md: MessageDigest, salt: Array[Byte], s: UTF8String): Long = {
    md.reset()
    md.update(salt)
    md.update(s.getBytes)
    val d = md.digest()
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** k min-hashes in one pass; empty input → k nulls (the
    * `array_min(transform([]))` convention the oracle shares). */
  def sigs(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val md = digest.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var i   = 0
    var seen = false
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = hash48(md, salts(j), s)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (!seen) return new GenericArrayData(new Array[Any](k))
    new GenericArrayData(mins)
  }
}

object MinHashFunctions {
  /** See [[MinHashSigs]]; `k` ≤ 64. */
  def minhash_sigs(shs: Column, k: Int): Column = {
    require(k > 0 && k <= 64, "minhash_sigs: k must be in 1..64")
    colshim.column(MinHashSigs(colshim.expression(shs), k))
  }
}
