package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextHash.hash48

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (one broadcast of the
  * query set — the candidate scan is embarrassingly parallel and never
  * shuffles the corpus). The LSH variant (random ±1 hyperplane signs)
  * is the scale path: bucket-join candidates, then exact re-rank —
  * the same candidates-only shape as MinHash.
  *
  * All arithmetic is a left-to-right double fold (zip_with + aggregate)
  * so results are bit-identical to the DuckDB oracle's list_reduce.
  */
object Similarity {

  /** Cosine similarity of two array<float/double> columns, computed as
    * sequential double folds (deterministic across engines). */
  def cosine(a: Column, b: Column): Column = {
    def fold(arr: Column): Column =
      aggregate(arr, lit(0.0), (acc, v) => acc + v)
    val dot = fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
    val na  = fold(zip_with(a, a, (x, y) => x.cast("double") * y.cast("double")))
    val nb  = fold(zip_with(b, b, (x, y) => x.cast("double") * y.cast("double")))
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding self). Query side is broadcast; rank
    * ties break on (rounded sim DESC, vec_id ASC) for determinism. */
  def bruteTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qv"), col("embedding")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** All near-duplicate vector pairs with cosine ≥ threshold (brute
    * pair scan — bounded corpora; LSH path below for scale). */
  def embeddingNearDups(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("i"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("j"), col("embedding").as("vb"))
    a.join(b, col("i") < col("j"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select("i", "j", "sim")
  }

  /** Random-hyperplane LSH bucket id per vector: `nbits` sign bits of
    * dot products with deterministic ±1 hyperplanes (component signs
    * derived from hash48 of (table, bit, dim) — reproducible with no
    * stored model). One map-side pass. */
  def lshBucket(emb: Column, dim: Int, table: Int, nbits: Int): Column = {
    val bits = (0 until nbits).map { b =>
      // dot(v, plane_{table,b}) where plane components are ±1
      val terms = (0 until dim).map { d =>
        val sign = if (((scala.util.hashing.MurmurHash3
          .stringHash(s"$table:$b:$d", 42)) & 1) == 1) 1.0 else -1.0
        element_at(emb, d + 1).cast("double") * lit(sign)
      }
      val dot = terms.reduce(_ + _)
      when(dot >= 0, lit(1L << b)).otherwise(0L)
    }
    bits.reduce((a, b) => a + b)
  }

  /** ANN top-k via LSH candidate buckets + exact re-rank. `tables`
    * independent hash tables unioned map-side; candidates = vectors
    * sharing any bucket with the query; exact cosine re-ranks. */
  def annTopK(emb: DataFrame, queryPred: Column, k: Int,
      dim: Int = 64, tables: Int = 12, nbits: Int = 6): DataFrame = {
    val bucketed = (0 until tables).map { t =>
      emb.select(col("vec_id"), col("embedding"),
        lit(t).as("tbl"), lshBucket(col("embedding"), dim, t, nbits).as("bucket"))
    }.reduce(_ unionByName _)
    val q = bucketed.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("tbl"), col("bucket"))
    val cands = bucketed
      .join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"), col("embedding"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    cands
      .withColumn("sim", round(cosine(col("qv"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
  }
}
