package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic text hashing shared by the dedup/similarity
  * operators AND their DuckDB oracles: every primitive here has an
  * exact SQL twin (md5 is bit-identical across engines; the 48-bit
  * integer is parsed from its first 12 hex chars), so pipelines built
  * on it hash-match the oracle. At cluster scale all of these are
  * embarrassingly parallel map-side expressions.
  */
object TextHash {

  /** Whitespace-normalized lowercase text.
    * DuckDB twin: lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Word tokens of normalized text. DuckDB twin: string_split(norm, ' ') */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Word n-gram shingles from a token array column named `toks`.
    * DuckDB twin: list_transform(range(len(toks)-(n-1)), i -> toks[i+1] || ' ' || ...) */
  def shingles(toksCol: String, n: Int = 3): Column = {
    val parts = (0 until n).map(j => s"$toksCol[i + $j]").mkString(", ' ', ")
    // guard: sequence(0, negative) DESCENDS in Spark, so a doc with
    // fewer than n tokens must short-circuit to the empty set (the
    // DuckDB twin's range(len-(n-1)) is empty there)
    expr(s"CASE WHEN size($toksCol) >= $n THEN " +
      s"transform(sequence(0, size($toksCol) - $n), i -> concat($parts)) " +
      "ELSE array() END")
  }

  /** 48-bit salted hash: first 12 hex chars of md5(salt:text) as a long.
    * DuckDB twin:
    *   list_reduce(list_transform(string_split_regex(substr(md5(salt || ':' || x), 1, 12), ''),
    *     c -> strpos('0123456789abcdef', c) - 1), (a, b) -> a * 16 + b)
    */
  def hash48(c: Column, salt: Column): Column =
    conv(substring(md5(concat(salt, lit(":"), c)), 1, 12), 16, 10).cast("long")

  def hash48(c: Column, salt: String): Column = hash48(c, lit(salt))

  /** SQL twin builders (used to generate the oracle strings). */
  object Sql {
    def normText(c: String): String =
      s"lower(trim(regexp_replace($c, '\\s+', ' ', 'g')))"
    def tokens(c: String): String = s"string_split(${normText(c)}, ' ')"
    def shingles(toks: String, n: Int = 3): String = {
      val parts = (0 until n).map(j => s"$toks[i + ${j + 1}]").mkString(" || ' ' || ")
      s"list_transform(range(len($toks) - ${n - 1}), i -> $parts)"
    }
    def hash48(c: String, salt: String): String =
      s"list_reduce(list_transform(string_split_regex(substr(md5($salt || ':' || $c), 1, 12), ''), " +
        s"c -> strpos('0123456789abcdef', c) - 1), (a, b) -> a * 16 + b)"
  }
}
