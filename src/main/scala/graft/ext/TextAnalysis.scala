package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHash._

/** Text-analysis operators: language-ID (stopword-profile heuristic),
  * quality scoring, token counting, and document fingerprinting. All
  * are single-pass map-side expressions — no shuffle at any scale —
  * with exact DuckDB twins.
  */
object TextAnalysis {

  /** Language profiles: characteristic function words per language.
    * (The heuristic is the deterministic n-gram/stopword scorer; on
    * this synthetic corpus it measures the operators, not linguistics.) */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " la "),
    "es" -> Seq(" el ", " y ", " los ")
  )

  /** Occurrences of `term` in ` norm ` via length-difference (portable:
    * identical REPLACE semantics in Spark and DuckDB). */
  private def cnt(padded: Column, term: String): Column =
    ((length(padded) - length(replace(padded, lit(term), lit("")))) / term.length).cast("long")

  private def padded(text: Column): Column =
    concat(lit(" "), normText(text), lit(" "))

  /** Per-doc language scores + argmax prediction (ties break in
    * profile order). */
  def langId(docs: DataFrame): DataFrame = {
    val p = padded(col("text"))
    val scored = profiles.foldLeft(docs.select(col("doc_id"), p.as("__p"))) {
      case (df, (lang, terms)) =>
        df.withColumn(s"s_$lang", terms.map(t => cnt(col("__p"), t)).reduce(_ + _))
    }
    // argmax with first-profile-wins tie-break: a when-chain where each
    // language claims the prediction if >= all later ones (exact twin
    // of the oracle's CASE chain)
    val langs = profiles.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((lang, idx), rest) =>
        val laterGe = langs.drop(idx + 1)
          .map(o => col(s"s_$lang") >= col(s"s_$o")).reduce(_ && _)
        when(laterGe, lit(lang)).otherwise(rest)
    }
    scored
      .withColumn("pred_lang", pred)
      .drop("__p")
  }

  /** Quality scoring: length, token stats, stopword ratio, alpha ratio,
    * and a composite score (all arithmetic, portable). */
  def qualityScore(docs: DataFrame): DataFrame = {
    val p = padded(col("text"))
    val nTok = size(tokens(col("text"))).cast("long")
    val stopHits = profiles.flatMap(_._2).map(t => cnt(p, t)).reduce(_ + _)
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      nTok.as("n_tokens"),
      round(length(regexp_replace(normText(col("text")), "[^a-z0-9]", ""))
        .cast("double") / length(normText(col("text"))), 4).as("alpha_ratio"),
      round(stopHits.cast("double") / nTok, 4).as("stop_ratio"),
      round(least(lit(1.0), nTok.cast("double") / 100.0) *
        (lit(1.0) - stopHits.cast("double") / nTok), 4).as("quality")
    )
  }

  /** Token counting: whitespace tokens, regex word tokens (BPE-ish
    * pre-tokenizer pattern), distinct tokens. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("re_tokens"),
      size(array_distinct(tokens(col("text")))).cast("long").as("distinct_tokens")
    )

  /** Repetition signals (the Gopher/MassiveText repetition filters,
    * word-level): per document, the token count, the occurrence count
    * of its most frequent token, and the number of duplicated word
    * 2-/3-grams. All counts are INTEGERS — the downstream filter
    * thresholds them as fractions, but emitting counts keeps the
    * declared query exactly hash-comparable with no float rounding.
    * Pure map-side (one projection, no shuffle at any scale); the
    * per-doc top-token scan is O(distinct × tokens) on a bounded
    * document, not a corpus aggregate. */
  def repetitionSignals(docs: DataFrame): DataFrame =
    docs
      // null text behaves as empty text (the oracle twin coalesces the
      // same way; without it the two engines disagree on NULL rows)
      .select(col("doc_id"), tokens(coalesce(col("text"), lit(""))).as("toks"))
      .select(col("doc_id"), col("toks"),
        shingles("toks", 2).as("g2"), shingles("toks", 3).as("g3"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        array_max(transform(array_distinct(col("toks")),
          w => size(filter(col("toks"), t => t === w))))
          .cast("long").as("top_word_n"),
        (size(col("g2")) - size(array_distinct(col("g2"))))
          .cast("long").as("dup_2gram_n"),
        (size(col("g3")) - size(array_distinct(col("g3"))))
          .cast("long").as("dup_3gram_n"))

  /** Corpus-trained unigram log-probability score (the CCNet-style LM
    * quality signal, reduced to its order-0 form): per document, the
    * mean ln p(token) under the corpus' own unigram distribution.
    * Low (very negative) = rare-token-heavy text; high = common-token
    * boilerplate.
    *
    * Two aggregates: vocabulary counts (map-combined; vocabulary is
    * bounded, so the result broadcasts), then a per-doc mean over a
    * broadcast join — the token stream itself is never shuffled except
    * by doc_id for the final partial/final average. The corpus total
    * rides along as a broadcast scalar, keeping the whole operator one
    * lazy plan (no driver collect).
    *
    * The mean sums FLOOR(ln p · 1e6) longs, not doubles: integer sums
    * are order-independent, so the score cannot drift with partition
    * layout or engine summation order (the same quantization contract
    * as the IVF centroid trainer). 1e-6 is far below any quality
    * signal. */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), explode_outer(tokens(col("text"))).as("tok"))
      .filter(col("tok").isNotNull)
    val vocab = pairs.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = vocab.agg(sum(col("cnt")).as("tot"))
    pairs
      .join(broadcast(vocab), Seq("tok"))
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(floor((log(col("cnt").cast("double")) - log(col("tot").cast("double"))) * 1000000)
          .cast("long")).as("__s"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__s").cast("double") / (col("n_tokens") * 1000000.0), 4).as("avg_logp"))
  }

  /** Order-1 (bigram) conditional log-probability score: per document,
    * the mean ln P(w_i | w_{i-1}) with P = c(w_{i-1} w_i) / c(w_{i-1} ·),
    * both counts trained on the corpus itself — the next step up from
    * [[unigramLogProb]] and the shape for any higher-order n-gram LM
    * signal (swap the shingle width). Documents with fewer than two
    * tokens have no bigrams and are absent from the output (the oracle
    * twin agrees).
    *
    * Same scale shape as the unigram: two bounded count aggregates
    * broadcast back over the bigram stream, FLOOR(ln p · 1e6) integer
    * sums so the score is independent of summation order. */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("doc_id"), tokens(coalesce(col("text"), lit(""))).as("toks"))
      .select(col("doc_id"), explode_outer(shingles("toks", 2)).as("bg"))
      .filter(col("bg").isNotNull)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val big = grams.groupBy("bg").agg(count(lit(1)).as("c2"))
    val uni = grams.groupBy("w1").agg(count(lit(1)).as("c1"))
    grams
      .join(broadcast(big), Seq("bg"))
      .join(broadcast(uni), Seq("w1"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(floor((log(col("c2").cast("double")) - log(col("c1").cast("double"))) * 1000000)
          .cast("long")).as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__s").cast("double") / (col("n_bigrams") * 1000000.0), 4).as("avg_logp"))
  }

  /** Document fingerprinting: exact md5 of normalized text + a
    * winnowing-style signature (min 48-bit shingle hash — the rolling
    * hash's minimum, the standard winnow anchor). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        md5(normText(col("text"))).as("md5_fp"),
        array_min(transform(shingles("toks"),
          sh => hash48(sh, "w"))).as("winnow_min"))
}
