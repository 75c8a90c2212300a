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

  /** Occurrence count of the most frequent token — ONE definition of
    * the O(distinct × tokens) per-doc scan, shared by
    * [[repetitionSignals]] and [[gopherRules]]. */
  private def topWordN(toks: Column): Column =
    array_max(transform(array_distinct(toks),
      w => size(filter(toks, t => t === w))))

  /** Duplicated n-gram count of a shingle array (size − distinct). */
  private def dupNGramN(g: Column): Column =
    size(g) - size(array_distinct(g))

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
        topWordN(col("toks")).cast("long").as("top_word_n"),
        dupNGramN(col("g2")).cast("long").as("dup_2gram_n"),
        dupNGramN(col("g3")).cast("long").as("dup_3gram_n"))

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
  /** ln quantized to an integer at 1e-3 granularity with a centered
    * round — the engine-drift guard (same contract as [[bm25TopK]]'s
    * idf_q, the r8-verdict fix): the ONLY op two engines may compute
    * differently (ln, by an ulp) is pinned to an integer FIRST, and
    * everything downstream is exact integer arithmetic. A drift flip
    * would need the true value within ~1e-12 of a .5 boundary at 1e-3
    * scale, and the trial count is distinct-COUNT-sized (vocabulary),
    * not token-stream-sized. */
  private def lnQ(c: Column): Column =
    floor(lit(1000.0) * log(c.cast("double")) + lit(0.5)).cast("long")

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
        sum((lnQ(col("cnt")) - lnQ(col("tot"))) * lit(1000L)).as("__s"))
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
    * Scale shape: UNLIKE the unigram, the bigram "vocabulary" is NOT
    * bounded — on diverse text the distinct-bigram count tracks the
    * corpus, so a count-table broadcast would ship corpus-sized state
    * to every executor. Count in place instead: two partition-count
    * windows over the gram stream (c(w1 w2), then c(w1 ·) — the
    * denominator is just the gram count sharing w1, no separate
    * unigram table needed), then the per-doc fold. One tokenize pass,
    * three shuffles of the gram stream, zero broadcast — the same
    * plan at any corpus size. FLOOR(ln p · 1e6) integer sums keep the
    * score independent of summation order. */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .select(col("doc_id"), tokens(coalesce(col("text"), lit(""))).as("toks"))
      .select(col("doc_id"), explode_outer(shingles("toks", 2)).as("bg"))
      .filter(col("bg").isNotNull)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("c2", count(lit(1)).over(Window.partitionBy(col("bg"))))
      .withColumn("c1", count(lit(1)).over(Window.partitionBy(col("w1"))))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum((lnQ(col("c2")) - lnQ(col("c1"))) * lit(1000L)).as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__s").cast("double") / (col("n_bigrams") * 1000000.0), 4).as("avg_logp"))
  }

  /** The Gopher/MassiveText quality-rule BUNDLE (Rae et al. 2021 §A1.1,
    * word-level adaptation): the per-document keep verdict production
    * filters actually apply, composed from the integer-exact signals
    * the individual operators expose. Every rule is an INTEGER
    * comparison (fractions cross-multiplied), so the verdict is
    * engine-exact:
    *   - r_words:    minWords ≤ n_tokens ≤ maxWords
    *   - r_mean_len: 3 ≤ mean alphanumeric-chars-per-token ≤ 10
    *                 (3·n ≤ alpha_chars ≤ 10·n)
    *   - r_top:      top word ≤ 20% of tokens (top·5 ≤ n)
    *   - r_dup2:     duplicate 2-grams ≤ 20% of 2-grams (dup·5 ≤ |g2|)
    *   - r_stop:     ≥ 2 stopword hits
    * keep = all of the above. Pure map-side — one projection, no
    * shuffle at any scale (e23's shape with a verdict head). */
  def gopherRules(docs: DataFrame, minWords: Int = 20,
      maxWords: Int = 100000): DataFrame = {
    val p = padded(col("text"))
    val stopHits = profiles.flatMap(_._2).map(t => cnt(p, t)).reduce(_ + _)
    docs
      .select(col("doc_id"), col("text"),
        tokens(coalesce(col("text"), lit(""))).as("toks"),
        stopHits.cast("long").as("__stop"))
      .select(col("doc_id"), col("toks"), col("__stop"),
        length(regexp_replace(normText(coalesce(col("text"), lit(""))),
          "[^a-z0-9]", "")).cast("long").as("__alpha"),
        shingles("toks", 2).as("__g2"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) >= minWords && size(col("toks")) <= maxWords)
          .as("r_words"),
        (lit(3) * size(col("toks")) <= col("__alpha") &&
          col("__alpha") <= lit(10) * size(col("toks"))).as("r_mean_len"),
        (topWordN(col("toks")) * 5 <= size(col("toks"))).as("r_top"),
        (dupNGramN(col("__g2")) * 5 <= size(col("__g2"))).as("r_dup2"),
        (col("__stop") >= 2).as("r_stop"))
      .withColumn("keep",
        col("r_words") && col("r_mean_len") && col("r_top") &&
          col("r_dup2") && col("r_stop"))
  }

  /** tf-idf top-`k` terms per document — the classic salient-term
    * signal (term routing, topic tagging, index keys for a corpus
    * catalog). score = tf · ln((N+1)/(df+1)), quantized FLOOR(·1e6)
    * so the rank order is engine-independent; ties break on the term
    * string ascending.
    *
    * Scale shape: one shuffle onto (doc_id, token) for tf; df is an
    * aggregate of THAT aggregate (vocabulary-bounded, broadcast); the
    * doc count rides as a 1-row broadcast; the final top-k rank window
    * partitions by doc_id — bounded partitions at any corpus size. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NO coalesce on text: a NULL-text doc must be ABSENT (tokens(NULL)
    // explodes to nothing after the null filter), matching the oracle's
    // unnest-over-NULL behavior — the same contract as unigramLogProb
    val tf = docs
      .select(col("doc_id"), explode_outer(tokens(col("text"))).as("tok"))
      .filter(col("tok").isNotNull)
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_q").desc, col("tok"))
    tf
      .join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score_q",
        col("tf") * (lnQ(col("n_docs") + lit(1)) - lnQ(col("df") + lit(1))) * lit(1000L))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("tok"), col("score_q"))
  }

  /** CCNet-style perplexity bucketing: split the corpus into
    * head/middle/tail terciles of the LM quality score
    * ([[unigramLogProb]] — highest avg log-prob = most "fluent" =
    * head, the CCNet convention). Three paths, scale-safe by DEFAULT:
    *   - default (`thresholds = None`, `exactNtile = false`): derive
    *     the two tercile cutoffs with one mergeable
    *     `approx_percentile` aggregate over the per-doc score frame
    *     (CCNet itself thresholds against sample-derived cutoffs),
    *     broadcast the 1-row cutoffs, bucket map-side. No global sort
    *     at ANY corpus size — a naive caller cannot hit a
    *     single-partition window (PlanShapeSpec pins it).
    *   - `thresholds = Some((headMin, midMin))`: map-side bucketing
    *     against caller-precomputed cutoffs (e.g. from a sampled
    *     profiling pass over a 100 TB corpus).
    *   - `exactNtile = true`: exact rank terciles via one ntile window
    *     over the PER-DOC score frame (already aggregated — corpus
    *     text never reaches the sort). Deliberately opt-in: the window
    *     is corpus-doc-count-sized and single-partition. The
    *     deterministic (avg_logp desc, doc_id) ordering makes the
    *     split engine-reproducible, which is what the declared e38
    *     oracle pins.
    */
  def pplBuckets(docs: DataFrame,
      thresholds: Option[(Double, Double)] = None,
      exactNtile: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!(exactNtile && thresholds.isDefined),
      "pass either thresholds or exactNtile, not both")
    val scored = unigramLogProb(docs).select(col("doc_id"), col("avg_logp"))
    if (exactNtile) {
      val w = Window.orderBy(col("avg_logp").desc, col("doc_id"))
      scored
        .withColumn("__t", ntile(3).over(w))
        .withColumn("ppl_bucket",
          when(col("__t") === 1, "head")
            .when(col("__t") === 2, "middle").otherwise("tail"))
        .drop("__t")
    } else thresholds match {
      case Some((headMin, midMin)) =>
        scored.withColumn("ppl_bucket",
          when(col("avg_logp") >= headMin, "head")
            .when(col("avg_logp") >= midMin, "middle")
            .otherwise("tail"))
      case None =>
        // self-derived cutoffs: head = top third, middle = next third
        val cuts = scored.agg(
          expr("approx_percentile(avg_logp, 2.0/3.0)").as("__head_min"),
          expr("approx_percentile(avg_logp, 1.0/3.0)").as("__mid_min"))
        scored.crossJoin(broadcast(cuts))
          .withColumn("ppl_bucket",
            when(col("avg_logp") >= col("__head_min"), "head")
              .when(col("avg_logp") >= col("__mid_min"), "middle")
              .otherwise("tail"))
          .drop("__head_min", "__mid_min")
    }
  }

  /** Per-source corpus report card — the profiling aggregate a dataset
    * team runs before training: document count, token volume, exact-dup
    * rate (distinct normalized-md5 vs rows), declared-language mix,
    * and mean quality (FLOOR(·1e4) integer mean so the report is
    * engine-exact). One shuffle on the source key; every input column
    * is map-side derived — the canonical partial/final aggregation
    * shape at any corpus size. */
  def corpusReport(docs: DataFrame): DataFrame = {
    val q = qualityScore(docs).select(col("doc_id"), col("quality"))
    docs
      .select(col("doc_id"), col("source"), col("lang"),
        size(tokens(coalesce(col("text"), lit("")))).cast("long").as("__tok"),
        md5(normText(col("text"))).as("__fp"))
      .join(q, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        count_distinct(col("__fp")).as("uniq_docs"),
        count(when(col("lang") === "en", 1)).as("n_en"),
        count(when(col("lang") =!= "en", 1)).as("n_other"),
        sum(floor(col("quality") * 10000).cast("long")).as("__qsum"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("uniq_docs"), (col("n_docs") - col("uniq_docs")).as("dups"),
        col("n_en"), col("n_other"),
        round(col("__qsum").cast("double") / (col("n_docs") * 10000.0), 4)
          .as("mean_quality"))
  }

  /** BPE tokenizer training — the first `rounds` merge rules (Sennrich
    * et al. 2016), the `merges.txt` artifact a tokenizer build emits.
    * The classic scale trick is built in: the corpus token stream is
    * collapsed to a WORD-FREQUENCY table first (vocabulary-bounded),
    * and every merge round touches only that table — pair counts are
    * aggregates of the word table weighted by word frequency, never a
    * second corpus pass. Each word is carried as a symbol string where
    * EVERY symbol owns a space on both sides (`" a  b  c "` — double
    * spaces between symbols, so adjacent pair occurrences in a run
    * like `aaaa` share no delimiter characters); a merge is one
    * literal `replace` of `" p1  p2 "` with `" p1p2 "`, whose
    * left-to-right non-overlapping semantics are exactly BPE's greedy
    * in-word merge order (`aaaa` → `[aa, aa]`) AND are identical
    * across engines, so the oracle replays the same rounds as staged
    * CTEs. The winning pair each round is max count, tie →
    * lexicographic pair — fully deterministic. The per-round winner
    * stays a 1-row broadcast inside ONE lazy plan (no driver collect);
    * `rounds` is a small constant, so the re-derivation of earlier
    * rounds inside later ones is a bounded constant factor on a
    * vocabulary-sized table. */
  def bpeMerges(docs: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 8, "rounds is a bounded constant")
    val words0 = docs
      .select(explode_outer(tokens(coalesce(col("text"), lit("")))).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      // " a  b  c " — every symbol owns one space on each side (runs
      // like `aaaa` then share no delimiter chars between occurrences)
      .select(col("cnt"),
        regexp_replace(col("tok"), "(.)", " $1 ").as("sym"))
    def pairCounts(words: DataFrame): DataFrame =
      words
        .select(col("cnt"), split(trim(col("sym")), "  ").as("syms"))
        .select(col("cnt"), explode(shingles("syms", 2)).as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("n"))
    val (_, winners) = (1 to rounds).foldLeft((words0, Seq.empty[DataFrame])) {
      case ((words, acc), r) =>
        val win = pairCounts(words)
          .orderBy(col("n").desc, col("pair")).limit(1)
          .select(lit(r).as("round"), col("pair"),
            replace(col("pair"), lit(" "), lit("")).as("merged"), col("n"))
        val next = words
          .crossJoin(broadcast(win.select(col("pair").as("__p"))))
          .select(col("cnt"),
            replace(col("sym"),
              // " p1  p2 " → " p1p2 ": the merged symbol's own spaces
              concat(lit(" "), replace(col("__p"), lit(" "), lit("  ")),
                lit(" ")),
              concat(lit(" "), replace(col("__p"), lit(" "), lit("")),
                lit(" "))).as("sym"))
        (next, acc :+ win)
    }
    winners.reduce(_ union _).orderBy("round")
  }

  /** The ENCODE half of BPE ([[bpeMerges]] is the train half): apply
    * the first `rounds` learned merges to every word of the corpus, in
    * learned order — exactly how a trained tokenizer encodes — and
    * report per-document symbol counts (whitespace tokens, initial
    * character symbols, post-merge BPE symbols). The compression
    * `n_chars → n_bpe` is the signal a tokenizer build watches.
    *
    * The merge table is derived lazily from the same plan (1-row
    * winner per round, pivoted to one broadcast row); application is
    * the same literal delimiter-framed `replace` as training, folded
    * over the corpus token stream MAP-SIDE — one aggregate by doc at
    * the end, nothing else shuffles. */
  def bpeEncode(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val merges = bpeMerges(docs, rounds)
    // per-round 1-row aggregates (max over ≤1 row): a round that ran
    // dry yields NULL — its replace below is a guarded no-op — instead
    // of an empty frame whose crossJoin would wipe out the corpus
    val wins = (1 to rounds).map(r =>
        merges.filter(col("round") === r).agg(max(col("pair")).as(s"__p$r")))
      .reduce(_ crossJoin _)
    val toks = docs
      .select(col("doc_id"),
        explode_outer(tokens(coalesce(col("text"), lit("")))).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .withColumn("sym", regexp_replace(col("tok"), "(.)", " $1 "))
    val applied = (1 to rounds).foldLeft(toks.crossJoin(broadcast(wins))) {
      (df, r) =>
        df.withColumn("sym",
          when(col(s"__p$r").isNull, col("sym")).otherwise(
            replace(col("sym"),
              concat(lit(" "), replace(col(s"__p$r"), lit(" "), lit("  ")),
                lit(" ")),
              concat(lit(" "), replace(col(s"__p$r"), lit(" "), lit("")),
                lit(" ")))))
    }
    applied
      .select(col("doc_id"), length(col("tok")).cast("long").as("__chars"),
        size(split(trim(col("sym")), "  ")).cast("long").as("__bpe"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__chars")).as("n_chars"),
        sum(col("__bpe")).as("n_bpe"))
  }

  /** Tokenizer vocabulary build with a coverage cutoff: rank tokens by
    * corpus frequency (tie → token ascending) and keep the smallest
    * prefix whose cumulative token mass reaches `coveragePct` — the
    * vocab-size-vs-OOV-rate decision made explicit. The membership
    * test is integer cross-multiplied ((cum−cnt)·100 < tot·pct: a
    * token is in iff coverage was still short of the target BEFORE
    * it), so the verdict is engine-exact. One vocabulary aggregate +
    * one rank/prefix-sum window over the VOCAB table (bounded, like
    * e25's broadcast); at a vocabulary too large for one partition the
    * e24-style two-level pre-prune applies unchanged since ranks below
    * any bucket's cap can never enter the vocab. */
  def vocabCoverage(docs: DataFrame, coveragePct: Int = 95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode_outer(tokens(coalesce(col("text"), lit("")))).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("tot"))
    val w = Window.orderBy(col("cnt").desc, col("tok"))
    counts
      .crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum",
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("in_vocab",
        (col("cum") - col("cnt")) * 100 < col("tot") * coveragePct)
      .select(col("tok"), col("cnt"), col("rank"), col("cum"),
        col("in_vocab"))
  }

  /** Windowed LM quality — local-quality detection inside documents
    * (the paragraph-granular CCNet move, fixed-width form): the
    * document's token stream splits into consecutive `width`-token
    * windows, each window gets the corpus-unigram mean log-prob
    * ([[unigramLogProb]]'s exact arithmetic at window granularity),
    * and the document reports its window count plus its WORST and
    * best window — a good document with one spam/garbage section
    * (which a whole-doc mean averages away) surfaces through the
    * worst-window score.
    *
    * Per-window means are ROUND(Σ⌊ln p·1e6⌋ / (n·1e6), 4) like e25 —
    * integer sums, order-independent; the worst/best pick orders by
    * (score, window idx), engine-stable. Plan: one posexplode pass,
    * the e25 vocab broadcast, a (doc, window) aggregate, then a per-doc
    * aggregate — window count per doc is length-bounded, nothing
    * corpus-sized enters a window function. */
  def windowPpl(docs: DataFrame, width: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = docs
      .select(col("doc_id"), posexplode_outer(tokens(col("text"))))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "tok")
      .filter(col("tok").isNotNull)
      .withColumn("win", (col("p") / width).cast("long"))
    val vocab = pairs.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = vocab.agg(sum(col("cnt")).as("tot"))
    val winScores = pairs
      .join(broadcast(vocab), Seq("tok"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"), col("win"))
      .agg(count(lit(1)).as("n_tokens"),
        sum((lnQ(col("cnt")) - lnQ(col("tot"))) * lit(1000L)).as("__s"))
      .withColumn("win_logp",
        round(col("__s").cast("double") / (col("n_tokens") * 1000000.0), 4))
    val worst = Window.partitionBy(col("doc_id"))
      .orderBy(col("win_logp").asc, col("win").asc)
    val best = Window.partitionBy(col("doc_id"))
      .orderBy(col("win_logp").desc, col("win").asc)
    winScores
      .withColumn("__rw", row_number().over(worst))
      .withColumn("__rb", row_number().over(best))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        max(when(col("__rw") === 1, col("win"))).as("worst_win"),
        max(when(col("__rw") === 1, col("win_logp"))).as("worst_logp"),
        max(when(col("__rb") === 1, col("win_logp"))).as("best_logp"))
  }

  /** N-gram novelty scoring — the memorization/boilerplate-risk signal:
    * per document, how much of its distinct `n`-gram shingle set is
    * NOVEL (appears in no other document) vs shared corpus-wide. High
    * shared ratio = template/boilerplate-like or duplicated content
    * (even when no single pair crosses a dedup threshold); high
    * novelty = unique text. Emits the counts plus
    * `novelty_q = ⌊(novel · 1e6) / n_shingles⌋` — integer division of
    * exact counts, engine-identical.
    *
    * Shape: distinct (doc, shingle-hash) stream → one document-
    * frequency aggregate on the hash (shingle-vocabulary-sized — the
    * e44 argument: the distinct-shingle space, not the corpus pair
    * space) → join back → one per-doc aggregate. Two shuffles of the
    * shingle stream at any corpus size. */
  def noveltyScore(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = docs
      .select(col("doc_id"), tokens(coalesce(col("text"), lit(""))).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(shingles("toks", n))).as("sh"))
      .select(col("doc_id"), hash48(col("sh"), "novelty").as("h"))
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    sh.join(dfreq, Seq("h"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        count(when(col("df") >= 2, 1)).as("n_shared"))
      .withColumn("n_novel", col("n_shingles") - col("n_shared"))
      .withColumn("novelty_q",
        expr("(n_novel * 1000000) div n_shingles"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        col("n_novel"), col("novelty_q"))
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

  /** BM25 lexical retrieval: top-`k` corpus documents per query — the
    * sparse-retrieval half of a data-curation / RAG stack (the dense
    * half is Similarity's ANN family). Queries are rows matching
    * `queryPred` (a bounded slice by contract, like e61's bitext src
    * side); each query's terms are the distinct first `nQueryTerms`
    * tokens of its text.
    *
    * score(q,d) = Σ_t FLOOR(idf_q(t)·1e3 · tf·(k1+1) /
    *   (tf + k1·(1-b + b·dl/avgdl))) where
    * idf_q = FLOOR(1e3·ln(1+(N-df+½)/(df+½)) + ½) — the ONLY
    * engine-variant op (`ln`: JVM Math.log vs a DuckDB build's libm
    * can differ by an ulp) is quantized to an integer FIRST, per TERM,
    * at 1e-3 granularity with a centered round, so a last-ulp ln drift
    * would have to land within ~1e-12 of a .5 boundary on one of the
    * few hundred distinct query terms to flip anything; everything
    * downstream of idf_q is IEEE mul/div/add on exactly-representable
    * inputs with identical association on both engines — bit-exact.
    * Per-term quantization before the integer sum also makes the total
    * independent of engine summation order, and the rank tie-break is
    * (score desc, doc_id asc): fully engine-stable (the e37/e61
    * contract).
    *
    * Scale shape: the broadcast query-term set prunes the exploded
    * token stream MAP-SIDE *before* any aggregate, so the only shuffle
    * carries query-term postings (term-occurrence-sized), never the
    * corpus token stream; dl rides along from the pre-explode map
    * stage; df is an aggregate of the postings aggregate
    * (query-term-bounded, broadcast) and stats a 1-row broadcast; the
    * top-k window partitions per query (bounded frames). For repeated
    * query batches at 100 TB, materialize the un-pruned (doc, tok, tf,
    * dl) aggregate once bucketed by term — the inverted index — and
    * this same plan reads only its postings buckets. */
  def bm25TopK(docs: DataFrame, queryPred: Column, nQueryTerms: Int = 6,
      k: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
    val queries = corpus.filter(queryPred)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(slice(col("toks"), 1, nQueryTerms))).as("tok"))
    val qterms = queries.select("tok").distinct()
    val tfq = corpus
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .join(broadcast(qterms), Seq("tok")) // map-side prune BEFORE the aggregate
      .groupBy("doc_id", "tok")
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("tf"))
    val dfreq = tfq.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = corpus.agg(count(lit(1)).as("n_docs"),
      (sum(size(col("toks")).cast("long")).cast("double") /
        count(lit(1))).as("avgdl"))
    // expression association mirrors the oracle SQL exactly, and k1+1 /
    // 1-b stay RUNTIME double ops from the same decimal literals on
    // both engines (a Scala-side constant fold could round differently
    // than DuckDB's). idf is integer-quantized FIRST (see scaladoc) so
    // the transcendental never reaches the outer floor —
    // ((idf_q·1e3)·(tf·(k1+1)))/(tf + k1·((1-b) + (b·dl)/avgdl))
    val idfQ = floor(
      lit(1000.0) *
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) +
        lit(0.5))
      .cast("long")
    val contrib = floor(
      idfQ.cast("double") * lit(1000.0) *
        (col("tf") * (lit(k1) + lit(1.0))) /
        (col("tf") + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * col("dl") / col("avgdl"))))
      .cast("long")
    val scored = tfq
      .join(broadcast(queries), Seq("tok"))
      .join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("c_q", contrib)
      .groupBy("query_id", "doc_id")
      .agg(sum(col("c_q")).as("score_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_q").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score_q")
  }
}
