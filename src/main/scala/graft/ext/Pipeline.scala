package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextHash._

/** Corpus-preparation operators a training-data pipeline runs after
  * dedup/quality (SURVEY.md §2.10): deterministic splits and samples,
  * sequence packing, benchmark decontamination, and PII scrubbing.
  *
  * Everything here is built from the portable [[TextHash]] primitives,
  * so each operator has an exact DuckDB oracle twin, and every design
  * is shuffle-minimal: splits/samples/scrubs are pure map-side
  * projections; packing shuffles once on its shard key; decontamination
  * joins on 48-bit shingle hashes (longs, never the shingle strings).
  */
object Pipeline {

  /** Deterministic train/val/test assignment: bucket = salted 48-bit
    * hash of the id modulo 100, split by cumulative percentage. Pure
    * map-side (no shuffle, no state) and stable under re-runs,
    * insertions, and re-partitioning — the property that matters at
    * 100 TB, where a `rand()` split is irreproducible and a sort-based
    * split moves the corpus. */
  def trainSplit(docs: DataFrame, idCol: String = "doc_id",
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct <= 100, "split percentages exceed 100")
    docs
      .withColumn("bucket",
        (hash48(col(idCol).cast("string"), "split") % 100).cast("int"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Approximate-fraction deterministic sample: keep ids whose salted
    * hash falls below frac·2^48. Map-side only — THE 100 TB sampling
    * shape (no shuffle, no count pass); the realized fraction deviates
    * by O(1/√n). Different salts give independent samples. */
  def hashSample(docs: DataFrame, frac: Double, idCol: String = "doc_id",
      salt: String = "sample"): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac must be in [0,1], got $frac")
    docs.filter(
      hash48(col(idCol).cast("string"), salt) < lit((frac * (1L << 48)).toLong))
  }

  /** Exact-fraction stratified sample: within each stratum, rank docs
    * by (salted hash, id) and keep the first ⌈frac·n⌉. One shuffle on
    * the stratum key; the per-stratum sort is the price of exactness —
    * use [[hashSample]] when approximate fractions suffice. Heavy
    * strata are ordinary window skew (AQE handles the shuffle; the
    * rank itself is a streaming window, no materialized buffer). */
  def stratifiedSample(docs: DataFrame, stratum: Column, frac: Double,
      idCol: String = "doc_id"): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac must be in [0,1], got $frac")
    val w  = Window.partitionBy(stratum)
      .orderBy(hash48(col(idCol).cast("string"), "sample"), col(idCol))
    val cw = Window.partitionBy(stratum)
    docs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__rn") <= ceil(col("__n") * frac))
      .drop("__rn", "__n")
  }

  /** Next-fit sequence packing: assign documents (in id order, within a
    * deterministic hash shard) to fixed-capacity context windows — the
    * batch-assembly step of LLM pretraining. A document that would
    * overflow the open pack starts a new one; a document longer than
    * `capacity` gets a pack of its own (callers chunk or drop it).
    *
    * Packing is inherently sequential, so the distributed shape is
    * shard-parallel: one shuffle on the salted shard key, then a pure
    * in-memory fold per shard. Any partition of the corpus into shards
    * yields a valid packing (packs never span shards), so `shards`
    * simply scales out — size it so a shard's (id, n_tokens) pairs fit
    * an executor (16 bytes/doc: ~60M docs/GiB; the TEXT never moves,
    * only ids and counts shuffle).
    *
    * Returns (shard, doc_id, n_tokens, pack_id, pack_fill) with
    * pack_id numbered per shard and pack_fill the running token count
    * after placing the doc. */
  def packSequences(docs: DataFrame, capacity: Long, shards: Int): DataFrame = {
    require(capacity > 0 && shards > 0, "capacity and shards must be positive")
    val sp = docs.sparkSession
    import sp.implicits._
    docs
      .select(
        col("doc_id").cast("long"),
        (hash48(col("doc_id").cast("string"), "shard") % shards).cast("int").as("shard"),
        // null text counts as empty (its single '' token) — without the
        // coalesce the non-nullable tuple encoder below throws on NULL
        size(tokens(coalesce(col("text"), lit("")))).cast("long").as("n_tokens"))
      .as[(Long, Int, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (shard, it) =>
        val sorted = it.toArray.sortBy(_._1)
        var pack = 0L
        var fill = 0L
        sorted.iterator.map { case (id, _, t) =>
          if (fill > 0 && fill + t > capacity) { pack += 1; fill = t }
          else fill += t
          (shard, id, t, pack, fill)
        }
      }
      .toDF("shard", "doc_id", "n_tokens", "pack_id", "pack_fill")
  }

  /** Benchmark decontamination: training documents sharing at least
    * `minShared` distinct word `n`-gram shingles with any benchmark
    * document (the n-gram-overlap test run before training to keep
    * eval data out of the corpus). Returns (train_id, bench_id,
    * shared) contaminated pairs.
    *
    * The join key is the 48-bit shingle hash, not the shingle string —
    * the single shuffle moves (id, long) pairs. The benchmark side is
    * tiny by construction (an eval suite), so Catalyst broadcasts it;
    * the corpus never self-joins. */
  def decontaminate(docs: DataFrame, benchPred: Column, n: Int = 5,
      minShared: Long = 2): DataFrame = {
    // explode_OUTER + null-filter, not explode: InferFiltersFromGenerate
    // rewrites plain explode into a pre-Generate Filter whose condition
    // inlines the whole interpreted shingle pipeline (split is
    // re-evaluated ~2n× per row — measured 14× slower at sf0.1); the
    // rule cannot fire on outer generates, so the pipeline runs once.
    def hashed(side: DataFrame) = Dedup.shingleArrays(side, n)
      .select(col("doc_id"), explode_outer(col("shs")).as("sh"))
      .filter(col("sh").isNotNull)
      .select(col("doc_id"), hash48(col("sh"), "decon").as("h"))
    // Partition the corpus BEFORE shingling, so each document is
    // shingled exactly once (the previous corpus-wide frame fed both
    // joins and was evaluated twice) and the bench/train id joins
    // disappear. NULL predicate rows are train (they are not bench —
    // same partition the id-anti-join produced).
    val bench = hashed(docs.filter(benchPred))
      .select(col("doc_id").as("bench_id"), col("h"))
    val train = hashed(docs.filter(!coalesce(benchPred, lit(false))))
      .select(col("doc_id").as("train_id"), col("h"))
    train.join(bench, Seq("h"))
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Bloom-prescreened decontamination — the LARGE-benchmark variant of
    * [[decontaminate]]. When the eval suite outgrows a broadcast hash
    * relation (millions of eval documents → billions of shingles), a
    * fixed-size Bloom filter of the benchmark's shingle hashes still
    * broadcasts (size set by `fpp`, not by item width), pruning the
    * corpus shingle stream MAP-SIDE so only bloom-positive shingles
    * reach the exact verification join — the shuffle moves candidate
    * shingles, a benchmark-overlap-sized stream, never the corpus.
    * False positives cost wasted probes only (the equi-join discards
    * them); false negatives cannot occur — the verdict is exact, which
    * is why this query carries a full DuckDB oracle with no bloom in it.
    *
    * The verify join is pinned SHUFFLE_HASH: the whole point of the
    * bloom is that the bench side need not broadcast, so the declared
    * plan is the one that survives when it cannot.
    *
    * Returns the per-train-document verdict (train_id, n_bench_docs,
    * max_shared): how many benchmark documents share ≥ `minShared`
    * distinct `n`-gram shingles, and the largest such overlap. */
  def decontaminateBloom(docs: DataFrame, benchPred: Column, n: Int = 5,
      minShared: Long = 2, fpp: Double = 0.01): DataFrame = {
    def hashed(side: DataFrame) = Dedup.shingleArrays(side, n)
      .select(col("doc_id"), explode_outer(col("shs")).as("sh"))
      .filter(col("sh").isNotNull)
      .select(col("doc_id"), hash48(col("sh"), "decon").as("h"))
    val bench = hashed(docs.filter(benchPred))
      .select(col("doc_id").as("bench_id"), col("h"))
    val train = hashed(docs.filter(!coalesce(benchPred, lit(false))))
      .select(col("doc_id").as("train_id"), col("h"))
    // Build the filter with ONE aggregate job over the bench hashes
    // (count sizes the filter, then the sketch aggregates the bits) —
    // driver state is the bloom's bits, bounded by fpp, never the data.
    val benchH = bench.select(col("h")).distinct()
    val expected = math.max(benchH.count(), 1L)
    val bloom = benchH.stat.bloomFilter("h", expected, fpp)
    val bf = docs.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bf.value.mightContainLong(h))
    train.filter(mightContain(col("h")))
      .join(bench.hint("shuffle_hash"), Seq("h"))
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .groupBy("train_id")
      .agg(count(lit(1)).as("n_bench_docs"), max(col("shared")).as("max_shared"))
  }

  /** Per-domain document cap: keep at most `cap` documents per domain,
    * chosen deterministically by salted hash (the anti-over-representation
    * step that stops one crawl host from dominating a mixture).
    *
    * Two-level selection so a single hot domain cannot serialize into
    * one task at 100 TB: documents first compete within (domain,
    * hash-bucket) — `buckets` parallel row_number windows per domain,
    * each keeping ≤ cap — then the ≤ buckets·cap survivors per domain
    * rank once more for the true top-cap. Both windows are streaming
    * rank (no buffer); the second sees at most buckets·cap rows per
    * domain regardless of corpus size. With buckets = 1 this degrades
    * to the plain single-window form. */
  def domainCap(docs: DataFrame, domain: Column, cap: Int,
      idCol: String = "doc_id", buckets: Int = 16): DataFrame = {
    require(cap > 0 && buckets > 0, "cap and buckets must be positive")
    val h = hash48(col(idCol).cast("string"), "cap")
    val pre = Window.partitionBy(domain, pmod(h, lit(buckets)))
      .orderBy(h, col(idCol))
    val fin = Window.partitionBy(domain).orderBy(h, col(idCol))
    docs
      .withColumn("__rn1", row_number().over(pre))
      .filter(col("__rn1") <= cap)
      .withColumn("__rn", row_number().over(fin))
      .filter(col("__rn") <= cap)
      .drop("__rn1", "__rn")
  }

  /** Deterministic domain reweighting: downsample each domain so the
    * kept corpus matches a target mixture `weights` (the static DoReMi-
    * style mixture step). With K = min_d(n_d / w_d) — the largest total
    * reachable WITHOUT upsampling any domain — the keep fraction is
    * f_d = w_d · K / n_d (≤ 1, = 1 for the binding domain), realized as
    * the salted-hash threshold keep: hash48(id) < f_d · 2^48.
    *
    * One tiny per-domain count aggregate broadcast back over the
    * corpus; the keep decision itself is map-side hash arithmetic —
    * the same zero-shuffle sampling shape as [[hashSample]], so the
    * corpus is never moved. All arithmetic is integer counts and
    * literal weights through IEEE mult/div (no libm), so the kept set
    * is bit-identical across engines and re-runs. */
  def domainReweight(docs: DataFrame, weights: Map[String, Double],
      domainCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val sp = docs.sparkSession
    import sp.implicits._
    val w = weights.toSeq.toDF(domainCol, "__w")
    val counts = docs.groupBy(domainCol).agg(count(lit(1)).as("__n"))
      .join(w, Seq(domainCol))                  // inner: unweighted domains drop
    val k = counts.agg(min(col("__n") / col("__w")).as("__k"))
    val frac = counts.crossJoin(broadcast(k))
      .withColumn("__f", least(lit(1.0), col("__w") * col("__k") / col("__n")))
      .select(col(domainCol), col("__f"))
    docs.join(broadcast(frac), Seq(domainCol))
      .filter(hash48(col(idCol).cast("string"), "reweight") <
        floor(col("__f") * lit((1L << 48).toDouble)).cast("long"))
      .drop("__f")
  }

  /** Epoch-weighted dataset mixing — the UPSAMPLING complement of
    * [[domainReweight]]: materialize one training epoch whose domain
    * shares hit `weights` by REPEATING documents (sampling with
    * replacement) instead of discarding from over-represented domains.
    * The epoch is anchored so the most over-represented domain
    * (largest n/w) is used exactly once; every other domain repeats
    * r = w·k/n ≥ 1 times — floor(r) whole copies, plus one more when
    * the salted id-hash falls below frac(r), so realized counts hit
    * the target in expectation with per-document determinism (same
    * doc → same copy count under any partitioning or corpus order).
    *
    * Scale shape: domain counts are one partial/final aggregate; the
    * anchor k is a 1-row broadcast; the repetition itself is a
    * map-side `explode(sequence)` — zero shuffle, output rows = epoch
    * size. Returns (id, domain, copy), copy ∈ [0, copies). */
  def epochMix(docs: DataFrame, weights: Map[String, Double],
      domainCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val sp = docs.sparkSession
    import sp.implicits._
    val w = weights.toSeq.toDF(domainCol, "__w")
    val counts = docs.groupBy(domainCol).agg(count(lit(1)).as("__n"))
      .join(w, Seq(domainCol))                  // inner: unweighted domains drop
    val k = counts.agg(max(col("__n") / col("__w")).as("__k"))
    val rate = counts.crossJoin(broadcast(k))
      .withColumn("__r", col("__w") * col("__k") / col("__n"))
      .select(col(domainCol), col("__r"))
    docs.join(broadcast(rate), Seq(domainCol))
      // FLOOR (not cast) on the frac threshold: cast-to-long truncates
      // in Spark but rounds in DuckDB — floor is the portable form
      .withColumn("__copies",
        floor(col("__r")).cast("long") +
          when(hash48(col(idCol).cast("string"), "mix") <
            floor((col("__r") - floor(col("__r"))) * lit((1L << 48).toDouble))
              .cast("long"), 1L).otherwise(0L))
      .filter(col("__copies") >= 1) // r ≥ 1 by construction; guard anyway
      .select(col(idCol), col(domainCol),
        explode(sequence(lit(0L), col("__copies") - 1)).as("copy"))
  }

  /** Temperature-scaled mixture sampling — the multilingual α-sampling
    * rule (mT5/XLM-R style): sampling weights w_i ∝ n_i^α with
    * α ∈ (0, 1] flatten the natural source distribution (α = 1 keeps
    * it, α → 0 approaches uniform), then ONE epoch of the original
    * corpus SIZE is materialized at those weights — rare sources
    * upsample (doc repetition), hot sources downsample — with e54's
    * deterministic floor + hash-fractional copy rule.
    *
    * Determinism contract: n^α is computed as exp(α·ln n) — written
    * identically in the oracle — then FLOOR(·1e6)-quantized to a long
    * BEFORE the normalizing sum, because a sum of raw doubles is
    * partition-order-dependent and one ulp at a hash-threshold
    * boundary would flip a copy count between engines. The rate is
    * then one fixed-order double expression over exact integers, and
    * the fractional threshold uses e54's portable FLOOR form. Plan
    * shape is e54's: one counts aggregate (sources-bounded,
    * broadcast), a broadcast rate join, map-side explode(sequence) —
    * zero shuffle of the corpus, output rows = epoch size. */
  def temperatureMix(docs: DataFrame, alpha: Double,
      domainCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "temperature exponent in (0, 1]")
    // quantum 1e6 keeps n^α·1e6 inside a Long for any source up to
    // ~9.2e12 docs at α = 1 (larger α-weights overflow FIRST in the
    // oracle, which errors on cast while Spark's non-ANSI cast clamps —
    // the quantum is sized so neither engine ever reaches that bound)
    val counts = docs.groupBy(domainCol).agg(count(lit(1)).as("__n"))
      .withColumn("__na",
        floor(exp(lit(alpha) * log(col("__n").cast("double"))) * 1e6)
          .cast("long"))
    val tots = counts.agg(sum(col("__n")).as("__nt"), sum(col("__na")).as("__wt"))
    val rate = counts.crossJoin(broadcast(tots))
      // r_i = N·w_i/n_i with w_i = na_i / Σ na_j, one fixed-order
      // expression over exact integers
      .withColumn("__r",
        col("__nt").cast("double") * col("__na").cast("double")
          / col("__wt").cast("double") / col("__n").cast("double"))
      .select(col(domainCol), col("__r"))
    docs.join(broadcast(rate), Seq(domainCol))
      .withColumn("__copies",
        floor(col("__r")).cast("long") +
          when(hash48(col(idCol).cast("string"), "temp") <
            floor((col("__r") - floor(col("__r"))) * lit((1L << 48).toDouble))
              .cast("long"), 1L).otherwise(0L))
      .filter(col("__copies") >= 1)
      .select(col(idCol), col(domainCol),
        explode(sequence(lit(0L), col("__copies") - 1)).as("copy"))
  }

  /** Dataset version diff — the corpus release audit (what changed
    * between training-data v1 and v2): per id, `added` (new in v2),
    * `removed` (gone from v2), `changed` (same id, different
    * normalized content fingerprint), or `same`. Content identity is
    * the e01 fingerprint (md5 of whitespace-normalized text, NULL as
    * empty), so a pure-whitespace edit is `same` — the dedup family's
    * own equality, applied to versioning.
    *
    * Shape: two map-side fingerprint projections + ONE full-outer
    * equi-join on the id — the plan a 100 TB release diff wants (no
    * content ever pairs across ids; co-partitioned stores join without
    * exchange via the usual bucketing). */
  def datasetDiff(v1: DataFrame, v2: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    def fp(df: DataFrame, as: String) = df.select(col(idCol),
      md5(TextHash.normText(coalesce(col("text"), lit("")))).as(as))
    fp(v1, "__fa").join(fp(v2, "__fb"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__fa").isNull, "added")
          .when(col("__fb").isNull, "removed")
          .when(col("__fa") === col("__fb"), "same")
          .otherwise("changed"))
      .select(col(idCol), col("status"))
  }

  /** PII patterns: POSIX classes only, so the Java-regex (Spark) and
    * RE2 (DuckDB oracle) dialects agree byte-for-byte. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
  val Ipv4Re  = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val NumRe   = "[0-9]+"

  /** PII scrub: redact emails, IPv4 addresses, then remaining digit
    * runs (in that order — each count is the number of replacements at
    * its stage, so the stages compose deterministically). Pure map-side
    * regex work in whole-stage codegen; returns the input id column,
    * the scrubbed text, and per-category redaction counts. */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s0 = col(textCol)
    val s1 = regexp_replace(s0, EmailRe, "<EMAIL>")
    val s2 = regexp_replace(s1, Ipv4Re, "<IP>")
    val s3 = regexp_replace(s2, NumRe, "<NUM>")
    df.select(
      col(idCol),
      s3.as("clean"),
      regexp_count(s0, lit(EmailRe)).as("n_email"),
      regexp_count(s1, lit(Ipv4Re)).as("n_ip"),
      regexp_count(s2, lit(NumRe)).as("n_num"))
  }

  /** Fixed-width overlapping token chunks — the RAG / context-window
    * preparation step: chunk i covers tokens [i·stride, i·stride+width)
    * of the whitespace-normalized token stream, so consecutive chunks
    * overlap by width−stride tokens and every token lands in ≥1 chunk.
    * Pure map-side (tokenize → explode of a per-doc chunk-index range);
    * output volume is n_tokens/stride rows per doc — linear in corpus
    * size, the only shape that survives 100 TB. chunk_hash (md5 of the
    * joined chunk) is the dedup/join key downstream stages use. */
  def chunkDocs(docs: DataFrame, width: Int, stride: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      "need 0 < stride <= width")
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__nc",
        expr(s"1 + (greatest(__n - $width, 0) + ${stride - 1}) DIV $stride"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("__nc") - 1)))
      .withColumn("__chunk",
        slice(col("__toks"), (col("chunk_idx") * stride + 1).cast("int"), lit(width)))
      .select(col(idCol), col("chunk_idx"),
        size(col("__chunk")).cast("long").as("chunk_len"),
        md5(array_join(col("__chunk"), " ")).as("chunk_hash"))
  }

  /** Chunk-then-pack — the actual pretraining batch-assembly step
    * ([[chunkDocs]] ∘ [[packSequences]]): overlong documents split
    * into non-overlapping `maxLen`-token chunks FIRST (so no item ever
    * exceeds a window), then the chunk stream packs next-fit into
    * `capacity`-token windows, shard-parallel, in (doc_id, chunk_idx)
    * order — consecutive chunks of one document stay adjacent in the
    * training stream (shards key on the DOC id, so a document's chunks
    * never split across shards).
    *
    * Scale shape inherits both parents: chunking is map-side; packing
    * shuffles only (ids, counts) onto the shard key and folds
    * in-memory per shard. The per-shard fold buffers O(corpus/shards)
    * 32-byte (id, idx, len) tuples in one task — `shards` MUST scale
    * with the corpus (≈1 shard per 30M chunks per GiB of task heap;
    * at 100 TB that's thousands of shards, same sizing rule as
    * [[packSequences]]), it is a parallelism knob, not a constant. */
  def chunkPack(docs: DataFrame, maxLen: Int, capacity: Long,
      shards: Int): DataFrame = {
    require(maxLen > 0 && capacity >= maxLen && shards > 0,
      "a chunk must fit a window; shards must scale with corpus size")
    val sp = docs.sparkSession
    import sp.implicits._
    chunkDocs(docs, width = maxLen, stride = maxLen)
      .select(col("doc_id").cast("long"), col("chunk_idx").cast("long"),
        (hash48(col("doc_id").cast("string"), "shard") % shards).cast("int")
          .as("shard"),
        col("chunk_len").cast("long"))
      .as[(Long, Long, Int, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (shard, it) =>
        val sorted = it.toArray.sortBy(t => (t._1, t._2))
        var pack = 0L
        var fill = 0L
        sorted.iterator.map { case (id, ci, _, t) =>
          if (fill > 0 && fill + t > capacity) { pack += 1; fill = t }
          else fill += t
          (shard, id, ci, t, pack, fill)
        }
      }
      .toDF("shard", "doc_id", "chunk_idx", "chunk_len", "pack_id",
        "pack_fill")
  }

  /** Canonical URL form — the Common-Crawl-style normalization under
    * which URL-level dedup runs: lowercase scheme+host, strip a leading
    * `www.`, strip the scheme's default port, drop `utm_*` tracking
    * params, sort the surviving query params, trim trailing slashes,
    * drop the fragment. Pure map-side regexp/array expressions with
    * exact DuckDB twins (regexp_extract group numbering and anchored
    * regexp_replace agree across both engines). */
  def canonicalizeUrl(url: Column): Column = {
    val re = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*).*$"
    val scheme = lower(regexp_extract(url, re, 1))
    val bare = regexp_replace(lower(regexp_extract(url, re, 2)), "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(bare, ":443$", ""))
      .when(scheme === "http", regexp_replace(bare, ":80$", ""))
      .otherwise(bare)
    val path = regexp_replace(regexp_extract(url, re, 3), "/+$", "")
    val keptParams = array_sort(filter(split(regexp_extract(url, re, 4), "&"),
      p => p =!= "" && !p.rlike("^utm_")))
    val query = array_join(keptParams, "&")
    concat(scheme, lit("://"), host, path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
  }

  /** URL-level exact dedup over the canonical form: one hash-groupBy on
    * the canonical URL (the same scale shape as exact text dedup e01);
    * the keeper is the smallest id, deterministically. */
  def urlDedup(docs: DataFrame, urlCol: Column,
      idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(canonicalizeUrl(urlCol).as("canon_url"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper"))

  /** Deterministic global training shuffle + sharding: every document
    * gets a pseudo-random position from its salted id hash; shard =
    * hash mod nShards, within-shard order = (hash, id). Re-runs give
    * the same order, a different salt an independent one — the
    * "shuffle once, stream shards in order" training-data layout.
    *
    * Scale shape: the hash is map-side; the position rank partitions
    * by shard, and nShards is chosen so a shard is one output file
    * (~GBs) — the same per-shard sort the sharded WRITE needs anyway,
    * so the rank adds no exchange the layout didn't already pay. */
  def shardShuffle(docs: DataFrame, nShards: Int,
      idCol: String = "doc_id", salt: String = "shuffle"): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    val h = hash48(col(idCol).cast("string"), salt)
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    docs
      .withColumn("h", h)
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("h")
  }

  /** Quality-ranked token budgeting: within each source, rank documents
    * by (quality desc, id) and keep the best prefix whose cumulative
    * token count fits `budgetTokens` — "fill a fixed training budget
    * with the best available data, per source". A document that
    * straddles the boundary is kept iff its own cumulative sum still
    * fits (the reference point for the oracle twin).
    *
    * Scale shape: one window per source (rank + running sum — a single
    * sort per partition serves both). A pathologically hot source
    * serializes its own running sum; the e24-style two-level pre-prune
    * applies when needed (rank within (source, hash-bucket) first and
    * feed each bucket a budget share — an approximation the exact
    * declared form does not take). */
  def tokenBudget(docs: DataFrame, budgetTokens: Long,
      sourceCol: String = "source"): DataFrame = {
    val nTok = size(tokens(coalesce(col("text"), lit("")))).cast("long")
    val q = TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col("quality").desc, col("doc_id"))
    docs.select(col("doc_id"), col(sourceCol), nTok.as("n_tokens"))
      .join(q, Seq("doc_id"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("kept", col("cum_tokens") <= budgetTokens)
      .select(col("doc_id"), col(sourceCol), col("quality"),
        col("n_tokens"), col("cum_tokens"), col("kept"))
  }

  /** CCNet-style end-to-end keep verdict — the whole pipeline a CC
    * snapshot actually runs, composed from the declared single-signal
    * operators: language gate ([[TextAnalysis.langId]] must predict
    * `lang`), LM quality gate ([[TextAnalysis.pplBuckets]] tercile
    * must not be `tail`), and exact-dedup gate (only the min-id doc
    * per normalized-md5 fingerprint survives, e01's keeper rule).
    * Emits every per-doc signal plus the composite `keep`, so the
    * query doubles as the pipeline's audit view. Docs with no tokens
    * have no LM score and are absent (the oracle agrees).
    *
    * Plan: two map-side signal projections + the e25 vocab broadcast +
    * one md5 keeper window (partitioned by fingerprint — bounded by
    * the dup factor) joined on doc_id; the only global exchange is
    * e38's already-aggregated tercile frame.
    *
    * `exactNtile` mirrors [[TextAnalysis.pplBuckets]]'s knob: the
    * default buckets on scale-safe approx-percentile cutoffs; the
    * declared e63 oracle pins exact rank terciles, so the declared
    * query passes true. */
  def ccnetVerdict(docs: DataFrame, lang: String = "en",
      exactNtile: Boolean = false): DataFrame = {
    val lid = TextAnalysis.langId(docs).select(col("doc_id"), col("pred_lang"))
    val ppl = TextAnalysis.pplBuckets(docs, exactNtile = exactNtile)
      .select(col("doc_id"), col("avg_logp"), col("ppl_bucket"))
    val keeper = Dedup.keeperFlag(docs,
        md5(TextHash.normText(col("text"))), "is_keeper")
      .select(col("doc_id"), col("is_keeper"))
    lid.join(ppl, Seq("doc_id")).join(keeper, Seq("doc_id"))
      .withColumn("keep",
        col("pred_lang") === lang && col("ppl_bucket") =!= "tail" &&
          col("is_keeper"))
  }

  /** DSIR-style data selection with importance resampling (Xie et al.
    * 2023): score every candidate document by how target-like its
    * hashed-feature profile is — the per-token log-likelihood ratio
    * ln p_target(bucket) − ln p_raw(bucket) summed over the document,
    * with tokens hashed into `buckets` feature buckets and Laplace +1
    * smoothing on both distributions — then keep the top `k`
    * candidates (targetPred rows define the target and are excluded
    * from candidacy). Per-token terms are FLOOR(·1e6)-quantized longs,
    * so document scores are order-independent exact integers.
    *
    * Scale shape: both feature distributions are `buckets`-row
    * aggregates (fixed-size broadcasts — the POINT of hashed features:
    * the feature space never tracks the vocabulary, let alone the
    * corpus); the token stream is scored map-side against them and
    * folded per doc. The exact top-k is one global rank window over
    * the per-doc score frame (already aggregated — corpus text never
    * reaches the sort); at corpus sizes where even that frame is hot,
    * the e24-style bucketed pre-prune or a sampled score threshold
    * (the e38 thresholds path) swaps in for the window. */
  def dsirSample(docs: DataFrame, targetPred: Column, buckets: Int = 256,
      k: Int = 100, idCol: String = "doc_id"): DataFrame = {
    require(buckets >= 2 && k >= 1)
    val toks = docs
      .select(col(idCol), targetPred.as("__t"),
        explode_outer(tokens(coalesce(col("text"), lit("")))).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .withColumn("b", pmod(hash48(col("tok"), "dsir"), lit(buckets.toLong)))
    val tCnt = toks.filter(col("__t")).groupBy("b")
      .agg(count(lit(1)).as("ct"))
    val rCnt = toks.groupBy("b").agg(count(lit(1)).as("cr"))
    val tots = tCnt.agg(sum(col("ct")).as("tt"))
      .crossJoin(rCnt.agg(sum(col("cr")).as("rt")))
    def lnQ1k(c: org.apache.spark.sql.Column) =
      floor(lit(1000.0) * log(c.cast("double")) + lit(0.5)).cast("long")
    // each ln is integer-quantized FIRST (the r8-verdict e76 contract:
    // the engine-variant transcendental never reaches an outer floor);
    // the four-term combination is then exact integer arithmetic
    val term = (lnQ1k(col("ct") + lit(1)) - lnQ1k(col("tt") + lit(buckets))
      - lnQ1k(col("cr") + lit(1)) + lnQ1k(col("rt") + lit(buckets))) * lit(1000L)
    val scored = toks
      .filter(!col("__t"))
      .join(broadcast(tCnt), Seq("b"), "left")
      .join(broadcast(rCnt), Seq("b"), "left")
      .crossJoin(broadcast(tots))
      .withColumn("ct", coalesce(col("ct"), lit(0L)))
      .withColumn("cr", coalesce(col("cr"), lit(0L)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(term).as("logw_q"))
      // an EMPTY target (misconfigured pred) makes every score NULL —
      // return no sample rather than k arbitrary ids with NULL scores
      .filter(col("logw_q").isNotNull)
    // top-k as orderBy+limit = TakeOrderedAndProject (parallel partial
    // top-k per partition, merge on the driver) — the corpus-sized
    // score frame never lands in a single-partition global window; the
    // rank window below runs over the ≤k surviving rows only.
    val w = Window.orderBy(col("logw_q").desc, col(idCol))
    scored
      .orderBy(col("logw_q").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col(idCol), col("n_tokens"), col("logw_q"), col("rank"))
  }
}
