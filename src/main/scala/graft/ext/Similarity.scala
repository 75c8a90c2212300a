package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot_fold, l2_norm}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (one broadcast of the
  * query set — the candidate scan is embarrassingly parallel and never
  * shuffles the corpus). The LSH variant (random ±1 hyperplane signs)
  * is the scale path: bucket-join candidates, then exact re-rank —
  * the same candidates-only shape as MinHash.
  *
  * All arithmetic is a left-to-right double fold — the native
  * [[graft.functions.DotFold]] codegen expression — so results are
  * bit-identical to the DuckDB oracle's `list_reduce`. Norms are
  * factored out per vector (same fold, same bits) so the pair space
  * costs one fused dot-product loop per pair, not three interpreted
  * higher-order-function evaluations.
  */
object Similarity {

  /** ln quantized to an integer at 1e-3 with a centered round — the
    * engine-drift guard shared with TextAnalysis (r8-verdict e76 fix):
    * the transcendental never reaches an outer FLOOR. */
  private def lnQ1k(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(lit(1000.0) * log(c.cast("double")) + lit(0.5)).cast("long")

  /** Cosine similarity of two array<float/double> columns as
    * sequential double folds (deterministic across engines). */
  def cosine(a: Column, b: Column): Column =
    dot_fold(a, b) / (l2_norm(a) * l2_norm(b))

  /** Corpus projected with its per-vector L2 norm (computed once,
    * map-side; at scale this is the materialize-with-the-table column). */
  private[ext] def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding"), l2_norm(col("embedding")).as("nrm"))

  /** round(cosine, 6) over pre-normed vectors — the one shared verify
    * kernel of every pair scan below (rounding precision and the fused
    * dot_fold form must stay identical across them AND their DuckDB
    * oracle twins). */
  private def cosSim(va: Column, na: Column, vb: Column, nb: Column): Column =
    round(dot_fold(va, vb) / (na * nb), 6)

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding self). Query side is broadcast; rank
    * ties break on (rounded sim DESC, vec_id ASC) for determinism. */
  def bruteTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val e = withNorm(emb)
    val q = e.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qnrm"))
    val scored = e
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim",
        cosSim(col("qv"), col("qnrm"), col("embedding"), col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** Embedding-space decontamination — the SEMANTIC member of the
    * decontamination family (n-gram shingle overlap e20, bloom-
    * prescreened exact e51, cross-source matrix e44): a TRAIN vector
    * is contaminated iff its cosine against ANY eval-set vector
    * reaches `threshold`. This is the filter that catches paraphrased
    * or translated eval leakage that no token-overlap check can see.
    * Every train vector gets a verdict row with its closest eval
    * vector and rounded similarity — the audit trail a release
    * review reads, not just the drop list.
    *
    * Plan: the eval slice is bounded by contract (an eval BENCHMARK,
    * not a corpus) and broadcasts over ONE train scan — the same
    * bounded-flat-scan shape as marginMine; the per-train argmax is a
    * vec_id-PARTITIONED rank window (never a global one); output is
    * train-corpus-sized, linear. An EMPTY eval slice yields all-clean
    * verdicts (left join), not an empty result. Scale path when the
    * eval set outgrows a broadcast: the verdict is a predicate on the
    * same rounded sim, so it composes unchanged with the IVF-pruned
    * scan (e13) — prune to candidate lists, verify, anti-join. */
  def embedDecontam(emb: DataFrame, evalPred: Column,
      threshold: Double = 0.4): DataFrame = {
    val e = withNorm(emb)
    val ev = e.filter(evalPred)
      .select(col("vec_id").as("eval_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    val train = e.filter(!coalesce(evalPred, lit(false)))
    val scored = train.join(broadcast(ev), lit(true), "left")
      .withColumn("sim",
        when(col("eval_id").isNotNull,
          cosSim(col("qv"), col("qnrm"), col("embedding"), col("nrm"))))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc_nulls_last, col("eval_id").asc_nulls_last)
    scored
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("vec_id"),
        col("eval_id").as("closest_eval"),
        col("sim").as("max_sim"),
        coalesce(col("sim") >= threshold, lit(false)).as("contaminated"))
  }

  /** Contrastive-training hard-negative mining: for each anchor
    * (query) vector, the `k` nearest corpus vectors whose cosine is
    * BELOW `posThreshold` — neighbors at or above the threshold are
    * near-duplicates/positives of the anchor and are excluded, so what
    * remains is exactly the hardest negative set (most similar without
    * being a copy), the standard retrieval-training sampling step.
    *
    * Same plan skeleton as [[bruteTopK]] (broadcast anchors over one
    * corpus scan, fused dot, per-anchor rank window) with the positive
    * cut applied BEFORE the rank, so positives never occupy rank slots.
    * The threshold compares the 6-dp rounded sim (ties are engine-
    * stable). Scale path: compose the same cut with the IVF/SQ8
    * scans (e13/e46) — the cut is a predicate, not a plan change. */
  def hardNegatives(emb: DataFrame, queryPred: Column, k: Int,
      posThreshold: Double = 0.95): DataFrame = {
    val e = withNorm(emb)
    val q = e.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qnrm"))
    val scored = e
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim",
        cosSim(col("qv"), col("qnrm"), col("embedding"), col("nrm")))
      .filter(col("sim") < posThreshold)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** kNN majority-vote label classification over the embedding corpus
    * — the label-propagation step of semi-supervised corpus labeling
    * (classify an unlabeled/held-out slice by its nearest labeled
    * neighbors; also the standard eval for embedding quality). The
    * `queryPred` slice is classified by the REST of the corpus (query
    * vectors never vote, so the eval is leak-free); the verdict is the
    * majority label of the k nearest by cosine, ties broken to the
    * smaller label id.
    *
    * Same broadcast-query scan as [[bruteTopK]], then two bounded
    * aggregates (per-query label votes → majority rank) whose key
    * spaces are queries×labels — never corpus-sized. Returns
    * (vec_id, true_label, pred_label, votes). */
  def knnClassify(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    // withColumn, not withNorm: the label column must survive the scan
    val e = emb.withColumn("nrm", l2_norm(col("embedding")))
    val q = e.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("label").as("true_label"),
        col("embedding").as("qv"), col("nrm").as("qnrm"))
    val corpus = e.filter(!coalesce(queryPred, lit(false)))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim",
        cosSim(col("qv"), col("qnrm"), col("embedding"), col("nrm")))
    val nw = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    val votes = scored
      .withColumn("rank", row_number().over(nw))
      .filter(col("rank") <= k)
      .groupBy(col("query_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val vw = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc)
    votes
      .withColumn("__vr", row_number().over(vw))
      .filter(col("__vr") === 1)
      .select(col("query_id").as("vec_id"), col("true_label"),
        col("label").as("pred_label"), col("votes"))
  }

  /** Active-learning uncertainty sampling — "which unlabeled examples
    * should a human label next": every `unlabeledPred` vector is
    * kNN-classified by the labeled rest ([[knnClassify]]'s leak-free
    * scan), and the LEAST-confident queries win — confidence = the
    * vote MARGIN between the top two labels among the k neighbors
    * (0 margin = an exact tie, maximal disagreement; k = unanimous).
    * Returns the `m` most uncertain queries, margin ascending (tie →
    * smaller vec_id), with their leading label and its votes — the
    * standard margin-based active-learning acquisition rule.
    *
    * Plan: the same broadcast-query scan + votes aggregate as e55,
    * then top-2 vote rows per query (bounded: queries×labels), a
    * left join for the runner-up (absent = unanimous → margin k), and
    * one rank window over the per-query margin frame. */
  def uncertaintySample(emb: DataFrame, unlabeledPred: Column, k: Int = 10,
      m: Int = 20): DataFrame = {
    val e = emb.withColumn("nrm", l2_norm(col("embedding")))
    val q = e.filter(unlabeledPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    val corpus = e.filter(!coalesce(unlabeledPred, lit(false)))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim",
        cosSim(col("qv"), col("qnrm"), col("embedding"), col("nrm")))
    val nw = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    val votes = scored
      .withColumn("rank", row_number().over(nw))
      .filter(col("rank") <= k)
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val vw = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc)
    val ranked = votes.withColumn("__vr", row_number().over(vw))
    val top1 = ranked.filter(col("__vr") === 1)
      .select(col("query_id"), col("label").as("top_label"),
        col("votes").as("top_votes"))
    val top2 = ranked.filter(col("__vr") === 2)
      .select(col("query_id"), col("votes").as("__v2"))
    // top-m via orderBy+limit (TakeOrderedAndProject): the per-query
    // margin frame stays partition-parallel; only the ≤m picked rows
    // see the single-partition rank window.
    val mw = Window.orderBy(col("margin").asc, col("query_id").asc)
    top1.join(top2, Seq("query_id"), "left")
      .withColumn("margin",
        col("top_votes") - coalesce(col("__v2"), lit(0L)))
      .orderBy(col("margin").asc, col("query_id").asc)
      .limit(m)
      .withColumn("pick", row_number().over(mw).cast("long"))
      .select(col("query_id").as("vec_id"), col("top_label"),
        col("top_votes"), col("margin"), col("pick"))
  }

  /** All near-duplicate vector pairs with cosine ≥ threshold (brute
    * pair scan — bounded corpora; LSH path below for scale). One fused
    * dot per pair; norms precomputed per vector. */
  def embeddingNearDups(emb: DataFrame, threshold: Double): DataFrame = {
    val e = withNorm(emb)
    val a = e.select(col("vec_id").as("i"), col("embedding").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("j"), col("embedding").as("vb"), col("nrm").as("nb"))
    a.join(b, col("i") < col("j"))
      .withColumn("sim", cosSim(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("sim") >= threshold)
      .select("i", "j", "sim")
  }

  /** Embedding near-dup PAIRS via hyperplane-LSH banding — the 100 TB
    * path for [[embeddingNearDups]]: candidates are pairs sharing any
    * (table, bucket), exact cosine verifies ≥ threshold. Same
    * deterministic planes as [[annTopK]], same candidates-only shape as
    * MinHash banding — the corpus never pairs with itself. Recall is
    * the standard LSH trade (tables × bits tunes it); the exact
    * [[embeddingNearDups]] remains the bounded-corpora ground truth. */
  /** `maxBucket` is the hot-bucket cap — [[Dedup.capTextBuckets]]'s
    * twin keyed on (tbl, bucket), completing the cap across EVERY
    * banded self-join (text minhash, simhash, perceptual, embedding):
    * a degenerate embedding population (zero vectors from failed
    * embeds, padding duplicates) collapses hyperplane signs into one
    * bucket whose n² candidates each carry TWO dim-float arrays.
    * Buckets above the cap drop whole; `<= 0` = uncapped (declared
    * e16 semantics). */
  def embeddingNearDupsLsh(emb: DataFrame, threshold: Double,
      dim: Int = 64, tables: Int = 12, nbits: Int = 6,
      maxBucket: Int = 0): DataFrame = {
    // one windowed count on the join's own (tbl, bucket) key — not a
    // census join-back, which would re-run the LSH projection a second
    // time per capped run (the shared Dedup.capBuckets form)
    val bucketed =
      Dedup.capBuckets(lshBucketed(emb, dim, tables, nbits), maxBucket,
        "tbl", "bucket")
    val a = bucketed.select(col("tbl"), col("bucket"),
      col("vec_id").as("i"), col("embedding").as("va"), col("nrm").as("na"))
    val b = bucketed.select(col("tbl"), col("bucket"),
      col("vec_id").as("j"), col("embedding").as("vb"), col("nrm").as("nb"))
    // verify BEFORE dropDuplicates: the candidate multiset still carries
    // both embedding arrays, so deduping it first would shuffle
    // candidates x 2·dim doubles; the fused dot_fold loop is map-side
    // codegen, and after the threshold filter only narrow (i, j, sim)
    // survivor rows reach the dedup exchange.
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        cosSim(col("va"), col("na"), col("vb"), col("nb")).as("sim0"))
      .filter(col("sim0") >= threshold)
      .groupBy("i", "j").agg(min(col("sim0")).as("sim"))
  }

  /** Deterministic ±1 hyperplane for (table, bit): component signs from
    * MurmurHash3 of "table:bit:dim" — reproducible with no stored model.
    * `private[graft]` so the oracle generator can embed the same
    * constants as SQL literals (the DuckDB twin computes the identical
    * buckets from the identical planes). Delegates to the fused-kernel
    * definition so the Column surface and the oracle literals cannot
    * drift. */
  private[graft] def plane(table: Int, bit: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(graft.functions.LshBucketsKernel.planeSign(table, bit, _))

  /** Random-hyperplane LSH bucket id per vector for one table: `nbits`
    * sign bits of dot products with the deterministic planes (the
    * single-table slice of the fused [[lshBucketsAll]] kernel). */
  def lshBucket(emb: Column, dim: Int, table: Int, nbits: Int): Column =
    element_at(graft.functions.LshFunctions.lsh_buckets(emb, dim, table + 1, nbits), table + 1)

  /** All `tables` bucket ids in one projection: array<long>, one fused
    * [[graft.functions.LshBucketsExpr]] kernel pass per vector. NOT the
    * tables×nbits dot_fold composition: that inlines ~72 literal-array
    * loops into the enclosing whole-stage-codegen method, which blows
    * the JVM's per-method JIT budget and drops the WHOLE fused stage
    * (bucket-join probes and re-rank arithmetic included) to
    * interpreter speed — measured ~10x on the kNN-graph path. */
  def lshBucketsAll(emb: Column, dim: Int, tables: Int, nbits: Int): Column =
    graft.functions.LshFunctions.lsh_buckets(emb, dim, tables, nbits)

  /** Norm-projected corpus exploded to one (tbl, bucket) row per hash
    * table — the shared candidate-generation base of [[annTopK]] and
    * [[embeddingNearDupsLsh]]. */
  private def lshBucketed(emb: DataFrame, dim: Int, tables: Int,
      nbits: Int): DataFrame =
    withNorm(emb)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(lshBucketsAll(col("embedding"), dim, tables, nbits)).as(Seq("tbl", "bucket")))

  /** Deterministic mini k-means for the IVF index: seeds = the `nlist`
    * lowest vec_ids, then `iters` Lloyd rounds. Assignment is map-side
    * (broadcast literal centroids, fused dot_fold scores); the update
    * step is one groupBy per round with a driver collect of nlist×dim
    * values — the standard k-means shape (centroids are tiny; the
    * corpus never moves).
    *
    * The update sums FLOOR(x·1e6) longs instead of doubles: integer
    * sums are order-independent, so the trained centroids are
    * bit-identical across engines and partitionings (a double mean
    * depends on FP summation order). The 1e-6 quantization is far
    * below any clustering signal; the SQL oracle twin reproduces the
    * same centroids exactly. */
  private[ext] def trainCentroids(emb: DataFrame, nlist: Int,
      iters: Int): Array[Array[Double]] = {
    var cents = emb.orderBy("vec_id").limit(nlist)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      val assigned = emb.withColumn("cluster", assignCluster(col("embedding"), cents))
      val upd = assigned
        .select(col("cluster"), posexplode(col("embedding").cast("array<double>")).as(Seq("d", "x")))
        .groupBy("cluster", "d")
        .agg(sum(floor(col("x") * 1000000).cast("long")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      upd.foreach(r => next(r.getAs[Int]("cluster"))(r.getAs[Int]("d")) =
        r.getAs[Long]("s").toDouble / (r.getAs[Long]("n") * 1e6))
      cents = next
    }
    cents
  }

  /** Nearest-centroid id: argmin ‖v−c‖² = argmax (v·c − ‖c‖²/2) — the
    * native [[graft.functions.NearestCentroids]] kernel (one reference
    * matrix, one tight JIT-compiled loop; bit-identical to the
    * array_max-of-dot_fold composition it replaced, which generated a
    * method too large to ever JIT — the r16 sf10 soak's 61 core-ms/
    * vector finding). */
  private[ext] def assignCluster(v: Column, cents: Array[Array[Double]]): Column =
    graft.functions.VectorFunctions.nearest_centroid(v, cents)

  /** `nprobe` nearest centroid ids for a query vector, best first —
    * the same native kernel's top-n mode (array_sort tie semantics:
    * score ties prefer the smaller id). */
  private[ext] def probeClusters(v: Column, cents: Array[Array[Double]],
      nprobe: Int): Column =
    graft.functions.VectorFunctions.nearest_centroids(v, cents, nprobe)

  /** IVF ANN top-k: coarse-quantize the corpus into `nlist` inverted
    * lists, probe the `nprobe` closest lists per query, exact-cosine
    * re-rank inside them. At scale this is THE partition-pruning ANN:
    * the corpus is written partitioned by cluster id, a probe reads
    * nprobe/nlist of the data, and the only join is corpus⋈broadcast
    * (query, probed-cluster) pairs. Recall gate in ExtSpec. */
  /** Trained-index cache: the IVF index (like the cell store layout) is
    * built once per (session, corpus plan, corpus files, params) — a
    * query must not pay the train cost. The key includes the input-file
    * listing so a rewritten corpus under the same path retrains instead
    * of silently serving stale centroids; the cache is bounded (cleared
    * past [[CentroidCacheMax]] distinct corpora) and invalidatable. */
  private[ext] val CentroidCacheMax = 64
  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int, Int, Int, Int), Array[Array[Double]]]

  /** Shared bounded-memo policy (centroid + PQ caches): on a MISS evict
    * arbitrary OTHER entries past the cap — never on a hit, and never
    * the requested key, so a hot corpus is not evicted by its own
    * lookup and retrained. */
  private def boundedGet[K, V](cache: scala.collection.concurrent.TrieMap[K, V],
      key: K)(train: => V): V = {
    if (!cache.contains(key))
      while (cache.size >= CentroidCacheMax)
        cache.keysIterator.find(_ != key).foreach(cache.remove)
    cache.getOrElseUpdate(key, train)
  }

  /** Drop all cached IVF/PQ indexes (e.g. after overwriting a corpus). */
  def invalidateIvfCache(): Unit = { centroidCache.clear(); pqCache.clear() }

  /** Data fingerprint: hash of the SORTED file listing backing the plan
    * (part files carry unique names, so a rewrite changes the listing;
    * sorting removes listing-order instability); plans with no files
    * (in-memory test data) fall back to plan identity. */
  private def corpusFingerprint(emb: DataFrame): Int = {
    val files = emb.inputFiles.sorted
    if (files.isEmpty) 0 else java.util.Arrays.hashCode(files.asInstanceOf[Array[AnyRef]])
  }

  /** Cached deterministic k-means over any (vec_id, embedding) plan —
    * shared by the IVF index and the PQ sub-quantizers (each subspace
    * slice is its own plan, so its codebook caches independently). */
  private def cachedCentroids(emb: DataFrame, nlist: Int,
      iters: Int): Array[Array[Double]] = {
    val key = (System.identityHashCode(emb.sparkSession),
      emb.queryExecution.logical.semanticHash(), corpusFingerprint(emb),
      nlist, iters)
    boundedGet(centroidCache, key)(trainCentroids(emb, nlist, iters))
  }

  /** Cached centroids + the norm-projected corpus with its cluster id —
    * the shared coarse-quantization base of [[annIvfTopK]] and
    * [[semanticDedup]]. */
  private[ext] def ivfIndexed(emb: DataFrame, nlist: Int,
      iters: Int): (Array[Array[Double]], DataFrame) = {
    val cents = cachedCentroids(emb, nlist, iters)
    (cents, ivfAssigned(emb, cents))
  }

  /** Norm-projected corpus assigned against an ALREADY-TRAINED
    * quantizer (the append / train-on-sample path: the quantizer is
    * immutable, every vector codes against it identically). */
  private[ext] def ivfAssigned(emb: DataFrame,
      cents: Array[Array[Double]]): DataFrame =
    withNorm(emb)
      .withColumn("cluster", assignCluster(col("embedding"), cents))

  def annIvfTopK(emb: DataFrame, queryPred: Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    val (cents, indexed) = ivfIndexed(emb, nlist, iters)
    val q = indexed
      .filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"),
        explode(probeClusters(col("embedding"), cents, nprobe)).as("cluster"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    // sim BEFORE the (query_id, vec_id) dedup: it is deterministic per
    // pair, so dedup keeps the same value, and the dedup exchange then
    // moves narrow (query_id, vec_id, sim) rows instead of rows still
    // carrying both embedding arrays.
    indexed
      .join(broadcast(q), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosSim(col("qv"), col("qnrm"), col("embedding"), col("nrm")).as("sim0"))
      .groupBy("query_id", "vec_id").agg(min(col("sim0")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** SemDeDup-style semantic deduplication: coarse-quantize the corpus
    * with the IVF k-means, then inside each cluster drop every vector
    * whose cosine to a LOWER-id cluster-mate reaches `threshold` (the
    * lowest id of each semantic group survives — deterministic, order-
    * free). Returns every vector with its cluster and keep flag.
    *
    * The intra-cluster pair scan IS the SemDeDup design: clusters bound
    * the quadratic term, and at 100 TB `nlist` scales with the corpus
    * so cluster size stays constant; the only data motion is one
    * shuffle on cluster id (the same partitioning the IVF index
    * already stores) plus a narrow (vec_id, keep) join back. */
  def semanticDedup(emb: DataFrame, threshold: Double,
      nlist: Int = 16, iters: Int = 2): DataFrame = {
    val (_, indexed) = ivfIndexed(emb, nlist, iters)
    val a = indexed.select(col("cluster"), col("vec_id").as("i"),
      col("embedding").as("va"), col("nrm").as("na"))
    val b = indexed.select(col("cluster"), col("vec_id").as("j"),
      col("embedding").as("vb"), col("nrm").as("nb"))
    // narrow projection before the distinct: only duplicate ids shuffle
    val dups = a.join(b, Seq("cluster"))
      .filter(col("i") < col("j"))
      .select(col("j").as("vec_id"),
        cosSim(col("va"), col("na"), col("vb"), col("nb")).as("sim0"))
      .filter(col("sim0") >= threshold)
      .select("vec_id").distinct()
      .withColumn("__dup", lit(true))
    indexed.select(col("vec_id"), col("cluster"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        col("__dup").isNull.as("keep"))
  }

  /** ANN top-k via LSH candidate buckets + exact re-rank. `tables`
    * independent hash tables computed in ONE map-side pass (posexplode
    * of the bucket array); candidates = vectors sharing any (table,
    * bucket) with a query; exact cosine re-ranks. */
  /** k-NN GRAPH: every vector's k approximate nearest neighbors in one
    * job — the all-queries form of [[annTopK]] (SemDeDup diversity
    * analysis, graph-based pruning, and kNN-classifier prep all start
    * here). Candidates come from the same LSH bucket structure, but the
    * query side is the corpus itself, so the bucket join is a
    * SELF-equi-join on (table, bucket) — a SortMergeJoin/
    * ShuffledHashJoin, never a broadcast of the corpus and never the n²
    * pair space. sim computes BEFORE the (query_id, vec_id) dedup so
    * the dedup exchange moves narrow rows (the embedding arrays stay
    * below the join), and the final per-query top-k window partitions
    * on query_id — the same key the candidate aggregate just
    * partitioned on, so no extra exchange. Recall is the LSH trade
    * (tables × nbits tunes it); ties break (sim DESC, vec_id ASC). */
  def knnGraph(emb: DataFrame, k: Int,
      dim: Int = 64, tables: Int = 12, nbits: Int = 6): DataFrame = {
    val bucketed = lshBucketed(emb, dim, tables, nbits)
    val q = bucketed.select(col("tbl"), col("bucket"),
      col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qnrm"))
    val c = bucketed.select(col("tbl"), col("bucket"),
      col("vec_id"), col("embedding"), col("nrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    q.join(c, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosSim(col("qv"), col("qnrm"), col("embedding"), col("nrm")).as("sim0"))
      .groupBy("query_id", "vec_id").agg(min(col("sim0")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  def annTopK(emb: DataFrame, queryPred: Column, k: Int,
      dim: Int = 64, tables: Int = 12, nbits: Int = 6): DataFrame = {
    val bucketed = lshBucketed(emb, dim, tables, nbits)
    val q = bucketed.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"), col("tbl"), col("bucket"))
    // sim BEFORE the (query_id, vec_id) dedup — same narrow-exchange
    // rationale as annIvfTopK above.
    val cands = bucketed
      .join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosSim(col("qv"), col("qnrm"), col("embedding"), col("nrm")).as("sim0"))
      .groupBy("query_id", "vec_id").agg(min(col("sim0")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    cands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  // ---- Scalar quantization (SQ8): the compressed-scan ANN family ----
  //
  // At 100 TB the embedding column dominates the scan: float32×dim per
  // row. SQ8 stores unit-normalized vectors as int8 codes (4× smaller
  // than float32) and ranks by the INTEGER dot product of codes — the
  // FAISS "SQ8 flat" baseline, and composed with the IVF coarse
  // quantizer below, "IVF,SQ8": probe nprobe/nlist of the corpus, scan
  // codes, never touch the float column. Integer scores are exact and
  // order-independent, so ranking is engine-stable with no rounding.

  /** SQ8 code: unit-normalize, then symmetric int8 quantization at the
    * fixed scale 127 (|u_i| ≤ 1 after normalization), i.e.
    * q_i = floor(u_i·127 + 0.5) ∈ [−127, 127]. floor(x+0.5) rather
    * than round(): identical halfway semantics in every engine. */
  def sq8Code(emb: Column, nrm: Column): Column =
    transform(emb, x =>
      floor(x.cast("double") * lit(127.0) / nrm + lit(0.5)).cast("int"))

  /** Exact integer dot of two code arrays — the compressed-domain
    * score (∝ cosine of the original vectors). Runs through the native
    * [[graft.functions.DotFold]] kernel: its double accumulator is
    * EXACT here (every partial sum is an integer ≤ dim·127² ≈ 10⁶,
    * far under 2⁵³ — doubles represent all such integers exactly), so
    * the long cast reproduces the interpreted
    * aggregate(zip_with(·)) integer fold bit-for-bit at a fraction of
    * the cost (the r16 sf10 soak measured the HOF form at ~4× the
    * probe latency). */
  def qdot(a: Column, b: Column): Column =
    dot_fold(a, b).cast("long")

  /** Norm-projected corpus reduced to (vec_id, code) — at scale this IS
    * the stored representation (the float column stays behind in cold
    * storage; the scan reads ¼ the bytes). */
  private[ext] def sq8Coded(emb: DataFrame): DataFrame =
    withNorm(emb)
      .select(col("vec_id"), sq8Code(col("embedding"), col("nrm")).as("code"))

  /** SQ8 flat top-k: brute compressed scan — broadcast the query codes,
    * rank by integer qdot (ties → vec_id ASC; fully deterministic, no
    * FP in the scan at all). The exact twin of [[bruteTopK]] at ¼ the
    * scan bytes; recall-vs-brute gated in ExtSpec. */
  def annSq8TopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val coded = sq8Coded(emb)
    val q = coded.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("code").as("qcode"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("vec_id").asc)
    coded.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("qdot", qdot(col("qcode"), col("code")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("qdot"))
  }

  /** IVF,SQ8: the IVF coarse quantizer prunes to `nprobe`/`nlist` of
    * the corpus, the scan inside the probed lists runs in the
    * compressed integer domain. At scale: corpus written partitioned by
    * cluster id storing ONLY codes, probes read nprobe partitions, the
    * join side is broadcast (query-code, probed-cluster) pairs —
    * partition pruning × 4× byte reduction, multiplicative. */
  /** THE compressed-probe ranking tail, shared verbatim by
    * [[annIvfSq8TopK]] and [[AnnIndex.query]] (their bit-equality is
    * oracle-pinned, so the tail must be one kernel, not two copies):
    * join coded lists with the broadcast (query-code, cluster) pairs,
    * score in the exact integer domain BEFORE the (query_id, vec_id)
    * dedup (the narrow-exchange rationale of annIvfTopK; qdot is
    * per-pair deterministic so min() over probe duplicates is the value
    * itself), then the deterministic top-k window. `excludeSelf` drops
    * candidates whose vec_id equals the query_id — right when queries
    * ARE corpus rows, wrong for external query vectors whose ids may
    * coincide with corpus ids. */
  private[ext] def qdotRank(coded: DataFrame, q: DataFrame, k: Int,
      excludeSelf: Boolean): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("vec_id").asc)
    coded
      .join(broadcast(q), Seq("cluster"))
      .filter(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("vec_id"),
        qdot(col("qcode"), col("code")).as("qd0"))
      .groupBy("query_id", "vec_id").agg(min(col("qd0")).as("qdot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("qdot"))
  }

  def annIvfSq8TopK(emb: DataFrame, queryPred: Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    val (cents, indexed) = ivfIndexed(emb, nlist, iters)
    val coded = indexed.select(col("vec_id"), col("cluster"),
      sq8Code(col("embedding"), col("nrm")).as("code"))
    val q = indexed.filter(queryPred)
      .select(col("vec_id").as("query_id"),
        sq8Code(col("embedding"), col("nrm")).as("qcode"),
        explode(probeClusters(col("embedding"), cents, nprobe)).as("cluster"))
    qdotRank(coded, q, k, excludeSelf = true)
  }

  // ---- Product quantization (PQ): codebook-compressed ANN ----
  //
  // PQ splits each vector into m subspaces and stores ONE small int per
  // subspace (the id of the nearest sub-codebook centroid): m bytes per
  // vector — 32× smaller than float32 at dim=64/m=8. Queries stay
  // full-precision and score candidates by ADC (asymmetric distance):
  // score = Σ_s q_s · c_{s,code_s} — m table lookups + dots against the
  // tiny broadcast codebooks, never the corpus floats. Sub-codebooks
  // train with the same deterministic quantized k-means as IVF (each
  // subspace slice is its own cached plan).

  /** Unit-normalized corpus (element-wise x/‖v‖ as doubles) — PQ trains
    * and codes over unit vectors so the ADC inner product approximates
    * COSINE (the ranking the exact baseline uses); without this, norm
    * variance would systematically distort the compressed ranking. */
  private def unitVectors(emb: DataFrame): DataFrame =
    withNorm(emb).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double") / col("nrm"))
        .as("embedding"))

  /** PQ codebook cache — same bounding policy as [[centroidCache]].
    * Key carries dim AND m (dsub = dim/m): same corpus trained at a
    * different decomposition must never serve wrong-shape books. */
  private val pqCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int, Int, Int, Int, Int, Int), Array[Array[Array[Double]]]]

  /** The m per-subspace codebooks (each ks × dsub) over the
    * unit-normalized corpus. All m sub-quantizers train TOGETHER: one
    * seed collect, then ONE job per Lloyd round that assigns every
    * subspace map-side and aggregates the quantized integer sums keyed
    * by (subspace, cluster, dim) — 1+iters driver actions total instead
    * of m×(1+iters). Results are identical to training each slice
    * separately (same seeds, same assignment kernel, same
    * order-independent integer sums — the oracle trains per slice). */
  private[graft] def pqCodebooks(emb: DataFrame, dim: Int, m: Int, ks: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val dsub = dim / m
    val key = (System.identityHashCode(emb.sparkSession),
      emb.queryExecution.logical.semanticHash(), corpusFingerprint(emb),
      dim, m, ks, iters)
    boundedGet(pqCache, key) {
      val unit = unitVectors(emb)
      // seeds: the lowest-ks unit vectors, sliced driver-side — exactly
      // the per-slice seeds (slicing preserves vec_id order)
      var books: Array[Array[Array[Double]]] = {
        val rows = unit.orderBy("vec_id").limit(ks)
          .select(col("embedding")).collect()
          .map(_.getSeq[Double](0).toArray)
        Array.tabulate(m)(s => rows.map(_.slice(s * dsub, (s + 1) * dsub)))
      }
      for (_ <- 1 to iters) {
        val codes = graft.functions.PqFunctions.pq_assign(col("embedding"),
          graft.functions.PqFunctions.flatten(books), m, ks, dsub)
        val upd = unit
          .select(col("embedding"), posexplode(codes).as(Seq("s", "cl")))
          .select(col("s"), col("cl"),
            posexplode(slice(col("embedding"), col("s") * dsub + 1, lit(dsub)))
              .as(Seq("d", "x")))
          .groupBy("s", "cl", "d")
          .agg(sum(floor(col("x") * 1000000).cast("long")).as("sm"),
            count(lit(1)).as("n"))
          .collect()
        val next = books.map(_.map(_.clone()))
        upd.foreach { r =>
          next(r.getAs[Int]("s"))(r.getAs[Int]("cl"))(r.getAs[Int]("d")) =
            r.getAs[Long]("sm").toDouble / (r.getAs[Long]("n") * 1e6)
        }
        books = next
      }
      books
    }
  }

  /** PQ code column: array of m sub-centroid ids (argmax v_s·c−‖c‖²/2
    * per subspace — the IVF assignment math, run by the fused
    * [[graft.functions.PqAssignExpr]] kernel: the composed
    * array_max-of-dot_fold form would inline m×ks literal arrays into
    * whole-stage codegen and drop the stage to interpreter speed, the
    * same JIT-budget cliff the LSH kernel avoids). Input must be the
    * unit-normalized double array. */
  private def pqCode(emb: Column, books: Array[Array[Array[Double]]],
      dsub: Int): Column = {
    val m = books.length; val ks = books.head.length
    graft.functions.PqFunctions.pq_assign(emb,
      graft.functions.PqFunctions.flatten(books), m, ks, dsub)
  }

  /** ADC score of a full-precision query against a PQ code: per
    * subspace, FLOOR(q_s·c_{code_s}·1e6) as a long — integer terms sum
    * order-independently, so the total is engine-exact. Fused kernel
    * for the same codegen-budget reason as [[pqCode]]. */
  private def adcScore(qv: Column, code: Column,
      books: Array[Array[Array[Double]]], dsub: Int): Column = {
    val m = books.length; val ks = books.head.length
    graft.functions.PqFunctions.pq_adc(qv, code,
      graft.functions.PqFunctions.flatten(books), m, ks, dsub)
  }

  /** PQ-ADC top-k with exact refine (the FAISS "PQ + refine" shape):
    * the WIDE scan runs over m-byte codes only (32× compression at
    * dim=64/m=8) and keeps a `shortlist` of candidates per query by
    * integer ADC score; only the bounded shortlist (queries×shortlist
    * rows) then touches the float column for the exact-cosine re-rank.
    * Both stages are deterministic (integer ADC ties → vec_id; rounded
    * cosine ties → vec_id). Recall gate in ExtSpec. */
  def annPqTopK(emb: DataFrame, queryPred: Column, k: Int,
      dim: Int = 64, m: Int = 8, ks: Int = 16, iters: Int = 2,
      shortlist: Int = 50): DataFrame = {
    val dsub = dim / m
    val books = pqCodebooks(emb, dim, m, ks, iters)
    val unit = unitVectors(emb)
    val coded = unit.select(col("vec_id"),
      pqCode(col("embedding"), books, dsub).as("code"))
    val q = unit.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id").asc)
    val cand = coded.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("adc", adcScore(col("qv"), col("code"), books, dsub))
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= shortlist)
      .select("query_id", "vec_id")
    // exact refine over the SHORTLIST only — norms and cosine on the
    // unit vectors, the same arithmetic the oracle's re-rank runs
    val en = withNorm(unit)
    val qn = en.filter(queryPred).select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), col("nrm").as("qnrm"))
    val cn = en.select(col("vec_id"), col("embedding").as("cv"), col("nrm").as("cnrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    cand.join(broadcast(qn), "query_id")
      .join(cn, "vec_id")
      .withColumn("sim", cosSim(col("qv"), col("qnrm"), col("cv"), col("cnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** Cluster-balanced subsampling: cap the number of kept vectors per
    * k-means cluster, chosen by salted hash (deterministic, re-run
    * stable) — the diversity-preserving downsampling step (keep broad
    * coverage, shrink over-represented modes). Map-side after the
    * cached assignment; the only exchange is the per-cluster rank
    * window, partitioned by cluster id — bounded partitions at any
    * corpus size when cap ≪ cluster size. */
  def clusterBalancedSample(emb: DataFrame, cap: Int, nlist: Int = 16,
      iters: Int = 2, salt: String = "cbs"): DataFrame = {
    val (_, indexed) = ivfIndexed(emb, nlist, iters)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("hk").asc, col("vec_id").asc)
    indexed.select(col("vec_id"), col("cluster"),
        TextHash.hash48(col("vec_id").cast("string"), lit(salt)).as("hk"))
      .withColumn("keep", row_number().over(w) <= cap)
      .select(col("vec_id"), col("cluster"), col("keep"))
  }

  /** IVF recall sweep — the tuning report an ANN deployment reads
    * before picking `nprobe`: for each candidate probe count, exact
    * recall@k of [[annIvfTopK]] against the [[bruteTopK]] ground truth
    * over the same query set. Emitted as integer hits/den plus
    * `recall_q = ⌊hits·1e6/den⌋` (exact division — engine-identical).
    * Recall is monotone in nprobe and reaches 1 at nprobe = nlist (a
    * full probe IS the brute scan) — the spec pins both.
    *
    * Plan: ONE brute scan (the ground truth, bounded queries) +
    * |nprobes| IVF runs sharing the cached centroids/assignment; every
    * join is on (query, neighbor) pairs — queries×k-sized frames. */
  def ivfRecallSweep(emb: DataFrame, queryPred: Column, k: Int = 5,
      nprobes: Seq[Int] = Seq(1, 2, 4), nlist: Int = 16,
      iters: Int = 2): DataFrame = {
    require(nprobes.nonEmpty)
    val truth = bruteTopK(emb, queryPred, k)
      .select(col("query_id"), col("neighbor_id"))
    val den = truth.agg(count(lit(1)).as("den"))
    nprobes.map { np =>
      annIvfTopK(emb, queryPred, k, nlist, np, iters)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(np).as("nprobe"), col("hits"))
    }.reduce(_ union _)
      .crossJoin(broadcast(den))
      // empty query set → den 0: no tuning rows beats NULL recall (and
      // the SQL twin's division error)
      .filter(col("den") > 0)
      .withColumn("recall_q", expr("(hits * 1000000) div den"))
      .select(col("nprobe"), col("hits"), col("den"), col("recall_q"))
  }

  /** Cluster cards — label every k-means cluster with its most
    * salient terms (the BERTopic c-TF-IDF move): member documents'
    * token counts aggregate at CLUSTER granularity, idf runs over
    * clusters-containing-term (not documents), and each cluster keeps
    * its top-`k` terms by the FLOOR(·1e6)-quantized score with
    * term-ascending tie-break. The human-readable face of the
    * embedding clustering — what a SemDeDup/clustering report prints
    * next to each cluster id.
    *
    * Plan: the cached e13 assignment (map-side after training) joins
    * the doc table on id, then e37's exact shape one level up: one
    * (cluster, token) aggregate, a cluster-count-bounded df broadcast,
    * a 1-row cluster-count broadcast, and a rank window partitioned by
    * cluster — key spaces are clusters×vocabulary, never corpus-sized. */
  def clusterCards(emb: DataFrame, docs: DataFrame, k: Int = 3,
      nlist: Int = 16, iters: Int = 2): DataFrame = {
    val (_, indexed) = ivfIndexed(emb, nlist, iters)
    val assign = indexed.select(col("vec_id").as("doc_id"), col("cluster"))
    val tf = docs.join(assign, Seq("doc_id"))
      .select(col("cluster"), explode_outer(TextHash.tokens(col("text"))).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .groupBy("cluster", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val ncl = tf.agg(count_distinct(col("cluster")).as("ncl"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("score_q").desc, col("tok"))
    tf
      .join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(ncl))
      .withColumn("score_q",
        col("tf") * (lnQ1k(col("ncl") + lit(1)) - lnQ1k(col("df") + lit(1))) * lit(1000L))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("cluster"), col("rank"), col("tok"), col("score_q"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, the
    * CCMatrix/LASER parallel-pair miner): score a candidate pair not
    * by raw cosine but by its RATIO to the two sides' average
    * k-nearest-neighbor cosine —
    *   margin(x, y) = cos(x, y) / ((avgk(x) + avgk(y)) / 2)
    * — which cancels out "hub" vectors that sit close to everything
    * (a hub's high raw cosine is divided away by its own high
    * neighborhood average). A source vector accepts its best target
    * iff margin ≥ `minMarginQ`/1e6 (the classic threshold is 1.0+ε).
    *
    * Determinism contract: per-pair sims are the shared 6-dp rounded
    * fold, then quantized to integer micro-units, so the k-sums are
    * order-independent longs and the margin is one double division of
    * exact integers — engine-identical. Both neighborhood averages
    * come from the SAME pair stream (two rank windows, no second
    * scan): avgk(src) over its targets, avgk(tgt) over the source
    * QUERY set — the mining-run form of the margin (the reference
    * denominator is whatever candidate sets the run scored).
    *
    * Scale shape: the pair stream is broadcast(src-queries) × target
    * corpus — the e06 bounded-scope exact form; at corpus×corpus scale
    * the stream comes from the IVF/LSH candidate generators instead
    * (margin is a post-scan formula, not a plan change). The stream is
    * derived ONCE and exchanged three times (src → tgt → src): the
    * k-sums are conditional window aggregates riding the rank windows'
    * own partitionings, not groupBy+join-back consumers that would
    * each re-derive the scan (PlanShapeSpec pins the single
    * nested-loop scan). */
  def marginMine(emb: DataFrame, srcPred: Column, tgtPred: Column,
      k: Int = 4, minMarginQ: Long = 1000000L): DataFrame = {
    val e = withNorm(emb)
    val src = e.filter(srcPred)
      .select(col("vec_id").as("src_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    val scored = e.filter(tgtPred)
      .join(broadcast(src), col("vec_id") =!= col("src_id"))
      .select(col("src_id"), col("vec_id").as("tgt_id"),
        cosSim(col("qv"), col("qnrm"), col("embedding"), col("nrm")).as("sim"))
      .withColumn("simq", round(col("sim") * 1000000).cast("long"))
    // ONE derivation of the pair stream serves everything: ranks via
    // two ordered windows, then both k-neighborhood sums as
    // CONDITIONAL window aggregates over the already-ranked frame —
    // no groupBy+join back (which would re-derive the scan per
    // consumer). The ksum windows share their rank window's
    // partitioning, so the stream is exchanged three times total
    // (src → tgt → src), never re-scanned.
    val wS = Window.partitionBy(col("src_id"))
      .orderBy(col("sim").desc, col("tgt_id"))
    val wT = Window.partitionBy(col("tgt_id"))
      .orderBy(col("sim").desc, col("src_id"))
    val cand = scored
      .withColumn("rs", row_number().over(wS))
      .withColumn("rt", row_number().over(wT))
      .withColumn("ksum_tgt",
        sum(when(col("rt") <= k, col("simq")))
          .over(Window.partitionBy(col("tgt_id"))))
      .withColumn("ksum_src",
        sum(when(col("rs") <= k, col("simq")))
          .over(Window.partitionBy(col("src_id"))))
      .filter(col("rs") <= k)
      .withColumn("den", col("ksum_src") + col("ksum_tgt"))
      .filter(col("den") > 0)
      .withColumn("margin_q",
        floor(lit(2L * k) * col("simq").cast("double")
          / col("den").cast("double") * 1000000).cast("long"))
    val wBest = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_q").desc, col("tgt_id"))
    cand
      .withColumn("best", row_number().over(wBest))
      .filter(col("best") === 1 && col("margin_q") >= minMarginQ)
      .select(col("src_id"), col("tgt_id"), col("sim"), col("margin_q"))
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    * ranking ([[TextAnalysis.bm25TopK]]) and the dense cosine ranking
    * ([[bruteTopK]]) — the standard RAG/curation fusion (RRF,
    * Cormack et al.): score(d) = Σ_lists 1/(c + rank_list(d)).
    * Computed as BIGINT `1e9 div (c + rank)` contributions so the
    * fused order is engine-exact; ties break on doc_id. A doc on only
    * one list contributes only that list's term (the other rank shows
    * NULL in the audit columns). The dense side excludes self-matches
    * (bruteTopK's contract), the lexical side keeps them — fusion is
    * rank-based, so the asymmetry is visible in the audit columns
    * rather than hidden.
    *
    * Scale shape: both inputs are top-`kEach` lists — (queries ×
    * kEach)-bounded frames — so the fusion join and final window cost
    * nothing at any corpus size; the real work lives in the two
    * retrieval operators, each already scale-audited. At 100 TB the
    * dense list swaps to the IVF/PQ path with no change here. */
  def rrfFuse(docs: DataFrame, emb: DataFrame,
      lexPred: Column, densePred: Column,
      kEach: Int = 20, kOut: Int = 5, c: Int = 60): DataFrame = {
    val lex = TextAnalysis.bm25TopK(docs, lexPred, k = kEach)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val dense = bruteTopK(emb, densePred, kEach)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").cast("long").as("dense_rank"))
    rrfFuseFrames(lex, dense, kOut, c)
  }

  /** RRF over PRECOMPUTED ranking frames — the entry point for callers
    * that already hold (or landed) the per-retriever rankings (the
    * e13/e26 shared-artifact pattern: retrieval lists are reusable
    * artifacts; fusing N retrievers should not recompute retriever 1
    * N times, and a bench rep should not pay both retrievals per
    * fusion). `lex` = (query_id, doc_id, lex_rank); `dense` =
    * (query_id, doc_id, dense_rank). Frames are (queries × k)-bounded,
    * so everything here is tiny regardless of corpus size. */
  def rrfFuseFrames(lex: DataFrame, dense: DataFrame,
      kOut: Int = 5, c: Int = 60): DataFrame = {
    val fused = lex
      .join(dense, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_q",
        coalesce(expr(s"1000000000L div ($c + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000L div ($c + dense_rank)"), lit(0L)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_q").desc, col("doc_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kOut)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_q"),
        col("lex_rank"), col("dense_rank"))
  }

  /** Retrieval-quality evaluation: nDCG@k and MRR of the dense cosine
    * ranking against LABEL relevance (a neighbor is relevant iff it
    * shares the query's label) — the complement of e69's recall sweep,
    * which scores an ANN index against brute truth; this scores the
    * embedding SPACE itself against ground-truth classes (the standard
    * embedding-benchmark protocol).
    *
    * Determinism: DCG weights are FLOOR(1e6/log2(rank+1)) integers, so
    * per-query DCG/IDCG are exact integer sums; MRR is the exact
    * integer `1e6 div first_relevant_rank`; nDCG is one 6-dp-rounded
    * double division of exact integers. IDCG uses true nDCG@k
    * semantics: the ideal list holds min(R, k) relevant docs where R =
    * corpus docs sharing the label (self excluded).
    *
    * Scale shape: the ranked lists are (queries × k)-bounded; labels
    * join them via one broadcast-tiny-side pass over the corpus label
    * table; per-label counts are label-cardinality-bounded; the
    * cumulative-weight table is k rows. Nothing corpus-sized is
    * windowed or broadcast. */
  def retrievalNdcg(emb: DataFrame, queryPred: Column, k: Int = 10): DataFrame = {
    val labels = emb.select(col("vec_id"), col("label"))
    val top = bruteTopK(emb, queryPred, k)
    // label of each query and neighbor: tiny frames broadcast against
    // the corpus label table
    val withLabels = labels.join(broadcast(top),
        labels("vec_id") === top("neighbor_id"))
      .select(col("query_id"), col("rank"), col("label").as("nlab"))
      .join(broadcast(labels
          .withColumnRenamed("vec_id", "query_id")
          .withColumnRenamed("label", "qlab")
          .join(broadcast(top.select("query_id").distinct()), Seq("query_id"))),
        Seq("query_id"))
    val graded = withLabels
      .withColumn("rel", (col("nlab") === col("qlab")).cast("long"))
      .withColumn("w",
        floor(lit(1e6) / log2(col("rank").cast("double") + lit(1.0))).cast("long"))
    val perQuery = graded.groupBy("query_id", "qlab").agg(
      sum(col("rel")).as("n_rel_topk"),
      sum(col("rel") * col("w")).as("dcg_q"),
      min(when(col("rel") === 1, col("rank"))).cast("long").as("first_rel"))
    // R per query = corpus count of its label minus self
    val labCnt = labels.groupBy("label").agg(count(lit(1)).as("lab_n"))
    // cumulative ideal weights: k rows
    val cw = emb.sparkSession.range(1, k + 1)
      .select(col("id").cast("long").as("rnk"))
      .withColumn("w",
        floor(lit(1e6) / log2(col("rnk").cast("double") + lit(1.0))).cast("long"))
      .withColumn("cumw", sum(col("w")).over(
        Window.orderBy(col("rnk")).rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("rnk"), col("cumw"))
    perQuery
      .join(broadcast(labCnt), col("qlab") === col("label"))
      .withColumn("r_corpus", greatest(col("lab_n") - 1, lit(0L)))
      .withColumn("ideal_n", least(col("r_corpus"), lit(k.toLong)))
      .join(broadcast(cw), col("ideal_n") === col("rnk"), "left")
      .withColumn("idcg_q", coalesce(col("cumw"), lit(0L)))
      .withColumn("mrr_q",
        coalesce(expr("1000000L div first_rel"), lit(0L)))
      .withColumn("ndcg",
        when(col("idcg_q") > 0,
          round(col("dcg_q").cast("double") / col("idcg_q"), 6))
          .otherwise(lit(0.0)))
      .select(col("query_id"), col("n_rel_topk"), col("r_corpus"),
        col("first_rel"), col("mrr_q"), col("dcg_q"), col("idcg_q"), col("ndcg"))
  }
}
