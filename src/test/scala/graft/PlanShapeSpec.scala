package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext._

/** Physical-plan pins for the round-9 operator family — the scale
  * contracts the scaladocs claim, asserted against the actual executed
  * plan strings (the same style as VisibilitySpec's exchange-parity and
  * DedupIndexSpec's no-shuffle pins):
  *   - map-side ops really are exchange-free,
  *   - bounded side tables really broadcast (no sort-merge join ever
  *     lands on a corpus-sized stream against a fixed-size table),
  *   - the one intentionally-flat scan (marginMine's bounded query
  *     broadcast) is the ONLY nested-loop join in its plan.
  */
class PlanShapeSpec extends SparkSpec {

  private lazy val docs =
    graft.model.Tables.load(spark, s"$sf0001/documents.parquet")
  private lazy val emb =
    graft.model.Tables.load(spark, s"$sf0001/embeddings.parquet")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def count(p: String, token: String): Int =
    token.r.findAllIn(p).length

  // Tables.load adds ONE deliberate REPARTITION_BY_NUM exchange (the
  // documented scan-parallelism repair); map-side contracts therefore
  // pin the OP-induced exchanges — ENSURE_REQUIREMENTS — at zero.
  test("imageFeatures is exchange-free (pure map chain, decode included)") {
    val p = plan(Multimodal.imageFeatures(Multimodal.ingestPng(docs)).toDF())
    assert(count(p, "ENSURE_REQUIREMENTS") === 0, s"unexpected shuffle:\n$p")
  }

  test("audio decode/features/fingerprint are exchange-free map chains") {
    for (df <- Seq(
        Multimodal.audioFeatures(Multimodal.ingestWav(docs)).toDF(),
        Multimodal.audioFingerprint(Multimodal.ingestWav(docs)))) {
      val p = plan(df)
      assert(count(p, "ENSURE_REQUIREMENTS") === 0, s"unexpected shuffle:\n$p")
    }
  }

  test("audioNearDup candidates come from the banded equi-join, never all-pairs") {
    // the persisted result's lineage still carries the join plan; the
    // pin is on the WHOLE tree string (InMemoryRelation prints its
    // cached child), so a cartesian anywhere in the lineage would show
    val out = Multimodal.audioNearDup(Multimodal.ingestWavDup(docs))
    val p = out.queryExecution.withCachedData.toString +
      plan(out)
    assert(count(p, "CartesianProduct") === 0, s"no cartesian:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 0, s"no flat scan:\n$p")
    out.unpersist(blocking = false)
  }

  test("gopher/repetition/token analyses are exchange-free") {
    for (df <- Seq(TextAnalysis.gopherRules(docs),
        TextAnalysis.repetitionSignals(docs), TextAnalysis.tokenStats(docs))) {
      val p = plan(df)
      assert(count(p, "ENSURE_REQUIREMENTS") === 0, s"unexpected shuffle:\n$p")
    }
  }

  test("dsirSample joins the token stream only against broadcasts") {
    val p = plan(Pipeline.dsirSample(docs, col("source") === "src0"))
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"bucket tables must broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0,
      s"no corpus-stream sort-merge join:\n$p")
  }

  test("bpeMerges keeps per-round winners as broadcasts") {
    val p = plan(TextAnalysis.bpeMerges(docs, rounds = 2))
    assert(count(p, "BroadcastExchange") >= 1, s"winners must broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0, s"no sort-merge join:\n$p")
  }

  test("TokenizerStore.encode is join-free (learned pairs are plan literals)") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_plan").toString
    TokenizerStore.build(docs, dir, rounds = 2)
    val p = plan(TokenizerStore.encode(spark, dir, docs))
    assert(count(p, "Join") === 0, s"no joins in the store-backed encode:\n$p")
    assert(count(p, "BroadcastExchange") === 0, s"no broadcasts either:\n$p")
  }

  test("marginMine's flat scan is its only nested-loop join, derived once") {
    val p = plan(Similarity.marginMine(emb,
      col("vec_id") % 2 === 0 && col("vec_id") < 40, col("vec_id") % 2 === 1))
    assert(count(p, "BroadcastNestedLoopJoin") === 1,
      s"exactly the bounded query×corpus scan:\n$p")
    assert(count(p, "CartesianProduct") === 0, s"no cartesian:\n$p")
    assert(count(p, "SortMergeJoin") === 0,
      s"k-sums ride the rank windows, never a join back:\n$p")
  }

  test("clusterCards broadcasts df/cluster-count tables; no cartesian on the token stream") {
    val p = plan(Similarity.clusterCards(emb, docs))
    assert(count(p, "BroadcastHashJoin") >= 1, s"df table must broadcast:\n$p")
    assert(count(p, "CartesianProduct") === 0, s"no cartesian:\n$p")
    assert(count(p, "SortMergeJoin") === 0, s"no sort-merge join:\n$p")
  }

  test("global top-k operators plan as TakeOrderedAndProject, not a one-partition window") {
    // dsirSample/uncertaintySample/memorizedSpans rank a frame that can
    // be corpus-scale; the plan must bound it with a parallel partial
    // top-k (TakeOrderedAndProject) BEFORE any partition-less rank
    // window — the window may only ever see the ≤k survivors.
    val cases = Seq(
      "e58" -> Pipeline.dsirSample(docs, col("source") === "src0",
        buckets = 256, k = 100),
      "e66" -> Similarity.uncertaintySample(emb, col("vec_id") % 20 === 1),
      "e68" -> Dedup.memorizedSpans(docs))
    import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec,
      GlobalLimitExec, CollectLimitExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other => other
    }
    for ((name, df) <- cases) {
      val phys = unwrap(df.queryExecution.executedPlan)
      assert(phys.find(_.isInstanceOf[TakeOrderedAndProjectExec]).isDefined,
        s"$name: expected a parallel partial top-k:\n$phys")
      val unbounded = phys.collect {
        case w: WindowExec if w.partitionSpec.isEmpty &&
          w.child.find {
            case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
                 _: CollectLimitExec => true
            case _ => false
          }.isEmpty => w
      }
      assert(unbounded.isEmpty,
        s"$name: partition-less window over an unbounded frame:\n$phys")
    }
  }

  test("pplBuckets default plan has no single-partition window") {
    // the r9 verdict's one default-path scale flag: the exact-ntile
    // global sort must be OPT-IN only — the default derives cutoffs
    // with a mergeable approx_percentile and buckets map-side
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other => other
    }
    val phys = unwrap(
      TextAnalysis.pplBuckets(docs).queryExecution.executedPlan)
    val unbounded = phys.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unbounded.isEmpty,
      s"default pplBuckets must not window partition-less:\n$phys")
    // the opt-in exact path IS the one-partition ntile (the oracle twin)
    val exact = unwrap(TextAnalysis.pplBuckets(docs, exactNtile = true)
      .queryExecution.executedPlan)
    assert(exact.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.nonEmpty)
  }

  test("bm25 prunes the postings stream with broadcasts only; no corpus sort-merge") {
    val p = plan(TextAnalysis.bm25TopK(docs, col("doc_id") % 50 === 0))
    assert(count(p, "SortMergeJoin") === 0, s"no corpus-stream sort-merge:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 3,
      s"query terms / queries / df must broadcast:\n$p")
    assert(count(p, "CartesianProduct") === 0, s"no cartesian:\n$p")
  }

  test("rrf fusion windows only the bounded fused lists") {
    val p = plan(Similarity.rrfFuse(docs, emb,
      col("doc_id") % 50 === 0, col("vec_id") % 50 === 0))
    // the one full-outer join runs on (queries × k) frames; the corpus
    // streams must never cartesian beyond bruteTopK's bounded
    // query-broadcast scan
    assert(count(p, "CartesianProduct") === 0, s"no cartesian:\n$p")
    // exactly two bounded nested-loops are by-design: bruteTopK's
    // query-broadcast scan (non-equi self-exclusion) and bm25's 1-row
    // stats cross join
    assert(count(p, "BroadcastNestedLoopJoin") <= 2,
      s"only the two bounded-by-design nested-loops may appear:\n$p")
  }

  test("retrievalNdcg joins label/weight tables as broadcasts") {
    val p = plan(Similarity.retrievalNdcg(emb, col("vec_id") % 50 === 0))
    assert(count(p, "SortMergeJoin") === 0, s"bounded frames must not SMJ:\n$p")
    assert(count(p, "CartesianProduct") === 0, s"no cartesian:\n$p")
  }

  test("windowPpl and noveltyScore never nested-loop or cartesian join") {
    for (df <- Seq(TextAnalysis.windowPpl(docs),
        TextAnalysis.noveltyScore(docs))) {
      val p = plan(df)
      assert(count(p, "CartesianProduct") === 0, s"no cartesian:\n$p")
      assert(count(p, "BroadcastNestedLoopJoin") <= 1,
        s"only the 1-row total may nest:\n$p")
    }
  }

  // The audited single-partition-global-window set: every declared
  // query whose RETURNED plan carries a Window with no partitionSpec,
  // each bounded by construction —
  //   c01/c03/c04/c14: rank-parity checks over the already-sorted
  //     roundtrip output (the declared result IS the ordered census);
  //   e38: quantile thresholds over the k-bucket frame;
  //   e57: the vocab-bounded coverage curve;
  //   e58/e63/e66/e78: rank/pick windows over orderBy+limit survivors
  //     or fixed bucket/judge frames (≤ m rows by the time the window
  //     runs — the scaladocs pin the TakeOrderedAndProject split);
  //   e68: the ≤topN repeated-span survivors;
  //   q104: the store-count-sized hbtop ranking.
  //   q121: the slow-log response rank — input is the per-server rings
  //     (servers × ringSize rows by construction, volume-independent).
  // A NEW name landing here means someone put a potentially
  // corpus-sized global window in a declared query — stop and
  // repartition (or orderBy+limit first) instead of extending the
  // list.
  private val AllowedGlobalWindows: Set[String] = Set(
    "c01_ordered_key_sort", "c03_narrow_types", "c04_hb_layout_sort",
    "c14_hb_narrow_sort", "e38_ppl_buckets", "e57_vocab_coverage",
    "e58_dsir_sample", "e63_ccnet_verdict", "e66_uncertainty",
    "e68_memorized_spans", "e78_retrieval_ndcg", "q104_cluster_metrics",
    "q121_slow_log")

  test("declared queries: the global-window set is pinned exactly") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // plan-only sweep at the driver's correctness SF (some lifecycle
    // fixtures legitimately need sf0.01's distribution — q101's
    // normalizer plan census): q.fn runs its fixture/lifecycle side
    // effects but the returned frame is PLANNED, never executed
    val offenders = graft.Queries.all.flatMap { q =>
      val wins = q.fn(spark, "/root/testdata/sf0.01")
        .queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            w.getClass.getSimpleName
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
            w.getClass.getSimpleName
        }
      if (wins.nonEmpty) Some(q.name) else None
    }.toSet
    assert(offenders == AllowedGlobalWindows,
      s"global-window set drifted; new: ${(offenders -- AllowedGlobalWindows).toSeq.sorted}, " +
        s"gone: ${(AllowedGlobalWindows -- offenders).toSeq.sorted}")
  }
}
