package graft

import org.apache.spark.sql.functions._

import graft.ext.Pipeline
import graft.model.Tables

/** Corpus-preparation operators (Pipeline): splits, samples, packing,
  * decontamination, PII scrubbing. */
class CorpusPrepSpec extends SparkSpec {

  lazy val docs = Tables.load(spark, s"$sf0001/documents.parquet").cache()

  test("trainSplit is a deterministic exhaustive partition") {
    val s1 = Pipeline.trainSplit(docs)
    val byId = s1.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.size === docs.count())
    // every doc lands in exactly one split; re-run is identical
    val again = Pipeline.trainSplit(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId === again)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    // 90/5/5 on ~150 docs: train must dominate
    assert(counts("train") > counts.getOrElse("val", 0L))
    assert(counts("train") > counts.getOrElse("test", 0L))
  }

  test("hashSample keeps roughly frac and is a subset under growing frac") {
    val n = docs.count()
    val s10 = Pipeline.hashSample(docs, 0.1).select("doc_id").collect().map(_.getLong(0)).toSet
    val s50 = Pipeline.hashSample(docs, 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s50)) // nested samples: same salt, larger threshold
    assert(s50.size > s10.size)
    assert(Pipeline.hashSample(docs, 0.0).count() === 0)
    assert(Pipeline.hashSample(docs, 1.0).count() === n)
  }

  test("stratifiedSample takes exactly ceil(frac * n) per stratum") {
    val expected = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> math.ceil(r.getLong(1) * 0.25).toLong).toMap
    val got = Pipeline.stratifiedSample(docs, col("lang"), 0.25)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("packSequences: next-fit invariants hold per shard") {
    val cap = 256L
    val packed = Pipeline.packSequences(docs, capacity = cap, shards = 4).collect()
    assert(packed.length === docs.count())
    val byShard = packed.groupBy(_.getInt(0))
    byShard.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1)) // doc_id order
      var fill = 0L; var pack = 0L
      sorted.foreach { r =>
        val (t, pid, pfill) = (r.getLong(2), r.getLong(3), r.getLong(4))
        if (fill > 0 && fill + t > cap) { pack += 1; fill = t } else fill += t
        assert(pid === pack, s"pack_id mismatch at doc ${r.getLong(1)}")
        assert(pfill === fill)
        // a pack never exceeds capacity unless it holds one oversized doc
        assert(pfill <= cap || pfill === t)
      }
    }
    // pack ids are dense from 0 per shard
    byShard.foreach { case (_, rows) =>
      val pids = rows.map(_.getLong(3)).distinct.sorted
      assert(pids === (0L to pids.max).toArray.toSeq)
    }
  }

  test("decontaminate flags an injected benchmark copy and only that") {
    // doc 100000 is a verbatim copy of doc 3 -> shares all its shingles
    val bench = docs.filter(col("doc_id") === 3)
      .withColumn("doc_id", lit(100000L))
    val corpus = docs.unionByName(bench)
    val hits = Pipeline.decontaminate(corpus, col("doc_id") === 100000L,
        n = 8, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.contains((3L, 100000L)))
    // at 8-gram granularity with minShared=3, only the copy collides
    assert(hits.forall(_._2 === 100000L))
  }

  test("decontaminateBloom's exact verdict equals the broadcast path's, bloom or not") {
    // same injected-copy corpus as the decontaminate test: the bloom is
    // a prune, so the verdict must equal the e20 pair set aggregated
    val bench = docs.filter(col("doc_id") === 3)
      .withColumn("doc_id", lit(100000L))
    val corpus = docs.unionByName(bench)
    val viaBloom = Pipeline.decontaminateBloom(corpus,
        col("doc_id") === 100000L, n = 8, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaPairs = Pipeline.decontaminate(corpus,
        col("doc_id") === 100000L, n = 8, minShared = 3)
      .groupBy("train_id")
      .agg(count(lit(1)).as("n"), max("shared").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaBloom === viaPairs)
    assert(viaBloom.exists(_._1 === 3L)) // the copied doc is flagged
    // an aggressive fpp still cannot change the verdict (only probe cost)
    val viaLoose = Pipeline.decontaminateBloom(corpus,
        col("doc_id") === 100000L, n = 8, minShared = 3, fpp = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaLoose === viaPairs)
  }

  test("epochMix upsamples to the target mixture; anchor domain used exactly once") {
    import spark.implicits._
    // srcA 40 docs, srcB 10 docs; target 50/50 → srcA is the anchor
    // (largest n/w), used once; srcB repeats r = 4× each
    val d = ((1L to 40L).map(i => (i, "srcA")) ++
      (41L to 50L).map(i => (i, "srcB"))).toDF("doc_id", "source")
    val mix = Pipeline.epochMix(d, Map("srcA" -> 0.5, "srcB" -> 0.5))
    val rows = mix.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perDoc = rows.groupBy(_._1).view.mapValues(_.length).toMap
    (1L to 40L).foreach(i => assert(perDoc(i) === 1, s"anchor doc $i"))
    (41L to 50L).foreach(i => assert(perDoc(i) === 4, s"upsampled doc $i"))
    // copy indices are dense from 0 per doc; re-run is identical
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted === (0L until rs.length).toSeq)
    }
    val again = Pipeline.epochMix(d, Map("srcA" -> 0.5, "srcB" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.sorted === again.sorted)
    // fractional rates stay deterministic and within ±1 of the target
    val frac = Pipeline.epochMix(d, Map("srcA" -> 0.6, "srcB" -> 0.4))
    val bCount = frac.filter(col("source") === "srcB").count()
    // r_B = 0.4*(40/0.6)/10 = 8/3 → each of 10 docs gets 2 or 3 copies
    assert(bCount >= 20 && bCount <= 30)
  }

  test("piiScrub redacts emails, IPs, and digit runs in stage order") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact bob@example.com or 10.0.0.1 port 8080"),
      (2L, "no pii here"),
      (3L, "ids 123 456 and ip 192.168.1.254")
    ).toDF("id", "t")
    val out = Pipeline.piiScrub(df, "id", "t").orderBy("id").collect()
    assert(out(0).getString(1) === "contact <EMAIL> or <IP> port <NUM>")
    assert((out(0).getInt(2), out(0).getInt(3), out(0).getInt(4)) === ((1, 1, 1)))
    assert(out(1).getString(1) === "no pii here")
    assert((out(1).getInt(2), out(1).getInt(3), out(1).getInt(4)) === ((0, 0, 0)))
    assert(out(2).getString(1) === "ids <NUM> <NUM> and ip <IP>")
    assert((out(2).getInt(2), out(2).getInt(3), out(2).getInt(4)) === ((0, 1, 2)))
  }

  test("repetitionSignals counts top word and duplicated n-grams exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a"),       // 5 toks; 'a'×3; 2-grams: ab,ba,ab,ba → 2 dups; 3-grams: aba,bab,aba → 1 dup
      (2L, "x y z"),           // all distinct, no dup grams
      (3L, "w")                // single token: no 2/3-grams
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.repetitionSignals(df)
      .orderBy("doc_id").collect()
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getLong(3), out(0).getLong(4))
      === ((5L, 3L, 2L, 1L)))
    assert((out(1).getLong(1), out(1).getLong(2), out(1).getLong(3), out(1).getLong(4))
      === ((3L, 1L, 0L, 0L)))
    assert((out(2).getLong(1), out(2).getLong(2), out(2).getLong(3), out(2).getLong(4))
      === ((1L, 1L, 0L, 0L)))
  }

  test("domainCap keeps at most cap per domain, deterministically, matching 1-bucket form") {
    val capped = Pipeline.domainCap(docs, col("source"), cap = 3)
    val per = capped.groupBy("source").count().collect()
    assert(per.forall(_.getLong(1) <= 3))
    // domains with >= 3 docs are filled to exactly cap
    val full = docs.groupBy("source").count().collect()
      .filter(_.getLong(1) >= 3).map(_.getString(0)).toSet
    assert(per.filter(r => full(r.getString(0))).forall(_.getLong(1) === 3))
    // two-level pre-prune selects the same rows as the plain window
    val plain = Pipeline.domainCap(docs, col("source"), cap = 3, buckets = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val two = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(two === plain)
  }

  test("bigramLogProb scores predictable sequences above novel ones") {
    import spark.implicits._
    // "a b" dominates; doc 2's "a c" is the rare continuation of "a"
    val df = (Seq((1L, "a b a b a b"), (2L, "a c a b a b")) ++
      (3L to 12L).map(i => (i, "a b a b"))).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.bigramLogProb(df)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 5L) // 6 tokens -> 5 bigrams
    assert(out(0).getDouble(2) > out(1).getDouble(2))
    // single-token docs are absent
    val one = graft.ext.TextAnalysis.bigramLogProb(Seq((9L, "solo")).toDF("doc_id", "text"))
    assert(one.count() === 0L)
  }

  test("domainReweight hits the target mixture without upsampling") {
    import spark.implicits._
    // 100 docs in dom0, 50 in dom1, 10 in dom2 (unweighted -> dropped)
    val df = ((1 to 100).map(i => (i.toLong, "dom0")) ++
      (101 to 150).map(i => (i.toLong, "dom1")) ++
      (151 to 160).map(i => (i.toLong, "dom2"))).toDF("doc_id", "source")
    val kept = Pipeline.domainReweight(df, Map("dom0" -> 0.5, "dom1" -> 0.5))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // K = min(100/0.5, 50/0.5) = 100: dom1 binds (keeps all 50),
    // dom0 halves (hash sampling is approximate: O(1/sqrt n) deviation)
    assert(kept("dom1") === 50L)
    assert(kept("dom0") >= 35L && kept("dom0") <= 65L, s"dom0=${kept("dom0")}")
    assert(!kept.contains("dom2"))
    // deterministic under re-run
    val again = Pipeline.domainReweight(df, Map("dom0" -> 0.5, "dom1" -> 0.5))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept === again)
  }

  test("unigramLogProb scores common-token text above rare-token text") {
    import spark.implicits._
    // 'the' dominates the corpus; 'zyx' appears once
    val df = (Seq((1L, "the the the the"), (2L, "zyx the the the")) ++
      (3L to 20L).map(i => (i, "the the and and"))).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.unigramLogProb(df)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 4L)
    val common = out(0).getDouble(2)
    val rare = out(1).getDouble(2)
    assert(common > rare, s"common $common should beat rare $rare")
  }

  test("chunkDocs covers every token with the declared overlap") {
    import graft.ext.TextHash
    val chunks = Pipeline.chunkDocs(docs, width = 64, stride = 48).cache()
    val nToks = docs.select(size(TextHash.tokens(col("text"))).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    // coverage: per doc, chunk lengths sum to n + 16 * (n_chunks - 1)
    // (each non-first chunk re-reads exactly width-stride=16 tokens),
    // so total tokens reconstruct exactly
    val agg = chunks.groupBy("doc_id")
      .agg(sum(col("chunk_len")).as("s"), count(lit(1)).as("c")).cache()
    val reconstructed = agg.agg(sum(col("s") - (col("c") - 1) * 16)).head().getLong(0)
    assert(reconstructed === nToks)
    // every chunk except a doc's last is exactly `width` long
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val short = chunks
      .withColumn("last", col("chunk_idx") === max(col("chunk_idx")).over(w))
      .filter(!col("last") && col("chunk_len") =!= 64).count()
    assert(short === 0)
    // deterministic chunk ids start at 0 and are dense
    val idx = chunks.groupBy("doc_id")
      .agg(min(col("chunk_idx")).as("lo"), max(col("chunk_idx")).as("hi"),
        count(lit(1)).as("c"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("c") - 1).count()
    assert(idx === 0)
  }

  test("chunkPack splits overlong docs then packs next-fit (hand-traced)") {
    import spark.implicits._
    // doc 1: 300 tokens → chunks 128/128/44; doc 2: 100 tokens.
    // capacity 256, one shard: [c0,c1]=256 | [c2, doc2]=144
    val tiny = Seq(
      1L -> (1 to 300).map(i => s"t$i").mkString(" "),
      2L -> (1 to 100).map(i => s"u$i").mkString(" ")
    ).toDF("doc_id", "text")
    val got = Pipeline.chunkPack(tiny, maxLen = 128, capacity = 256, shards = 1)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, 0L, 128L, 0L, 128L),
      (1L, 1L, 128L, 0L, 256L),
      (1L, 2L, 44L, 1L, 44L),
      (2L, 0L, 100L, 1L, 144L)))
    // no chunk ever exceeds maxLen, no pack ever exceeds capacity
    val all = Pipeline.chunkPack(docs, maxLen = 64, capacity = 256, shards = 4)
    assert(all.filter(col("chunk_len") > 64).count() === 0)
    assert(all.filter(col("pack_fill") > 256).count() === 0)
  }

  test("datasetDiff classifies added/removed/changed/same; whitespace edits are same") {
    import spark.implicits._
    val v1 = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "kept text"),
      (4L, "spaced   out")).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "alpha beta zeta"), // changed
      (3L, "kept text"), // same
      (4L, "spaced out"), // whitespace-only edit → same fingerprint
      (9L, "brand new")).toDF("doc_id", "text") // added; 2 removed
    val got = Pipeline.datasetDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "changed", 2L -> "removed", 3L -> "same",
      4L -> "same", 9L -> "added"))
  }

  test("temperatureMix flattens toward uniform; alpha=1 is the identity epoch") {
    import spark.implicits._
    // hot source: 90 docs; rare source: 10 docs
    val d = ((1L to 90L).map(i => (i, "hot")) ++
      (101L to 110L).map(i => (i, "rare"))).toDF("doc_id", "source")
    // alpha=1 keeps the natural distribution (rates = 1 up to the
    // 1e-9 exp∘ln quantization sliver — at most one hash in 1e9 flips)
    val id = Pipeline.temperatureMix(d, alpha = 1.0)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(id("hot") >= 89L && id("hot") <= 91L &&
      id("rare") >= 9L && id("rare") <= 11L, s"near-identity epoch: $id")
    val mixed = Pipeline.temperatureMix(d, alpha = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mixed("rare") > 10L, "rare source upsamples")
    assert(mixed("hot") < 90L, "hot source thins")
    // epoch size ≈ corpus size (rates normalize to N in expectation)
    val total = mixed.values.sum
    assert(total >= 85L && total <= 115L, s"epoch ~corpus-sized: $total")
    // deterministic
    val again = Pipeline.temperatureMix(d, alpha = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mixed === again)
  }

  test("dsirSample ranks target-like candidates first and excludes the target") {
    import spark.implicits._
    // target (ids 1-5) speaks {alpha beta}; raw background (ids 10-29)
    // speaks {zeta eta}; candidates 100/101 mix them in opposite
    // proportions — the alpha-heavy one must outrank the zeta-heavy one
    val docs = (
      (1L to 5L).map(i => (i, "t", "alpha beta alpha beta")) ++
        (10L to 29L).map(i => (i, "r", "zeta eta zeta eta")) ++
        Seq((100L, "r", "alpha beta alpha zeta"),
          (101L, "r", "zeta eta zeta alpha"))
    ).toDF("doc_id", "source", "text")
    val out = Pipeline.dsirSample(docs, col("source") === "t", buckets = 64, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(!out.keySet.exists(_ <= 5L), "target docs are not candidates")
    assert(out.contains(100L) && out.contains(101L))
    assert(out(100L) < out(101L), "alpha-heavy candidate ranks better")
    // deterministic: same ranks on a re-run
    val again = Pipeline.dsirSample(docs, col("source") === "t", buckets = 64, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === again)
  }

  test("canonicalizeUrl normalizes case/port/www/tracking/slash and is idempotent") {
    import spark.implicits._
    val cases = Seq(
      ("HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&b=2&a=1", "https://ex.com/A/b?a=1&b=2"),
      ("http://ex.com:80/", "http://ex.com"),
      ("http://ex.com:8080/p", "http://ex.com:8080/p"),
      ("https://ex.com/p?utm_medium=z", "https://ex.com/p"),
      ("https://ex.com/p#frag", "https://ex.com/p"),
      ("ftp://Ex.Com:443/f", "ftp://ex.com:443/f")
    ).toDF("url", "want")
    val got = cases.withColumn("canon", Pipeline.canonicalizeUrl(col("url")))
    assert(got.filter(col("canon") =!= col("want")).count() === 0)
    // idempotence: canon(canon(u)) = canon(u)
    val twice = got.withColumn("again", Pipeline.canonicalizeUrl(col("canon")))
    assert(twice.filter(col("again") =!= col("canon")).count() === 0)
  }
}
