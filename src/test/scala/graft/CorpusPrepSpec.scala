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
}
