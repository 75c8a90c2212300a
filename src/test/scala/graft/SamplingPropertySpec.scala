package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ext.Pipeline

/** Randomized exact-equivalence of the deterministic sampling family
  * (hashSample / trainSplit / domainCap / domainReweight) against an
  * independent in-JVM replica of the 48-bit salted md5 hash — the same
  * cross-engine contract the DuckDB oracles rely on, checked here over
  * random corpora, fractions, caps, and weights. Seeded — deterministic.
  */
class SamplingPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Independent hash48 twin: first 12 hex chars of md5("salt:x"). */
  private def h48(x: String, salt: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$x".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
  }

  private def genDocs(rnd: Random): Seq[(Long, String)] = {
    val n = 50 + rnd.nextInt(150)
    val nDom = 2 + rnd.nextInt(6)
    (0 until n).map(i => (i.toLong + rnd.nextInt(5) * 1000L, s"dom${rnd.nextInt(nDom)}"))
      .distinct
  }

  test("hashSample equals the in-JVM hash-threshold replica on random corpora") {
    val rnd = new Random(1)
    for (_ <- 1 to 5) {
      val docs = genDocs(rnd)
      val frac = rnd.nextDouble()
      val df = docs.toDF("doc_id", "source")
      val got = Pipeline.hashSample(df, frac).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val want = docs.map(_._1)
        .filter(id => h48(id.toString, "sample") < (frac * (1L << 48)).toLong).toSet
      assert(got === want, s"frac=$frac")
    }
  }

  test("trainSplit equals the in-JVM bucket replica") {
    val rnd = new Random(2)
    val docs = genDocs(rnd)
    val got = Pipeline.trainSplit(docs.toDF("doc_id", "source"))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.map { case (id, _) =>
      val b = h48(id.toString, "split") % 100
      id -> (if (b < 90) "train" else if (b < 95) "val" else "test")
    }.toMap
    assert(got === want)
  }

  test("domainCap equals the in-JVM top-cap-per-domain replica") {
    val rnd = new Random(3)
    for (_ <- 1 to 5) {
      val docs = genDocs(rnd)
      val cap = 1 + rnd.nextInt(12)
      val buckets = 1 + rnd.nextInt(5)
      val got = Pipeline.domainCap(docs.toDF("doc_id", "source"),
          col("source"), cap, buckets = buckets)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val want = docs.groupBy(_._2).values.flatMap { g =>
        g.map(_._1).sortBy(id => (h48(id.toString, "cap"), id)).take(cap)
      }.toSet
      assert(got === want, s"cap=$cap buckets=$buckets")
    }
  }

  test("domainReweight equals the in-JVM waterfilling replica") {
    val rnd = new Random(4)
    for (_ <- 1 to 5) {
      val docs = genDocs(rnd)
      val domains = docs.map(_._2).distinct
      // weight a random subset of domains with positive random weights
      val weighted = domains.filter(_ => rnd.nextBoolean()) match {
        case Nil => domains.take(1)
        case ds  => ds
      }
      val weights = weighted.map(d => d -> (0.05 + rnd.nextDouble())).toMap
      val got = Pipeline.domainReweight(docs.toDF("doc_id", "source"), weights)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val counts = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val k = weights.collect { case (d, w) if counts.contains(d) => counts(d) / w }.min
      val want = docs.filter { case (id, dom) =>
        weights.get(dom).exists { w =>
          val f = math.min(1.0, w * k / counts(dom))
          h48(id.toString, "reweight") < math.floor(f * (1L << 48).toDouble).toLong
        }
      }.map(_._1).toSet
      assert(got === want, s"weights=$weights")
    }
  }
}
