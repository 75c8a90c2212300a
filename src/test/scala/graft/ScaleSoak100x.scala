package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 100× scale soak (the round-9/10 carried task): run the
  * three flagship shapes — q36 chain verify, Dedup.minHashNearDups,
  * TextAnalysis.bm25TopK — at 1×/10×/100× of the sf0.1 fixtures under
  * local[32] and record PER-STAGE shuffle bytes, so the "plans you'd
  * want at 100 TB" claim is measured, not argued. A stage whose
  * shuffle grows super-linearly in the input is the scale hazard this
  * hunts (candidate-pair blow-ups, single-partition windows).
  *
  * Corpus replication keeps per-replica statistics identical while
  * keeping replicas DISJOINT (every token gets a per-replica suffix),
  * so dup groups and retrieval matches never straddle replicas —
  * exactly 100 independent corpora, the honest linear-scale model.
  * Run: `sbt "Test/runMain graft.ScaleSoak100x"`; results table goes
  * to dev/PLANS.md.
  */
object ScaleSoak100x {

  final class StageMeter extends SparkListener {
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long)] // stageId, shufWrite, shufRead, input
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = s.stageInfo.taskMetrics
        rows += ((s.stageInfo.stageId, m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.totalBytesRead, m.inputMetrics.bytesRead))
      }
    def reset(): Unit = synchronized(rows.clear())
    def snapshot(): Seq[(Int, Long, Long, Long)] = synchronized(rows.toSeq)
  }

  private def mb(b: Long): String = f"${b / 1048576.0}%9.1f"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new StageMeter
    spark.sparkContext.addSparkListener(meter)
    val dir = "/root/testdata/sf0.1"

    // Inputs are PERSISTED (and counted) before the timer starts: the
    // soak measures the OPERATOR's scaling over a stored table — the
    // 100 TB deployment shape — not fixture replication. Replication
    // is a crossJoin with a replica range (a 100-way union self-joins
    // into a 200-leg plan Catalyst takes minutes to codegen — that
    // finding is part of why the stored-input shape is the right one).
    def soak(name: String, mkInput: Int => DataFrame,
        op: DataFrame => DataFrame,
        scales: Seq[Int] = Seq(1, 10, 100)): Unit = {
      println(s"== $name ==")
      println(f"${"scale"}%5s ${"in_rows"}%12s ${"out_rows"}%12s ${"sec"}%8s " +
        f"${"shufW MB"}%10s ${"shufR MB"}%10s ${"maxStageW MB"}%13s  top stages")
      val totals = scales.map { sc =>
        val in = mkInput(sc).persist()
        val nIn = in.count()
        meter.reset()
        val t0 = System.nanoTime()
        val n = op(in).count()
        val secs = (System.nanoTime() - t0) / 1e9
        val st = meter.snapshot()
        val w = st.map(_._2).sum; val r = st.map(_._3).sum
        val maxW = if (st.isEmpty) 0L else st.map(_._2).max
        println(f"$sc%5d $nIn%12d $n%12d $secs%8.2f ${mb(w)} ${mb(r)} " +
          f"${mb(maxW)}    " + st.sortBy(-_._2).take(5)
            .map(s => s"s${s._1}:${s._2 / 1048576}M").mkString(" "))
        in.unpersist()
        (sc, w)
      }
      // linearity: shuffle bytes per unit of scale must not grow
      val perUnit = totals.map { case (sc, w) => w.toDouble / sc }
      println(f"   shuffle-bytes/scale-unit: ${perUnit.map(v =>
        f"${v / 1048576}%.1fM").mkString(" -> ")}\n")
    }

    // (a) q36 chain verify: k disjoint ITBLL chains (id-offset)
    val chain1 = graft.model.Fixtures.chain(spark)
    def chainAt(k: Int) = chain1
      .crossJoin(spark.range(k).select(col("id").as("rep")))
      .select((col("id") + col("rep") * lit(100000L)).as("id"),
        (col("prev") + col("rep") * lit(100000L)).as("prev"))
    soak("q36 chain verify (broken links)", chainAt, { c =>
      val p = c.select(col("id").as("pid"))
      c.filter(col("prev").isNotNull)
        .join(p, col("prev") === col("pid"), "left_anti")
    })

    // replica-disjoint document corpus: suffix every token with the
    // replica id so shingle/token spaces never collide across replicas
    val docs1 = graft.model.Tables.load(spark, s"$dir/documents.parquet")
    def docsAt(k: Int) = docs1
      .crossJoin(spark.range(k).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * lit(10000000L)).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1x"), col("rep"))).as("text"),
        col("source"), col("lang"))

    // (b) MinHash+LSH near-dup: banded candidates, never all-pairs
    soak("minHashNearDups (banded LSH)", docsAt,
      d => graft.ext.Dedup.minHashNearDups(d))

    // (c) BM25 top-k retrieval: query slice scales with the corpus
    soak("bm25TopK (queries = ids%50)", docsAt,
      d => graft.ext.TextAnalysis.bm25TopK(d, col("doc_id") % 50 === 0, k = 5))

    spark.stop()
  }
}
