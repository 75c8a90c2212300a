package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.model.Fixtures
import graft.stream.WalStream

/** Q34–Q35: the streaming surface (SURVEY §2.8). Q34 runs a REAL
  * Structured Streaming query (AvailableNow trigger, memory sink) whose
  * result must equal the batch/DuckDB oracle — the batch-equivalence
  * guarantee of the Dataflow model. Q35 is the batch (gaps-and-islands)
  * realization of session windows; the streaming `session_window` twin
  * is exercised in StreamSpec.
  */
object StreamQueries {

  private val sinkId = new AtomicInteger(0)

  val defs: Seq[QDef] = Seq(
    QDef(
      "q34_stream_window",
      (s, dir) => {
        val stream = WalStream.sourceNs(s, s"$dir/events.parquet", Fixtures.eventsSchema)
        val agg    = WalStream.tumblingCounts(stream, "1 hour")
        val out    = WalStream.runAvailableNow(agg, s"q34_sink_${sinkId.incrementAndGet()}")
        out.select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
            col("event_type"),
            col("n"),
            round(col("sum_value"), 4).as("sum_value"))
          .orderBy("w_start", "event_type")
      },
      Some("""SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
             |       event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),
    QDef(
      "q35_session_window",
      (s, dir) => {
        // gaps-and-islands on µs-truncated event time (exactly the
        // resolution DuckDB sees, so boundary gaps agree)
        val gapUs = 30L * 60 * 1000 * 1000
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
        Fixtures.events(s, dir)
          .withColumn("tus", graft.model.Cellify.nsToUs(col("ts")))
          .withColumn("prev", lag(col("tus"), 1).over(w))
          .withColumn("new_session",
            when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1).otherwise(0))
          .groupBy("user_id")
          .agg(sum(col("new_session")).as("n_sessions"))
          .orderBy("user_id")
      },
      // CAST: DuckDB's integer SUM yields HUGEINT (decimal128) — the
      // driver's value hash then sees Decimal vs Spark's int64.
      Some("""SELECT user_id, CAST(SUM(ns) AS BIGINT) AS n_sessions FROM (
             |  SELECT user_id,
             |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
             |              THEN 1 ELSE 0 END AS ns
             |  FROM events
             |) GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),
    QDef(
      "q60_stream_stream_join",
      // REAL stream-stream interval join (two watermarked unbounded
      // inputs, state bounded by watermark + interval), run to
      // completion with AvailableNow; batch oracle = the same interval
      // join in SQL on µs-truncated event time.
      (s, dir) => {
        val stream = WalStream.sourceNs(s, s"$dir/events.parquet", Fixtures.eventsSchema)
        val joined = WalStream.clickAttribution(stream)
        // 4 state partitions: a stream-stream join keeps FOUR state
        // stores per partition, and the bounded run's store lifecycle
        // dwarfs its 46-row match volume (dev/PLANS.md q60 row) — a
        // perpetual stream sizes this to throughput at stream start
        WalStream.runAvailableNow(joined, s"q60_sink_${sinkId.incrementAndGet()}",
            mode = "append", statePartitions = 4)
          .orderBy("user_id", "click_id", "purchase_id")
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             |       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
             |FROM events c JOIN events p
             |  ON p.user_id = c.user_id
             | AND c.event_type = 'click' AND p.event_type = 'purchase'
             | AND epoch_us(p.ts) >= epoch_us(c.ts)
             | AND epoch_us(p.ts) <= epoch_us(c.ts) + 600000000
             |ORDER BY c.user_id, click_id, purchase_id""".stripMargin)
    )
  )
}
