package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.QDef
import graft.agg.AggregationClient
import graft.flow.Jobs
import graft.model.Fixtures
import graft.oracle.Cte

/** Q23–Q30: the coprocessor aggregation surface (A1–A8) and the
  * counting/diff dataflow jobs (D1/D2/D6/D8) — SURVEY §2.6, §2.7.
  *
  * Money sums go through DECIMAL(18,2) so Spark and DuckDB agree
  * exactly (double summation is order-dependent); the final value is
  * cast back to DOUBLE, which is deterministic for both engines.
  */
object AggQueries {

  private def lineitem(s: SparkSession, dir: String) =
    Fixtures.lineitem(s, dir)
  private def orders(s: SparkSession, dir: String) =
    Fixtures.orders(s, dir)

  private val sumPriceExact =
    sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")

  val defs: Seq[QDef] = Seq(
    QDef(
      "q23_min_max_sum",
      (s, dir) =>
        lineitem(s, dir)
          .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .agg(
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price")),
      Some("""SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin)
    ),
    QDef(
      "q24_row_count",
      (s, dir) =>
        AggregationClient.rowCount(Fixtures.cellsOrders(s, dir),
          Some(col("row") >= "0000000500")),
      Some(Cte.withCtes(Cte.cellsOrders)(
        "SELECT COUNT(DISTINCT row) AS rowcount FROM cells_orders WHERE row >= '0000000500'"))
    ),
    QDef(
      "q25_avg_std",
      (s, dir) =>
        orders(s, dir).agg(
          round(avg(col("o_totalprice")), 4).as("avg_price"),
          round(stddev_pop(col("o_totalprice")), 4).as("std_price")),
      Some("""SELECT ROUND(AVG(o_totalprice), 4) AS avg_price,
             |       ROUND(STDDEV_POP(o_totalprice), 4) AS std_price FROM orders""".stripMargin)
    ),
    QDef(
      "q26_median",
      (s, dir) =>
        AggregationClient.median(orders(s, dir), col("o_totalprice"))
          .select(round(col("median"), 4).as("median_price")),
      Some("SELECT ROUND(MEDIAN(o_totalprice), 4) AS median_price FROM orders")
    ),
    QDef(
      "q27_grouped_agg",
      (s, dir) =>
        AggregationClient.grouped(orders(s, dir),
          keys = Seq(col("o_orderstatus")),
          aggs = Seq(count(lit(1)).as("n"), sumPriceExact.as("sum_price")))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),
    QDef(
      "q28_cell_counter",
      (s, dir) =>
        Jobs.cellCounter(Fixtures.cellsEventsV(s, dir))
          .orderBy("family", "qualifier"),
      Some(Cte.withCtes(Cte.cellsEventsV)(
        """SELECT family, qualifier, COUNT(*) AS cells, COUNT(DISTINCT ts) AS versions,
          |       CAST(COALESCE(SUM(length(value)), 0) AS BIGINT) AS value_bytes
          |FROM cells_events_v GROUP BY family, qualifier ORDER BY family, qualifier""".stripMargin))
    ),
    QDef(
      "q29_sync_diff",
      (s, dir) =>
        Jobs.syncDiffCounts(Fixtures.cellsOrders(s, dir),
                            Fixtures.cellsOrdersMut(s, dir)),
      Some(Cte.withCtes(Cte.cellsOrders, Cte.cellsOrdersMut)(
        """SELECT CASE WHEN s.row IS NULL THEN 'dst_only'
          |            WHEN d.row IS NULL THEN 'src_only'
          |            WHEN s.value IS NOT DISTINCT FROM d.value THEN 'matched'
          |            ELSE 'mismatch' END AS class, COUNT(*) AS n
          |FROM cells_orders s FULL OUTER JOIN cells_orders_mut d
          |  ON s.row = d.row AND s.family = d.family AND s.qualifier = d.qualifier AND s.ts = d.ts AND s.type = d.type
          |GROUP BY 1 ORDER BY 1""".stripMargin))
    ),
    QDef(
      // A8 ColumnInterpreter (client/coprocessor/ColumnInterpreter.java,
      // BigDecimalColumnInterpreter): the custom-aggregate extension
      // point as a declared query — the user-supplied decimal semiring
      // lifted into a typed Spark Aggregator (partial/final merge run by
      // Tungsten), summing the o_totalprice cell values exactly.
      "q78_interpreter_sum",
      (s, dir) => {
        import s.implicits._
        import graft.agg.GColumnInterpreter
        val vals = Fixtures.cellsOrders(s, dir)
          .filter(col("qualifier") === "o_totalprice")
          .select(col("value")).as[String]
        val agg = GColumnInterpreter.sumAggregator(GColumnInterpreter.Decimals)
        vals.select(agg.toColumn).toDF("s")
          .select(col("s").cast("double").as("sum_price"))
      },
      Some(Cte.withCtes(Cte.cellsOrders)(
        """SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          |FROM cells_orders WHERE qualifier = 'o_totalprice'""".stripMargin))
    ),
    QDef(
      "q30_verify_replication",
      (s, dir) =>
        Jobs.verifyReplication(Fixtures.cellsOrders(s, dir),
                               Fixtures.cellsOrdersMut(s, dir))
          .withColumnRenamed("rows", "n_rows"),
      Some(Cte.withCtes(Cte.cellsOrders, Cte.cellsOrdersMut)(
        """SELECT row_class, COUNT(*) AS n_rows FROM (
          |  SELECT row,
          |         CASE WHEN ok = 0 AND srconly > 0 AND dstonly = 0 AND bad = 0 THEN 'only_in_source'
          |              WHEN ok = 0 AND dstonly > 0 AND srconly = 0 AND bad = 0 THEN 'only_in_target'
          |              WHEN bad > 0 OR srconly > 0 OR dstonly > 0 THEN 'bad'
          |              ELSE 'good' END AS row_class
          |  FROM (
          |    SELECT COALESCE(s.row, d.row) AS row,
          |           SUM(CASE WHEN s.row IS NULL THEN 1 ELSE 0 END) AS dstonly,
          |           SUM(CASE WHEN d.row IS NULL THEN 1 ELSE 0 END) AS srconly,
          |           SUM(CASE WHEN s.row IS NOT NULL AND d.row IS NOT NULL AND s.value IS DISTINCT FROM d.value THEN 1 ELSE 0 END) AS bad,
          |           SUM(CASE WHEN s.row IS NOT NULL AND d.row IS NOT NULL AND s.value IS NOT DISTINCT FROM d.value THEN 1 ELSE 0 END) AS ok
          |    FROM cells_orders s FULL OUTER JOIN cells_orders_mut d
          |      ON s.row = d.row AND s.family = d.family AND s.qualifier = d.qualifier AND s.ts = d.ts AND s.type = d.type
          |    GROUP BY 1
          |  )
          |) GROUP BY 1 ORDER BY 1""".stripMargin))
    ),
    QDef(
      // D8 VerifyReplication SNAPSHOT mode (VerifyReplication.java
      // sourceSnapshotName/peerSnapshotName): both sides pin to
      // manifest-enumerated snapshots (SnapshotShip's full
      // .hbase-snapshot/archive layout), so the sweep classifies one
      // consistent point in time per cluster no matter what lands in
      // the live tables meanwhile (StreamSpec pins the live≠snapshot
      // divergence case). Same classification oracle as q30 — the
      // snapshots capture exactly the two fixtures.
      "q105_verify_repl_snapshot",
      (s, dir) => {
        val out = graft.Queries.scratchDir("q105_vrs")
        // the two cluster snapshots are independent export jobs —
        // SUBMIT concurrently (r17-opt, the c08 concurrent-legs shape)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        Seq(
          Future(graft.flow.SnapshotShip.exportSnapshot(
            Fixtures.cellsOrders(s, dir), 8, s"$out/src", "snapS",
            "q105src")),
          Future(graft.flow.SnapshotShip.exportSnapshot(
            Fixtures.cellsOrdersMut(s, dir), 8, s"$out/peer", "snapP",
            "q105peer"))
        ).foreach(Await.result(_, scala.concurrent.duration.Duration.Inf))
        Jobs.verifyReplicationSnapshots(s,
            s"$out/src", "snapS", s"$out/peer", "snapP")
          .withColumnRenamed("rows", "n_rows")
      },
      Some(Cte.withCtes(Cte.cellsOrders, Cte.cellsOrdersMut)(
        """SELECT row_class, COUNT(*) AS n_rows FROM (
          |  SELECT row,
          |         CASE WHEN ok = 0 AND srconly > 0 AND dstonly = 0 AND bad = 0 THEN 'only_in_source'
          |              WHEN ok = 0 AND dstonly > 0 AND srconly = 0 AND bad = 0 THEN 'only_in_target'
          |              WHEN bad > 0 OR srconly > 0 OR dstonly > 0 THEN 'bad'
          |              ELSE 'good' END AS row_class
          |  FROM (
          |    SELECT COALESCE(s.row, d.row) AS row,
          |           SUM(CASE WHEN s.row IS NULL THEN 1 ELSE 0 END) AS dstonly,
          |           SUM(CASE WHEN d.row IS NULL THEN 1 ELSE 0 END) AS srconly,
          |           SUM(CASE WHEN s.row IS NOT NULL AND d.row IS NOT NULL AND s.value IS DISTINCT FROM d.value THEN 1 ELSE 0 END) AS bad,
          |           SUM(CASE WHEN s.row IS NOT NULL AND d.row IS NOT NULL AND s.value IS NOT DISTINCT FROM d.value THEN 1 ELSE 0 END) AS ok
          |    FROM cells_orders s FULL OUTER JOIN cells_orders_mut d
          |      ON s.row = d.row AND s.family = d.family AND s.qualifier = d.qualifier AND s.ts = d.ts AND s.type = d.type
          |    GROUP BY 1
          |  )
          |) GROUP BY 1 ORDER BY 1""".stripMargin))
    ),
    QDef(
      // A7 weighted form: the weight-qualified median protocol
      // (AggregationClient.java:778 two-qualifier mode) on value order
      // — smallest price with 2·cumWeight ≥ totalWeight, quantity as
      // the weight (AggregationClient.weightedMedian scaladoc; the
      // two-phase locate is the reference's per-region summary map).
      "q83_weighted_median",
      (s, dir) =>
        AggregationClient.weightedMedian(lineitem(s, dir),
          col("l_extendedprice"), col("l_quantity")),
      Some("""WITH g AS (
          |  SELECT l_extendedprice AS v,
          |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
          |  FROM lineitem
          |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
          |  GROUP BY 1),
          |t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM g),
          |c AS (SELECT v, SUM(w) OVER (ORDER BY v) AS cw FROM g)
          |SELECT MIN(v) AS weighted_median FROM c CROSS JOIN t
          |WHERE cw * 2 >= tw""".stripMargin)
    )
  )
}
