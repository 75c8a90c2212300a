package graft

import org.apache.spark.sql.functions._

import graft.agg.{AggregationClient, GColumnInterpreter}
import graft.flow.Jobs
import graft.model.Fixtures

class AggFlowSpec extends SparkSpec {

  lazy val orders = Fixtures.orders(spark, sf0001).cache()

  test("aggregation client matches direct SQL") {
    val mx = AggregationClient.max(orders, col("o_totalprice")).head().getDouble(0)
    val direct = orders.agg(max("o_totalprice")).head().getDouble(0)
    assert(mx === direct)
    val cnt = AggregationClient.rowCount(Fixtures.cellsOrders(spark, sf0001))
      .head().getLong(0)
    assert(cnt === orders.count())
  }

  test("exact median equals manual computation") {
    val med = AggregationClient.median(orders, col("o_totalprice")).head().getDouble(0)
    val sorted = orders.select("o_totalprice").collect().map(_.getDouble(0)).sorted
    val n = sorted.length
    val expected = if (n % 2 == 1) sorted(n / 2) else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    assert(math.abs(med - expected) < 1e-9)
  }

  test("weighted median equals the driver-side crossing rule, any bucket count") {
    // ground truth: expand each value `weight` times, take the smallest
    // value whose cumulative (value-ordered) weight covers half
    val rows = orders.select(col("o_totalprice"), (col("o_orderkey") % 7 + 1))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val byV = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val total = byV.map(_._2).sum
    val expected = byV.scanLeft((0.0, 0L)) { case ((_, acc), (v, w)) =>
      (v, acc + w)
    }.drop(1).find { case (_, cw) => cw * 2 >= total }.get._1
    // the answer is bucket-count-invariant (bounds only steer balance)
    for (b <- Seq(1, 4, 32)) {
      val got = AggregationClient.weightedMedian(orders, col("o_totalprice"),
        col("o_orderkey") % 7 + 1, buckets = b).head().getDouble(0)
      assert(got === expected, s"buckets=$b")
    }
    // uniform weights degenerate to the lower median of the row multiset
    val uni = AggregationClient.weightedMedian(orders, col("o_totalprice"),
      lit(1L)).head().getDouble(0)
    val uniByV = rows.groupBy(_._1).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val uniExpected = uniByV.scanLeft((0.0, 0L)) { case ((_, acc), (v, w)) =>
      (v, acc + w)
    }.drop(1).find { case (_, cw) => cw * 2 >= rows.length }.get._1
    assert(uni === uniExpected)
  }

  test("approx median tracks exact within the sketch's rank error") {
    val exact = AggregationClient.median(orders, col("o_totalprice")).head().getDouble(0)
    val approx = AggregationClient.medianApprox(orders, col("o_totalprice"))
      .head().getDouble(0)
    // accuracy=10000 → rank error ≤ n/10000; the fixture has ~1.5k
    // orders, so the sketch is exact up to element granularity. Bound
    // by the value span of the ±1-rank neighborhood instead of eps=0.
    val sorted = orders.select("o_totalprice").collect().map(_.getDouble(0)).sorted
    val mid = sorted.length / 2
    val lo = sorted(math.max(0, mid - 2))
    val hi = sorted(math.min(sorted.length - 1, mid + 2))
    assert(approx >= lo && approx <= hi, s"approx=$approx not in [$lo,$hi]")
    assert(math.abs(approx - exact) <= hi - lo)
    // p25 ≤ p75 sanity on the generic surface
    val p25 = AggregationClient.percentileApprox(orders, col("o_totalprice"), 0.25)
      .head().getDouble(0)
    val p75 = AggregationClient.percentileApprox(orders, col("o_totalprice"), 0.75)
      .head().getDouble(0)
    assert(p25 <= exact && exact <= p75)
  }

  test("column interpreter aggregator sums interpreted values") {
    import spark.implicits._
    val vals = Seq("1", "2", "39").toDF("value")
    val agg = GColumnInterpreter.sumAggregator(GColumnInterpreter.Longs)
    val total = vals.as[String].select(agg.toColumn).head()
    assert(total === 42L)
  }

  test("syncDiff classifies all four cases") {
    import spark.implicits._
    val src = Seq(
      ("r1", "d", "q", 1L, "Put", "a"),   // matched
      ("r2", "d", "q", 1L, "Put", "b"),   // mismatch
      ("r3", "d", "q", 1L, "Put", "c")    // src_only
    ).toDF("row", "family", "qualifier", "ts", "type", "value")
    val dst = Seq(
      ("r1", "d", "q", 1L, "Put", "a"),
      ("r2", "d", "q", 1L, "Put", "X"),
      ("r4", "d", "q", 1L, "Put", "d")    // dst_only
    ).toDF("row", "family", "qualifier", "ts", "type", "value")
    val m = Jobs.syncDiffCounts(src, dst).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("matched" -> 1L, "mismatch" -> 1L, "src_only" -> 1L, "dst_only" -> 1L))
  }

  test("verifyReplication row classes on the mut fixture") {
    val m = Jobs.verifyReplication(
        Fixtures.cellsOrders(spark, sf0001),
        Fixtures.cellsOrdersMut(spark, sf0001))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every 19th row dropped -> only_in_source; every 11th perturbed -> bad
    // (keys divisible by both 11*19 are dropped); 500 added -> only_in_target
    assert(m("only_in_target") === 500L)
    assert(m("only_in_source") > 0 && m("bad") > 0 && m("good") > 0)
  }

  test("importTsv parses column spec") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("tsv").toString
    Files.writeString(Paths.get(s"$dir/t.tsv"), "r1\tv1\tv2\nr2\tv3\tv4\n")
    val cells = Jobs.importTsv(spark, s"$dir/t.tsv", Seq("HBASE_ROW_KEY", "d:a", "d:b"))
    assert(cells.count() === 4)
    assert(cells.filter(col("row") === "r2" && col("qualifier") === "b")
      .head().getAs[String]("value") === "v4")
  }

  test("bulkLoadLayout writes range-partitioned sorted parquet") {
    val out = java.nio.file.Files.createTempDirectory("bulk").toString + "/cells"
    Jobs.bulkLoadLayout(Fixtures.cellsOrders(spark, sf0001), 4, out)
    val back = spark.read.parquet(out)
    assert(back.count() === Fixtures.cellsOrders(spark, sf0001).count())
  }

  test("export -> import round-trips with filter and family rename (D3/D5)") {
    import graft.flow.Jobs
    val tmp = java.nio.file.Files.createTempDirectory("d3").toString
    val cells = graft.model.Fixtures.cellsOrders(spark, sf0001)
    val pred = col("qualifier") === "o_totalprice"
    Jobs.export(cells, Some(pred), s"$tmp/exp")
    val back = Jobs.importCells(spark, s"$tmp/exp",
      familyRename = Map("d" -> "d2"))
    assert(back.count() === cells.filter(pred).count())
    assert(back.filter(col("family") =!= "d2").count() === 0)
    // D5 copyTable: filtered copy, renamed family, re-read equals source rows
    Jobs.copyTable(cells, Some(col("row") < "0000000100"),
      Map("d" -> "x"), s"$tmp/copy")
    val copied = spark.read.parquet(s"$tmp/copy")
    assert(copied.count() === cells.filter(col("row") < "0000000100").count())
    assert(copied.select("family").distinct().collect().map(_.getString(0)).toSeq === Seq("x"))
  }
}
