package graft

import org.apache.spark.sql.functions._

import graft.model.Fixtures
import graft.read.{GScan, GTable}

class ScanSpec extends SparkSpec {

  lazy val co = Fixtures.cellsOrders(spark, sf0001).cache()

  test("get returns exactly one row's cells") {
    val r = GTable.get(co, "0000000007", GScan(raw = true)).collect()
    assert(r.length === 5)
    assert(r.forall(_.getAs[String]("row") == "0000000007"))
  }

  test("range scan honors [start, stop) and total order") {
    val r = GTable
      .scan(co, GScan(raw = true).withRange("0000000100", "0000000110"))
      .select("row").distinct().collect().map(_.getString(0)).sorted
    assert(r.head === "0000000100" && r.last === "0000000109" && r.length === 10)
  }

  test("reversed scan is descending by row") {
    val rows = GTable
      .scan(co, GScan(raw = true, reversed = true).withRange("0000000100", "0000000105"))
      .select("row").collect().map(_.getString(0))
    assert(rows === rows.sorted.reverse)
  }

  test("projection keeps only requested column") {
    val r = GTable.scan(co, GScan(raw = true, columns = Seq("d" -> "o_totalprice")))
    assert(r.select("qualifier").distinct().collect().map(_.getString(0)).toSeq === Seq("o_totalprice"))
  }

  test("multiGet semi-joins the key list") {
    import spark.implicits._
    val keys = Seq("0000000001", "0000000002", "9999999999").toDF("k")
    val r = GTable.multiGet(co, keys).select("row").distinct().collect().map(_.getString(0)).toSet
    assert(r === Set("0000000001", "0000000002"))
  }

  test("cellsEventsV fixture has puts and all three tombstone kinds") {
    val types = Fixtures.cellsEventsV(spark, sf0001)
      .select("type").distinct().collect().map(_.getString(0)).toSet
    assert(types === Set("Put", "Delete", "DeleteColumn", "DeleteFamily"))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
