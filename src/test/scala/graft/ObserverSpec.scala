package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Fixtures
import graft.read.{GScan, ObservedTable, ReadObserver, WriteObserver}

/** RegionObserver-analogue hook chains: spec rewrites + plan transforms
  * compose in registration order, and a range-narrowing pre-hook still
  * reaches the source scan (it is a plain plan rewrite).
  */
class ObserverSpec extends SparkSpec {

  private lazy val cells = Fixtures.cellsOrders(spark, sf0001)

  object NarrowRange extends ReadObserver {
    override def preScannerOpen(s: GScan): GScan =
      s.copy(startRow = Some("0000000100"), stopRow = Some("0000000200"))
  }
  object TagScan extends ReadObserver {
    override def postScannerNext(df: DataFrame): DataFrame =
      df.withColumn("audit", lit("scanned"))
  }
  object DropProps extends WriteObserver {
    override def preBatchMutate(b: DataFrame): DataFrame =
      b.filter(col("qualifier") =!= "props")
  }
  object CountTag extends WriteObserver {
    override def postBatchMutate(cells: DataFrame): DataFrame =
      cells.withColumn("post", lit(1))
  }

  test("read observers: pre rewrites the spec, post transforms the plan") {
    val out = ObservedTable.scan(cells, GScan(), Seq(NarrowRange, TagScan))
    val plain = graft.read.GTable.scan(cells,
      GScan(startRow = Some("0000000100"), stopRow = Some("0000000200")))
    assert(out.columns.contains("audit"))
    assert(out.drop("audit").exceptAll(plain).isEmpty)
    assert(out.count() === plain.count())
  }

  test("write observers: preBatchMutate filters, postBatchMutate transforms") {
    val muts = Fixtures.cellsEventsV(spark, sf0001).limit(200)
    val out = ObservedTable.applyMutations(cells, muts, Seq(DropProps, CountTag))
    assert(out.columns.contains("post"))
    assert(out.filter(col("qualifier") === "props").count() ===
      cells.filter(col("qualifier") === "props").count())
  }

  test("flush hook applies store-maintenance transforms in order") {
    object DropOld extends WriteObserver {
      override def preFlush(store: DataFrame): DataFrame =
        store.filter(col("ts") >= 1L)
    }
    assert(ObservedTable.flush(cells, Seq(DropOld)).count() === cells.count())
  }
}
