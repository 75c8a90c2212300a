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

  test("preCompact hooks wrap the compaction rewrite in registration order") {
    import graft.flow.Jobs
    val store = Fixtures.cellsEventsV(spark, sf0001)
    object DropProps2 extends WriteObserver {
      override def preCompact(s: DataFrame): DataFrame =
        s.filter(col("qualifier") =!= "props")
    }
    object Audit extends WriteObserver {
      override def preCompact(s: DataFrame): DataFrame =
        s.withColumn("compacted", lit(1))
    }
    // no observers: exactly the q62 rewrite (unchanged behavior)
    val plain = Jobs.majorCompact(store, maxVersions = 1)
    assert(Jobs.majorCompact(store, maxVersions = 1, observers = Nil)
      .exceptAll(plain).isEmpty)
    // hooks compose in order over the RESOLVED stream (same composition
    // contract as q64's read chain): filter first, then tag
    val out = Jobs.majorCompact(store, maxVersions = 1,
      observers = Seq(DropProps2, Audit))
    assert(out.columns.contains("compacted"))
    assert(out.filter(col("qualifier") === "props").count() === 0)
    assert(out.drop("compacted")
      .exceptAll(plain.filter(col("qualifier") =!= "props")).isEmpty)
  }
}
