package graft

import org.apache.spark.sql.functions._

import graft.model.Fixtures
import graft.write.BucketedStore

/** Bucketed cell store: the persisted region layout. The key claim is
  * plan-level — a self-diff join of two bucketed tables must not
  * exchange either side (bucket metadata provides the clustering).
  */
class BucketedStoreSpec extends SparkSpec {

  test("bucketed store round-trips and its joins plan without exchanges") {
    val tmp = java.nio.file.Files.createTempDirectory("bstore").toString
    val cells = Fixtures.cellsOrders(spark, sf0001)
    BucketedStore.write(cells, "bs_a", s"$tmp/a", buckets = 4)
    BucketedStore.write(cells.filter(col("qualifier") =!= "o_custkey"),
      "bs_b", s"$tmp/b", buckets = 4)

    val a = BucketedStore.read(spark, "bs_a")
    val b = BucketedStore.read(spark, "bs_b")
    assert(a.count() === cells.count())

    val joined = a.join(b, Seq("row", "family", "qualifier"), "left")
    joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not re-shuffle:\n$plan")

    // diff shape: full-outer classification, also exchange-free
    val diff = graft.flow.Jobs.syncDiffCounts(a, b)
    val matched = diff.filter(col("class") === "src_only").head().getLong(1)
    assert(matched === cells.filter(col("qualifier") === "o_custkey").count())
  }
}
