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

  test("high-cardinality stores carry the ROW bloom (HFile BloomType.ROW twin)") {
    // Parquet only MATERIALIZES the bloom when a row group's dictionary
    // encoding falls back to plain — a fully dictionary-encoded column
    // already gives exact membership filtering, so the bloom would be
    // redundant (and the writer drops it). The fixture's repeated row
    // keys dict-encode; the 100 TB case — many distinct row keys per
    // file — is where the bloom exists and matters, so that is what we
    // assert on.
    val tmp = java.nio.file.Files.createTempDirectory("bstore_hc").toString
    val wide = spark.range(200000).selectExpr(
      "lpad(cast(id as string), 16, '0') as row", "'d' as family",
      "'q' as qualifier", "1L as ts", "'Put' as type",
      "cast(id as string) as value")
    BucketedStore.write(wide, "bs_hc", s"$tmp/hc", buckets = 2,
      bloomNdv = 200000L)
    val files = new java.io.File(s"$tmp/hc").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(files.nonEmpty)
    val conf = spark.sparkContext.hadoopConfiguration
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val rowCols = reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == "row")
        assert(rowCols.nonEmpty)
        rowCols.foreach { c =>
          assert(c.getBloomFilterOffset >= 0,
            s"${f.getName}: row column has no bloom filter")
        }
      } finally reader.close()
    }
  }

  test("ROWCOL stores carry the row+qualifier bloom and answer point-column gets") {
    val tmp = java.nio.file.Files.createTempDirectory("bstore_rc").toString
    // many distinct (row, qualifier) pairs per file so the bloom
    // materializes (same dictionary-fallback condition as above)
    val wide = spark.range(100000).selectExpr(
      "lpad(cast(id as string), 16, '0') as row", "'d' as family",
      "concat('q', cast(id % 7 as string)) as qualifier", "1L as ts",
      "'Put' as type", "cast(id as string) as value")
    BucketedStore.write(wide, "bs_rc", s"$tmp/rc", buckets = 2,
      bloomNdv = 100000L, bloom = "ROWCOL")
    // canonical read hides the derived key; raw read probes through it
    assert(!BucketedStore.read(spark, "bs_rc").columns.contains("__rowcol"))
    val probe = BucketedStore.readRaw(spark, "bs_rc")
      .filter(BucketedStore.rowColPred("0000000000000042", "q0"))
    assert(probe.count() === 1)
    assert(BucketedStore.readRaw(spark, "bs_rc")
      .filter(BucketedStore.rowColPred("0000000000000042", "q1")).count() === 0)
    // the probe predicate reaches the parquet scan (bloom-eligible)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("__rowcol"),
      s"rowcol probe must push down:\n$plan")
    val files = new java.io.File(s"$tmp/rc").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(files.nonEmpty)
    val conf = spark.sparkContext.hadoopConfiguration
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val rcCols = reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == "__rowcol")
        assert(rcCols.nonEmpty)
        rcCols.foreach { c =>
          assert(c.getBloomFilterOffset >= 0,
            s"${f.getName}: __rowcol column has no bloom filter")
        }
      } finally reader.close()
    }
  }

  test("ROWPREFIX stores carry the fixed-prefix bloom and answer prefix scans") {
    val tmp = java.nio.file.Files.createTempDirectory("bstore_rp").toString
    // many distinct 16-byte prefixes per file — past the dictionary
    // page limit so the bloom materializes (same fallback condition
    // the ROW test documents); each prefix group holds 2 rows — the
    // S4 prefix-scan workload shape
    // coalesce(1): one writer task → one file per bucket → the
    // per-file prefix dictionary exceeds parquet's 1 MB dict page and
    // falls back to plain (a repeated-value column only falls back on
    // dict SIZE, unlike the unique-key ROW case above) — exactly the
    // 100 TB condition where a store file holds millions of prefixes
    val wide = spark.range(400000).selectExpr(
      "concat(lpad(cast(id div 2 as string), 16, '0'), '-', cast(id % 2 as string)) as row",
      "'d' as family", "'q' as qualifier", "1L as ts",
      "'Put' as type", "cast(id as string) as value").coalesce(1)
    BucketedStore.write(wide, "bs_rp", s"$tmp/rp", buckets = 2,
      bloomNdv = 200000L, bloom = "ROWPREFIX:16")
    assert(!BucketedStore.read(spark, "bs_rp").columns.contains("__rowprefix"))
    // present prefix: the whole group comes back
    val probe = BucketedStore.readRaw(spark, "bs_rp")
      .filter(BucketedStore.rowPrefixPred("0000000000000042", n = 16))
    assert(probe.count() === 2)
    // absent prefix inside the covering row range: zero rows
    assert(BucketedStore.readRaw(spark, "bs_rp")
      .filter(BucketedStore.rowPrefixPred("0000000000299999", n = 16)).count() === 0)
    // the prefix equality reaches the parquet scan (bloom-eligible)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("__rowprefix"),
      s"rowprefix probe must push down:\n$plan")
    // length-mismatched probe: the bloom is unusable (reference rule:
    // RowPrefixFixedLengthBloomContext passes short keys through), so
    // the predicate must fall back to startsWith alone and still
    // return every matching row — not silently zero via the derived
    // column equality. A LONGER probe (17 > n=16) matches exactly the
    // one full row key it names.
    assert(BucketedStore.readRaw(spark, "bs_rp")
      .filter(BucketedStore.rowPrefixPred("000000000000004", n = 16))
      .count() === 20) // 15-char prefix covers ids 80..99 -> 20 rows
    assert(BucketedStore.readRaw(spark, "bs_rp")
      .filter(BucketedStore.rowPrefixPred("0000000000000042-", n = 16))
      .count() === 2)
    val files = new java.io.File(s"$tmp/rp").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(files.nonEmpty)
    val conf = spark.sparkContext.hadoopConfiguration
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val rpCols = reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == "__rowprefix")
        assert(rpCols.nonEmpty)
        rpCols.foreach { c =>
          assert(c.getBloomFilterOffset >= 0,
            s"${f.getName}: __rowprefix column has no bloom filter")
        }
      } finally reader.close()
    }
  }
}
