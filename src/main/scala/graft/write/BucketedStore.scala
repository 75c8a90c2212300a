package graft.write

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The at-scale persistence of the canonical cell store: bucketed
  * parquet, hashed on the row key and sorted on the cell coordinate —
  * the durable twin of the in-session `CellStore` layout and of the
  * reference's region/HFile organization (regions partition the key
  * space; HFiles are coordinate-sorted). Readers of a bucketed table
  * get the partitioning from metadata, so cell-coordinate joins
  * (SyncTable/VerifyReplication diffs), per-row groupBys, and resolve
  * windows plan with NO exchange over the store — at 100 TB that is
  * the difference between a region-aligned merge and re-shuffling the
  * whole table per query.
  */
object BucketedStore {

  /** Write a cell set as a bucketed table. `buckets` plays the role of
    * the region count (SimpleTotalOrderPartitioner/HRegionPartitioner
    * pick splits the same way, SURVEY §2.7 D11). */
  def write(cells: DataFrame, table: String, path: String, buckets: Int): Unit =
    cells.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, "row")
      .sortBy("row", "family", "qualifier")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
