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
    * pick splits the same way, SURVEY §2.7 D11).
    *
    * Each file also carries a parquet bloom filter on `row` — the twin
    * of the reference's per-HFile ROW bloom
    * (ColumnFamilyDescriptor BLOOMFILTER, BloomType.ROW;
    * StoreFileReader.passesBloomFilter): a point Get probes the bloom
    * before touching data pages, so at 100 TB a multi-get over a
    * bucketed store reads the one bucket the hash names and then skips
    * every row-group whose bloom rejects the key. Sorting already gives
    * min/max pruning; the bloom additionally rejects ABSENT keys inside
    * a covering range (the exact case HBase blooms exist for).
    * `bloomNdv` sizes the filter (expected distinct rows per file).
    * Parquet materializes the bloom only where it adds power: a row
    * group whose `row` column stays fully dictionary-encoded (small
    * files, few distinct keys) already exposes exact membership via
    * the dictionary, and the writer drops the redundant bloom there —
    * at real store cardinalities the dictionary falls back to plain
    * and every file carries the filter (BucketedStoreSpec). */
  def write(cells: DataFrame, table: String, path: String, buckets: Int,
      bloomNdv: Long = 1000000L): Unit =
    cells.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .option("parquet.bloom.filter.enabled#row", "true")
      .option("parquet.bloom.filter.expected.ndv#row", bloomNdv.toString)
      .bucketBy(buckets, "row")
      .sortBy("row", "family", "qualifier")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
