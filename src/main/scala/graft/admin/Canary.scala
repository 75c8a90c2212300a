package graft.admin

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Canary region-probe twin (hbase-server/.../tool/CanaryTool.java:
  * 488-640 RegionTask / readColumnFamily): per region and column
  * family, read ONE cell to prove the region serves —
  *
  *  - a region with a start key probes `Get(startKey)` +
  *    FirstKeyOnlyFilter (":538-546"); a MISS is still a successful
  *    read (the region answered — zero cells is a data fact, not a
  *    failure),
  *  - the FIRST region (empty start key) one-row-scans its own range
  *    bounded by the end key exclusive (":548-579" — never walks into
  *    the next region).
  *
  * The probe reads the table's RESOLVED view (rawScanEnabled=false is
  * the reference default — tombstones mask), so "first cell" is the
  * lowest-qualifier live cell of the probe row. Each leg is a filter +
  * a 1-row min-struct aggregate — map-side combine, no global sort; at
  * fleet scale one probe task per region, the canary's own shape.
  */
object Canary {

  /** Probe `regions` (name, startKey, endKey — "" = unbounded) against
    * the resolved `latest` view (columns row/family/qualifier/...).
    * One row per region: the probed cell coordinate and whether any
    * cell answered. */
  def probeRegions(latest: DataFrame,
      regions: Seq[(String, String, String)]): DataFrame = {
    val legs = regions.map { case (name, start, end) =>
      val scoped =
        if (start.nonEmpty) latest.filter(col("row") === start)
        else if (end.nonEmpty) latest.filter(col("row") < end)
        else latest
      scoped
        .agg(min(struct(col("row"), col("qualifier"))).as("first"))
        .select(lit(name).as("region"), lit(start).as("start_key"),
          col("first.row").as("probe_row"),
          col("first.qualifier").as("first_qualifier"),
          when(col("first").isNull, 0L).otherwise(1L).as("cells_read"),
          lit(true).as("success"))
    }
    legs.reduce(_ unionByName _).orderBy("region")
  }
}
