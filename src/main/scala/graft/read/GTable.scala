package graft.read

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.read.Resolve.TimeRange

/** Declarative Scan specification — the graft twin of the reference's
  * client read API (hbase-client/.../client/Scan.java:84, Get.java:65).
  * Every knob compiles to a `Column` predicate / plan fragment, so the
  * whole read plans as ONE Catalyst pipeline: range + projection
  * predicates push down to the parquet scan (≙ region pruning +
  * store-file pruning, SURVEY §4 O1/O2), version resolution is the §2.4
  * rewrite, and ordering is the total cell order (CellComparatorImpl).
  */
final case class GScan(
    startRow: Option[String] = None,      // inclusive (withStartRow, Scan.java:349)
    stopRow: Option[String] = None,       // exclusive (withStopRow, Scan.java:391)
    startInclusive: Boolean = true,
    stopInclusive: Boolean = false,
    rowPrefix: Option[String] = None,     // setRowPrefixFilter (Scan.java:442)
    reversed: Boolean = false,            // setReversed (Scan.java:692)
    raw: Boolean = false,                 // setRaw (Scan.java:848): skip resolve
    families: Seq[String] = Nil,          // addFamily (Scan.java:269)
    columns: Seq[(String, String)] = Nil, // addColumn (Scan.java:282)
    maxVersions: Int = 1,                 // readVersions
    timeRange: Option[TimeRange] = None,  // setTimeRange
    cfTimeRanges: Map[String, TimeRange] = Map.empty, // setColumnFamilyTimeRange (Scan.java:330)
    ttlCutoff: Option[Long] = None,       // CF TTL floor (ScanInfo.getTtl)
    minVersions: Int = 0,                 // CF MIN_VERSIONS (keep n beyond TTL)
    keepDeleted: Boolean = false,         // CF KEEP_DELETED_CELLS time-travel
    filter: Option[Column] = None,        // compiled graft.filter predicate
    limit: Option[Int] = None,            // setLimit (Scan.java:958) — global rows
    maxResultsPerCf: Option[Int] = None,  // setMaxResultsPerColumnFamily (Scan.java:514)
    rowOffsetPerCf: Int = 0               // setRowOffsetPerColumnFamily (Scan.java:523)
) {
  def withRange(start: String, stop: String): GScan =
    copy(startRow = Some(start), stopRow = Some(stop))
}

object GTable {

  /** Total cell order of the reference (CellComparatorImpl.java:46,57):
    * row, family, qualifier ASC; ts DESC (newest first). */
  def cellOrder(reversed: Boolean = false): Seq[Column] = {
    val row = if (reversed) col("row").desc else col("row").asc
    Seq(row, col("family").asc, col("qualifier").asc, col("ts").desc)
  }

  /** Plan a scan over a canonical CellSet DataFrame. Returns cells in
    * total cell order. All predicates are plain `Column`s → Catalyst
    * pushes them into the source scan before the (optional) resolve.
    */
  /** The scan's row-range predicates alone — shared with
    * [[scanFiltered]], which must range-prune BEFORE the filter tree
    * runs (stateful filters like PageFilter count rows INSIDE the scan
    * boundaries on the server). */
  private def rangePredsOf(s: GScan): Seq[Column] = Seq(
    s.startRow.map(v => if (s.startInclusive) col("row") >= v else col("row") > v),
    s.stopRow.map(v => if (s.stopInclusive) col("row") <= v else col("row") < v),
    s.rowPrefix.map(p => col("row").startsWith(p))
  ).flatten

  def scan(cells: DataFrame, s: GScan): DataFrame = scanImpl(cells, s, premasked = false)

  /** `premasked` = the caller already applied [[Resolve.maskedView]]
    * (scanFiltered does, to feed its filter tree the live view) — the
    * resolve then skips the redundant mask subplan. */
  private[graft] def scanImpl(cells: DataFrame, s: GScan,
      premasked: Boolean): DataFrame = {
    val rangePreds: Seq[Column] = rangePredsOf(s)
    // Projection UNIONS family and column selections (addFamily +
    // addColumn build one family→qualifiers map, Scan.java:269,282):
    // a selected family contributes ALL its qualifiers.
    val projParts: Seq[Column] =
      (if (s.families.nonEmpty) Seq(col("family").isin(s.families: _*)) else Nil) ++
        s.columns.map { case (f, q) => col("family") === f && col("qualifier") === q }
    // Non-raw qualifier projections must NOT drop family-scoped
    // tombstones (DeleteFamily/DeleteFamilyVersion carry qualifier ""):
    // the server reads the selected family's whole store, so its
    // markers are visible to delete tracking even when only one
    // qualifier is selected (ScanQueryMatcher columns-tracking runs
    // AFTER the delete tracker). Markers never surface in the resolve
    // output (only Puts do), so no post-filter is needed.
    val projFams = (s.families ++ s.columns.map(_._1)).distinct
    val keepFamilyMarkers: Column =
      col("type") =!= graft.model.CellType.Put &&
        col("qualifier") === "" && col("family").isin(projFams: _*)
    val projPreds: Seq[Column] =
      if (projParts.isEmpty) Nil
      else if (s.raw) Seq(projParts.reduce(_ || _))
      else Seq(projParts.reduce(_ || _) || keepFamilyMarkers)

    // Row-range + projection predicates apply to raw cells (they prune
    // the scan); resolve runs after, as on the server
    // (UserScanQueryMatcher.java:184,195). `raw` (Scan.setRaw) skips
    // tombstone masking AND the version gate — the storage-level view —
    // but the time range still prunes (TimeRange applies in the
    // StoreScanner below raw-ness). The filter runs BEFORE the version
    // gate (filterCell precedes version counting in the matcher), so a
    // rejected newest version does not consume a version slot.
    val pruned = (rangePreds ++ projPreds).foldLeft(cells)((df, p) => df.filter(p))
    val resolved =
      if (s.raw) {
        val ranged = Resolve.timeRangePred(s.timeRange, s.cfTimeRanges)
          .fold(pruned)(pruned.filter)
        s.filter.fold(ranged)(ranged.filter)
      } else
        Resolve.latest(pruned, s.maxVersions, s.timeRange,
          ttlCutoff = s.ttlCutoff, cellFilter = s.filter,
          cfTimeRanges = s.cfTimeRanges, minVersions = s.minVersions,
          keepDeleted = s.keepDeleted, premasked = premasked)
    // Intra-row per-CF pagination (Scan.setMaxResultsPerColumnFamily /
    // setRowOffsetPerColumnFamily, Scan.java:514,523): skip the first
    // `storeOffset` values of each (row, family) store and keep at most
    // `storeLimit` after it, counting VALUES (versions too) in cell
    // order — the server enforces this per HStore read
    // (StoreScanner's storeLimit/storeOffset), AFTER the version gate
    // and filters, which is exactly where this sits. The rank window
    // partitions on (row, family) — a prefix of the store layout's
    // row-hash partitioning, so over the materialized cell store it
    // plans without a fresh exchange (same reuse as the resolve rank).
    val paged =
      if (s.maxResultsPerCf.isEmpty && s.rowOffsetPerCf == 0) resolved
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("row"), col("family"))
          .orderBy(col("qualifier").asc, col("ts").desc)
        val lo = s.rowOffsetPerCf
        val hi = s.maxResultsPerCf
          .map(m => col("__cfpos") <= lo + m).getOrElse(lit(true))
        resolved.withColumn("__cfpos", row_number().over(w))
          .filter(col("__cfpos") > lo && hi)
          .drop("__cfpos")
      }
    val ordered = paged.orderBy(cellOrder(s.reversed): _*)
    // limit counts table ROWS (Scan.setLimit, Scan.java:958), not cells
    s.limit.fold(ordered) { n =>
      val keep = ordered.select("row").distinct()
        .orderBy(if (s.reversed) col("row").desc else col("row").asc).limit(n)
      ordered.join(broadcast(keep), Seq("row"), "left_semi")
        .orderBy(cellOrder(s.reversed): _*)
    }
  }

  /** Single-row spec: shared by the plain and observed get paths. */
  def pointSpec(rowKey: String, s: GScan = GScan()): GScan =
    s.copy(startRow = Some(rowKey), stopRow = Some(rowKey),
      startInclusive = true, stopInclusive = true)

  /** Point Get = single-row scan (the server does the same:
    * HRegion.get → Scan(Get), HRegion.java:8179, Scan.java:229). */
  def get(cells: DataFrame, rowKey: String, s: GScan = GScan()): DataFrame =
    scan(cells, pointSpec(rowKey, s))

  /** Multi-get: semi-join against the key list (broadcast on the small
    * key side), then the SAME resolve path as a single get —
    * Table.get(List[Get]) (Table.java:176) returns fully-resolved
    * Results, identical to get() per key; a raw subset would expose
    * tombstones and shadowed versions the single-get path hides. */
  def multiGet(cells: DataFrame, keys: DataFrame, s: GScan = GScan()): DataFrame =
    scan(cells.join(broadcast(keys.select(col(keys.columns.head).as("row"))),
                    Seq("row"), "left_semi"), s)

  /** Scan with a [[graft.filter.GFilter]] tree — the Scan.setFilter
    * path. The scan's reversed-ness propagates into the tree before
    * compilation (the server calls filter.setReversed(scan.isReversed())
    * on scanner open, HRegion — without this, a WHILE/InclusiveStop
    * filter inside a reversed scan computes the complement prefix).
    * Matcher ordering (ScanQueryMatcher.java:252 →
    * UserScanQueryMatcher.java:195): delete tracking runs BEFORE
    * filterCell, so on a non-raw scan the tree evaluates over the
    * delete-masked view — a tombstoned value can never satisfy an SCVF
    * — while version counting still runs AFTER the filter (rejected
    * cells must not consume version slots; the downstream [[scan]]
    * resolve re-masks a marker-free frame, which is a no-op). */
  def scanFiltered(cells: DataFrame, s: GScan,
      f: graft.filter.GFilter): DataFrame = {
    val tree = graft.filter.FilterCompiler.withReversed(f, s.reversed)
    // range-prune FIRST: the server's filters see only cells inside the
    // scan boundaries (a PageFilter counts rows within the range, not
    // the table), then the filtered set flows through the normal scan
    // (the residual range predicates there are no-ops)
    val ranged = rangePredsOf(s).foldLeft(cells)((df, p) => df.filter(p))
    // the matcher's ts checks also precede filterCell (on raw scans
    // too — TimeRange applies in the StoreScanner below raw-ness), so
    // the tree only sees in-window, unexpired cells — and on non-raw
    // scans only LIVE ones
    val visible =
      if (s.raw)
        // raw skips masking and TTL (as scan()'s raw branch does) but
        // not the time range
        Resolve.timeRangePred(s.timeRange, s.cfTimeRanges)
          .fold(ranged)(ranged.filter)
      else
        Resolve.preGatePreds(s.timeRange, s.cfTimeRanges, s.ttlCutoff,
            s.minVersions)
          .foldLeft(Resolve.maskedView(ranged, s.timeRange, s.cfTimeRanges,
            s.keepDeleted))((df, p) => df.filter(p))
    scanImpl(graft.filter.FilterCompiler(visible, tree), s,
      premasked = !s.raw)
  }

  /** S8 multi-table scan (MultiTableInputFormatBase.java:229: one job
    * over several tables' scans): union the cell sets, then ONE scan
    * plan — predicates still push into every branch's source scan. */
  def multiTableScan(tables: Seq[DataFrame], s: GScan): DataFrame = {
    require(tables.nonEmpty, "multiTableScan: need at least one table")
    scan(tables.reduce(_ unionByName _), s)
  }
}
