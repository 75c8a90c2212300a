package graft.read

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.CellType

/** Read-time reconciliation of the multi-version cell set: tombstone
  * masking × version gate × time range × TTL — the Spark rewrite of the
  * reference's server-side querymatcher
  * (hbase-server/.../querymatcher/ScanQueryMatcher.java:252,
  * ScanDeleteTracker.java:46,70,102; tombstone kinds Cell.java:146-155).
  *
  * Semantics (matching ScanDeleteTracker):
  *   - Delete               masks the put with the exact same (row,family,qualifier,ts)
  *   - DeleteColumn         masks puts of (row,family,qualifier) with ts <= marker
  *   - DeleteFamily         masks puts of (row,family)          with ts <= marker
  *   - DeleteFamilyVersion  masks puts of (row,family)          with ts == marker
  * then the scan time range filters surviving cells, then the per-column
  * version gate keeps the newest `maxVersions` (timestamp DESC).
  *
  * Scale notes: tombstones are a tiny fraction of cells, so every mask
  * join builds a small (broadcastable) aggregate on the delete side;
  * Catalyst/AQE picks broadcast-hash for them. The only wide exchange is
  * the final rank window, which co-partitions with any downstream
  * per-(row,family,qualifier) operator.
  */
object Resolve {

  /** Time range [min, max) on cell ts; reference TimeRange semantics. */
  final case class TimeRange(min: Long, max: Long)

  /** The combined [min,max) time-range predicate: per-CF ranges
    * (Scan.setColumnFamilyTimeRange, Scan.java:330 / Query.java:236)
    * OVERRIDE the scan-global range for their family; other families
    * fall back to the global range (or pass, if none). */
  def timeRangePred(global: Option[TimeRange],
      perCf: Map[String, TimeRange]): Option[org.apache.spark.sql.Column] = {
    if (global.isEmpty && perCf.isEmpty) None
    else {
      def in(tr: TimeRange) = col("ts") >= tr.min && col("ts") < tr.max
      Some(perCf.foldLeft(global.map(in).getOrElse(lit(true))) {
        case (acc, (f, tr)) => when(col("family") === f, in(tr)).otherwise(acc)
      })
    }
  }

  /** Latest-view resolve. `cells` is a canonical CellSet DataFrame.
    *
    * @param maxVersions  keep newest n versions per (row,family,qualifier)
    * @param timeRange    optional [min,max) pre-version-gate ts filter
    * @param ttlCutoff    optional absolute ts floor (now - ttl); cells
    *                     strictly older are invisible (ScanInfo.getTtl)
    * @param cfTimeRanges per-family [min,max) overrides of `timeRange`
    *                     (Scan.setColumnFamilyTimeRange, Scan.java:330)
    * @param minVersions  keep the newest n versions per column even when
    *                     TTL-expired (ColumnFamilyDescriptorBuilder
    *                     MIN_VERSIONS, default 0 = TTL wins)
    * @param keepDeleted  KEEP_DELETED_CELLS=TRUE time-travel reads
    *                     (ColumnFamilyDescriptorBuilder.java:147 ff):
    *                     with a time range, tombstones at/after the
    *                     range max have not "happened yet" in the as-of
    *                     view, so they do not mask. (The mvcc-ordered
    *                     NEW_VERSION_BEHAVIOR tracker is out of scope —
    *                     graft has no mvcc dimension; documented
    *                     boundary.)
    */
  def latest(
      cells: DataFrame,
      maxVersions: Int = 1,
      timeRange: Option[TimeRange] = None,
      ttlCutoff: Option[Long] = None,
      cellFilter: Option[org.apache.spark.sql.Column] = None,
      cfTimeRanges: Map[String, TimeRange] = Map.empty,
      minVersions: Int = 0,
      keepDeleted: Boolean = false,
      premasked: Boolean = false,
      visScope: Option[String] = None
  ): DataFrame = {
    // premasked: the caller already ran maskedView (e.g. scanFiltered,
    // which must mask BEFORE its filter tree) — skip the redundant
    // 4-leg mask subplan over an already marker-free frame
    val masked =
      if (premasked) cells
      else maskedView(cells, timeRange, cfTimeRanges, keepDeleted, visScope)
    val ranged = (preGatePreds(timeRange, cfTimeRanges, ttlCutoff, minVersions)
      // filterCell runs BEFORE version counting in the matcher
      // (UserScanQueryMatcher.java:195) — rejected cells must not
      // consume version slots
      ++ cellFilter).foldLeft(masked)((df, p) => df.filter(p))
    val w = Window
      .partitionBy(col("row"), col("family"), col("qualifier"))
      .orderBy(col("ts").desc)
    // spill hedge: the version-gate window is the operator's one wide
    // exchange, and at a fixed spark.sql.shuffle.partitions its
    // per-partition share grows linearly with input (the r16 sf10 soak
    // measured per-cell cost rising 0.57→0.99 s/1M at 75M cells purely
    // from shuffle/sort spill on local[32]'s fixed memory). When the
    // INPUT's size estimate says partitions would exceed the scan
    // target size, pre-repartition on the window's own keys with a
    // size-derived count — the window then reuses that partitioning
    // (ClusteredDistribution is satisfied; still exactly one exchange,
    // just one sized to the data, the same rule the scan side applies
    // via files.maxPartitionBytes). Small inputs take the plan
    // unchanged (sizedShufflePartitions = None below the threshold).
    val pre = sizedShufflePartitions(cells) match {
      case Some(n) =>
        ranged.repartition(n, col("row"), col("family"), col("qualifier"))
      case None => ranged
    }
    val gated = pre
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxVersions)
    val retained = (ttlCutoff, minVersions) match {
      case (Some(cut), mv) if mv > 0 =>
        gated.filter(col("ts") >= cut || col("__rn") <= mv)
      case _ => gated
    }
    retained.drop("__rn")
  }

  /** Size-derived shuffle-partition count for the resolve exchange:
    * Catalyst's size estimate of the INPUT frame (file-backed scans and
    * materialized caches report real bytes) divided by the session's
    * files.maxPartitionBytes scan target. Returns None — plan
    * unchanged — when the estimate is at or under what the session's
    * default shuffle partitioning already handles, or when the
    * estimate is unusable (the no-stats default is effectively
    * infinite; join-inflated estimates hit the same guard). Capped at
    * 4096: past that the bottleneck is executor count, not partition
    * size. The estimate comes from the PRE-mask input, not the masked
    * plan, because join estimates multiply while the masked output is
    * bounded by the input. */
  private[graft] def sizedShufflePartitions(cells: DataFrame): Option[Int] = {
    val conf = cells.sparkSession.sessionState.conf
    val size = cells.queryExecution.optimizedPlan.stats.sizeInBytes
    // half the scan target: shuffled ROW data plus its sort buffer is
    // wider than the columnar/compressed source the estimate measures
    val target = BigInt(conf.filesMaxPartitionBytes) / 2
    if (size <= 0 || target <= 0 || size >= BigInt(Long.MaxValue) / 4) None
    else {
      // clamp in BigInt BEFORE toInt: a huge-but-plausible estimate
      // (~1e17 bytes clears the guard above) would otherwise overflow
      // Int and silently disable the hedge on exactly the inputs that
      // need it
      val n = ((size + target - 1) / target).min(4096).toInt
      if (n > conf.numShufflePartitions) Some(n) else None
    }
  }

  /** Per-cell TTL liveness (Mutation.setTTL → TagType.TTL_TAG_TYPE;
    * ScanQueryMatcher.isCellTTLExpired, ScanQueryMatcher.java:143): a
    * cell carrying a non-null `ttlCol` is dead once ts + ttl < now.
    * The matcher runs this in preCheck — BEFORE the delete tracker and
    * the version gate — so apply it as a PRE-mask filter on the cell
    * frame: expired cells neither mask (an expired marker is inert)
    * nor consume version slots. Per-cell TTL cannot EXTEND life beyond
    * the family TTL (ScanQueryMatcher.java:159) — the family
    * `ttlCutoff` still applies downstream as usual.
    */
  def cellTtlLive(now: Long, ttlCol: String = "ttl"): org.apache.spark.sql.Column =
    col(ttlCol).isNull || col("ts") + col(ttlCol) >= lit(now)

  /** NEW_VERSION_BEHAVIOR resolve (ColumnFamilyDescriptorBuilder
    * .java:197, NewVersionBehaviorTracker.java): mvcc-sensitive
    * masking over a SEQ-BEARING cell frame (`seqCol`, the per-cell
    * write order — the WAL sequence-id analogue). A delete marker only
    * masks cells written before it; deleted versions still consume
    * version slots inside their mvcc segment; duplicate-(ts,type) puts
    * mask. See [[graft.functions.NvbVisible]] for the tracker port.
    *
    * Dataflow: ONE shuffle onto the column coordinate (collect each
    * column's cells + each family's family-scope markers into arrays),
    * then the per-column tracker kernel runs map-side and the visible
    * versions explode back out. The family-marker join is row+family
    * keyed — a prefix of the column grouping, so it reuses the same
    * partitioning (and the bucketed store layout satisfies both).
    *
    * Returns the canonical columns (row, family, qualifier, ts, type,
    * value) plus `seqCol`, newest-first per column.
    */
  def latestNvb(
      cells: DataFrame,
      maxVersions: Int = 1,
      resultMaxVersions: Int = Int.MaxValue,
      ttlCutoff: Option[Long] = None,
      minVersions: Int = 0,
      seqCol: String = "seq"
  ): DataFrame = {
    import graft.functions.{NvbFunctions, NvbKernel}
    val tcode = CellType.all.map(t => (t, NvbKernel.typeCode(t)))
      .foldLeft(lit(-1)) { case (acc, (t, c)) =>
        when(col("type") === t, lit(c)).otherwise(acc)
      }
    val famScope = col("type").isin(CellType.DeleteFamily, CellType.DeleteFamilyVersion)
    val colCells = cells.filter(!famScope)
      .groupBy("row", "family", "qualifier")
      .agg(collect_list(struct(col("ts"), col(seqCol).as("seq"), tcode.as("tcode"),
        col("value"))).as("__cs"))
    val famCells = cells.filter(famScope)
      .groupBy("row", "family")
      .agg(collect_list(struct(col("ts"), col(seqCol).as("seq"), tcode.as("tcode")))
        .as("__fs"))
    colCells
      .join(famCells, Seq("row", "family"), "left")
      .select(col("row"), col("family"), col("qualifier"),
        explode(NvbFunctions.nvb_visible(col("__cs"), col("__fs"), maxVersions,
          resultMaxVersions, ttlCutoff.getOrElse(Long.MinValue), minVersions)).as("__v"))
      .select(col("row"), col("family"), col("qualifier"),
        col("__v.ts").as("ts"), lit(CellType.Put).as("type"),
        col("__v.value").as("value"), col("__v.seq").as(seqCol))
  }

  /** The matcher's pre-filter ts checks: scan/per-CF time range, and
    * TTL as a pre-gate cut unless MIN_VERSIONS needs expired cells to
    * keep ranking (they may still be retained after the gate). Shared
    * by [[latest]] and the filter-visibility view in GTable so the two
    * cannot drift. */
  def preGatePreds(timeRange: Option[TimeRange],
      cfTimeRanges: Map[String, TimeRange], ttlCutoff: Option[Long],
      minVersions: Int): Seq[org.apache.spark.sql.Column] = Seq(
    timeRangePred(timeRange, cfTimeRanges),
    if (minVersions == 0) ttlCutoff.map(cut => col("ts") >= cut) else None
  ).flatten

  /** The delete-masked (live) view under the scan's visibility knobs —
    * the cell set every LATER stage of the matcher sees (delete
    * tracking runs first, ScanQueryMatcher.java:252). KEEP_DELETED_
    * CELLS ceiling is PER FAMILY: a family's as-of point is its own
    * range max (override) or the scan-global max; families with no
    * range at all keep full masking. */
  def maskedView(cells: DataFrame, timeRange: Option[TimeRange],
      cfTimeRanges: Map[String, TimeRange], keepDeleted: Boolean,
      visScope: Option[String] = None): DataFrame =
    if (keepDeleted && (timeRange.isDefined || cfTimeRanges.nonEmpty)) {
      val base = timeRange.map(tr => lit(tr.max)).getOrElse(lit(Long.MaxValue))
      val ceil = cfTimeRanges.foldLeft(base) {
        case (acc, (f, tr)) => when(col("family") === f, lit(tr.max)).otherwise(acc)
      }
      maskTombstones(cells, tombVisible = Some(col("ts") < ceil),
        visScope = visScope)
    } else maskTombstones(cells, visScope = visScope)

  /** Apply the 4 tombstone kinds to the Put cells; returns live puts.
    * `raw` scans (Scan.setRaw, Scan.java:848) skip this entirely.
    *
    * @param tombVisible KEEP_DELETED_CELLS time-travel visibility
    *        predicate on the tombstone cells: only markers satisfying
    *        it mask (a marker at/after the as-of point has not
    *        happened yet). A `Column` so per-family ceilings compose.
    * @param visScope visibility-scoped delete tracking
    *        (VisibilityScanDeleteTracker.java:43,181 on labeled
    *        stores): the named column carries each cell's visibility
    *        expression, and a delete marker masks ONLY puts whose
    *        expression delete-matches its own — exact equality of the
    *        sorted-DNF canonical forms ([[graft.functions.VisKernel
    *        .canonical]]; DefaultVisibilityLabelServiceImpl
    *        .matchVisibility:560-604 compares sorted tag lists), with
    *        the null/empty expression matching only untagged cells
    *        (EMPTY_TAG markers, tracker :49-50). Realized as one extra
    *        derived join key on every mask leg, so the masks stay
    *        broadcastable aggregates — per-(expression) tracking like
    *        the tracker's per-type tag lists, with no extra exchange.
    */
  def maskTombstones(cells: DataFrame,
      tombVisible: Option[org.apache.spark.sql.Column] = None,
      visScope: Option[String] = None): DataFrame = {
    val src = visScope.fold(cells)(v => cells.withColumn("__vc",
      graft.functions.VisibilityFunctions.vis_canonical(col(v))))
    val vc = if (visScope.isDefined) Seq("__vc") else Nil
    val puts = src.filter(col("type") === CellType.Put)
    val tombSrc = tombVisible.fold(src)(src.filter)

    val dFam = tombSrc
      .filter(col("type") === CellType.DeleteFamily)
      .groupBy((Seq("row", "family") ++ vc).map(col): _*)
      .agg(max("ts").as("__dfam_ts"))
    val dCol = tombSrc
      .filter(col("type") === CellType.DeleteColumn)
      .groupBy((Seq("row", "family", "qualifier") ++ vc).map(col): _*)
      .agg(max("ts").as("__dcol_ts"))
    val dVer = tombSrc
      .filter(col("type") === CellType.Delete)
      .select((Seq("row", "family", "qualifier", "ts") ++ vc).map(col): _*)
      .distinct()
    val dFamVer = tombSrc
      .filter(col("type") === CellType.DeleteFamilyVersion)
      .select((Seq("row", "family", "ts") ++ vc).map(col): _*)
      .distinct()

    puts
      .join(dVer, Seq("row", "family", "qualifier", "ts") ++ vc, "left_anti")
      .join(dFamVer, Seq("row", "family", "ts") ++ vc, "left_anti")
      .join(dCol, Seq("row", "family", "qualifier") ++ vc, "left")
      .filter(col("__dcol_ts").isNull || col("ts") > col("__dcol_ts"))
      .drop("__dcol_ts")
      .join(dFam, Seq("row", "family") ++ vc, "left")
      .filter(col("__dfam_ts").isNull || col("ts") > col("__dfam_ts"))
      .drop("__dfam_ts")
      .drop(vc: _*)
  }
}
