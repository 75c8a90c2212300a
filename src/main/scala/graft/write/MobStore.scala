package graft.write

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.CellType

/** MOB (medium-object) storage model — the Spark twin of the
  * reference's MOB path (hbase-server mob/: MobUtils.java:128,518 —
  * MOB_REFERENCE_TAG on ref cells; ColumnFamilyDescriptorBuilder
  * MOB_THRESHOLD): values at/above the family's threshold move to a
  * side MOB store, and the main store keeps a small REFERENCE cell in
  * their place, so the hot row-keyed store stays narrow (scans,
  * compactions, and diffs never drag the blobs) and identical big
  * values are stored once.
  *
  * Model: the ref value is `mobref:<md5(value)>` (the reference stores
  * value-length + mob file name under MOB_REFERENCE_TAG_TYPE; a
  * content hash is the layout-free analogue). The MOB side table is
  * `(ref, value)` distinct — content-addressed, so duplicate blobs
  * dedup exactly like MOB files shared across cells.
  *
  * Scale: `split` is one map-side projection plus a distinct on the
  * (small-cardinality) blob side; `read` left-joins only ref-bearing
  * cells against the MOB table on the content hash — inline cells
  * carry a null join key and never match, so the blob shuffle moves
  * |mob refs|, not |cells|. At 100 TB the MOB table is the bucketed
  * layout's natural side table (bucket on ref).
  */
object MobStore {

  val RefPrefix = "mobref:"

  /** Escape prefix for INLINE values that would otherwise read as ref
    * cells: an under-threshold value beginning with `mobref:` (or with
    * this prefix itself) is stored as `mobesc:<value>` and unescaped on
    * read, so blob stitching never misfires on look-alike payloads. */
  val EscPrefix = "mobesc:"

  // MOB_THRESHOLD is a BYTE length in the reference
  // (ColumnFamilyDescriptorBuilder MOB_THRESHOLD, bytes of the cell
  // value) — octet_length, not character count, or multi-byte values
  // under-count
  private def isMob(threshold: Int) =
    col("type") === CellType.Put && col("value").isNotNull &&
      octet_length(col("value")) >= threshold

  private def needsEscape =
    col("value").startsWith(RefPrefix) || col("value").startsWith(EscPrefix)

  /** Split a canonical cell frame at `threshold`: returns (main, mob)
    * where `main` replaces each big Put value with its content ref and
    * `mob` holds the distinct (ref, value) blobs. */
  def split(cells: DataFrame, threshold: Int): (DataFrame, DataFrame) = {
    val mob = cells.filter(isMob(threshold))
      .select(md5(col("value")).as("ref"), col("value"))
      .distinct()
    val main = cells.withColumn("value",
      when(isMob(threshold), concat(lit(RefPrefix), md5(col("value"))))
        .when(needsEscape, concat(lit(EscPrefix), col("value")))
        .otherwise(col("value")))
    (main, mob)
  }

  /** MOB-aware major compaction (DefaultMobStoreCompactor.java:60 —
    * the mob store's compactor rewrites the main store under the
    * family descriptor and carries only still-referenced mob values
    * into the new mob files; MobFileCleanerChore then drops the
    * now-unreferenced ones): graft compacts the REF-BEARING main
    * store exactly like [[graft.flow.Jobs.majorCompact]] (ref cells
    * are plain cells there — masking and version ranking act on
    * coordinates, never on blob bytes, so the blobs don't travel
    * through the compaction shuffle at all), then keeps exactly the
    * blobs some SURVIVING ref still names. Returns
    * (compactedMain, survivingMob).
    *
    * Scale: the surviving-ref set is a distinct on a 32-hex column of
    * the compacted main — broadcastable against the (already small)
    * content-addressed mob table; the blob payloads move only in the
    * left-semi's probe side, i.e. never.
    */
  def compact(main: DataFrame, mob: DataFrame, maxVersions: Int = 1,
      ttlCutoff: Option[Long] = None, minVersions: Int = 0): (DataFrame, DataFrame) = {
    val compacted = graft.flow.Jobs.majorCompact(main, maxVersions,
      ttlCutoff = ttlCutoff, minVersions = minVersions)
    val liveRefs = compacted
      .filter(col("value").startsWith(RefPrefix))
      .select(substring(col("value"), RefPrefix.length + 1, 32).as("ref"))
      .distinct()
    (compacted, mob.join(liveRefs, Seq("ref"), "left_semi"))
  }

  /** Transparent read: stitch MOB refs back to their blobs, and strip
    * one escape prefix from escaped inline values. Cells without a ref
    * pass through untouched (null join key — never matches, no blob
    * shuffle for them). */
  def read(main: DataFrame, mob: DataFrame): DataFrame = {
    val withRef = main.withColumn("__ref",
      when(col("value").startsWith(RefPrefix),
        substring(col("value"), RefPrefix.length + 1, 32)))
    withRef
      .join(mob.withColumnRenamed("value", "__blob"),
        withRef("__ref") === mob("ref"), "left")
      .withColumn("value",
        when(col("__blob").isNotNull, col("__blob"))
          // unescape only INLINE values (a stitched blob is verbatim)
          .when(col("value").startsWith(EscPrefix),
            substring(col("value"), EscPrefix.length + 1, Int.MaxValue))
          .otherwise(col("value")))
      .drop("__ref", "ref", "__blob")
  }
}
