package graft.flow

/** Region normalizer — SimpleRegionNormalizer
  * (hbase-server/.../master/normalizer/SimpleRegionNormalizer.java:
  * 240-470), the WHICH-regions planner that pairs with the split
  * policies' WHEN/WHERE: walk a table's region chain and emit SPLIT
  * plans for regions more than twice the average size and MERGE plans
  * for contiguous runs of small regions that fit under it.
  *
  * Faithful details:
  *  - the average is the target region size when set, else total ÷
  *    (target region count when set, else region count) — :308-335;
  *  - splits compare against the DOUBLE average (:449-470), merges
  *    against its LONG truncation (:372);
  *  - the merge walk (:362-430) seeds each range with whatever it
  *    sees (so a 0-size neighbor can always pair), admits 0-size
  *    regions and under-average accumulations while the range is
  *    under the max-regions-per-merge cap, and emits any ≥2-member
  *    range — including one cut short by an ineligible region;
  *  - merge eligibility: OPEN, older than the min age (strictly —
  *    isOldEnoughForMerge:476 is `isAfter`), and at least the min
  *    merge size (:491);
  *  - knob floors as parsed: min count ≥1, age ≥0, size ≥0, regions
  *    per merge ≥2 (:116-152).
  *
  * Scale: the planner is a driver-side single pass over ONE table's
  * region chain (count-bounded); per-region sizes come from file
  * metadata. The reference shuffles plan order before execution; graft
  * returns splits-then-merges in chain order (deterministic for the
  * oracle) and leaves scheduling to the caller.
  */
object Normalizer {

  final case class NKnobs(
      splitEnabled: Boolean = true,
      mergeEnabled: Boolean = true,
      mergeMinRegionCount: Int = 3,
      mergeMinRegionAgeDays: Int = 3,
      mergeMinRegionSizeMb: Long = 0L,
      mergeRequestMaxRegions: Long = 100L,
      targetRegionCount: Int = 0,
      targetRegionSizeMb: Long = 0L)

  /** One region as the planner sees it: size, whole-day age, and
    * whether it is OPEN (transitioning regions never normalize). */
  final case class NRegion(sizeMb: Long, ageDays: Int = Int.MaxValue,
      open: Boolean = true)

  sealed trait NPlan
  final case class SplitPlan(region: Int, sizeMb: Long) extends NPlan
  final case class MergePlan(regions: Seq[Int]) extends NPlan

  def averageRegionSizeMb(regions: Seq[NRegion], k: NKnobs): Double = {
    require(regions.nonEmpty, "cannot average a table with no regions")
    if (k.targetRegionSizeMb > 0) k.targetRegionSizeMb.toDouble
    else {
      val total = regions.map(_.sizeMb).sum
      if (k.targetRegionCount > 0) total / k.targetRegionCount.toDouble
      else total / regions.size.toDouble
    }
  }

  /** computePlansForTable's plan set: splits (chain order) then
    * merges (chain order). */
  def computePlans(regions: IndexedSeq[NRegion], k: NKnobs): Seq[NPlan] = {
    val avg = averageRegionSizeMb(regions, k)
    val splits =
      if (!k.splitEnabled) Seq.empty[NPlan]
      else regions.zipWithIndex.collect {
        case (r, i) if r.open && r.sizeMb > 2 * avg => SplitPlan(i, r.sizeMb)
      }
    val merges =
      if (!k.mergeEnabled) Seq.empty[NPlan] else computeMerges(regions, k, avg)
    splits ++ merges
  }

  private def skipForMerge(r: NRegion, k: NKnobs): Boolean =
    !r.open ||
      !(r.ageDays > math.max(0, k.mergeMinRegionAgeDays)) ||
      r.sizeMb < math.max(0L, k.mergeMinRegionSizeMb)

  private def computeMerges(regions: IndexedSeq[NRegion], k: NKnobs,
      avgD: Double): Seq[NPlan] = {
    if (regions.size < math.max(1, k.mergeMinRegionCount)) return Nil
    val avg = avgD.toLong // (long) getAverageRegionSizeMb — :372
    if (avg < math.max(0L, k.mergeMinRegionSizeMb)) return Nil
    val maxN = math.max(2L, k.mergeRequestMaxRegions)
    val plans = scala.collection.mutable.ArrayBuffer.empty[NPlan]
    val members = scala.collection.mutable.ArrayBuffer.empty[Int]
    var rangeStart = 0
    var current = 0
    while (rangeStart < regions.size - 1 && current < regions.size) {
      members.clear()
      var sum = 0L
      current = rangeStart
      var broke = false
      while (current < regions.size && !broke) {
        val r = regions(current)
        if (skipForMerge(r, k)) {
          rangeStart = math.max(current, rangeStart + 1)
          broke = true
        } else if (members.isEmpty ||
            (members.size == 1 && sum == 0) ||
            (r.sizeMb == 0 && members.size < maxN) ||
            (r.sizeMb + sum <= avg && members.size < maxN)) {
          members += current
          sum += r.sizeMb
          current += 1
        } else {
          rangeStart = math.max(current, rangeStart + 1)
          broke = true
        }
      }
      if (members.size > 1) plans += MergePlan(members.toList)
    }
    plans.toSeq
  }
}
