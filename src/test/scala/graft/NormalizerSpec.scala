package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.flow.Normalizer
import graft.flow.Normalizer.{MergePlan, NKnobs, NRegion, SplitPlan}

/** SimpleRegionNormalizer twin ([[graft.flow.Normalizer]]): the
  * reference's TestSimpleRegionNormalizer fixtures on the pure
  * planner — too-few-regions / normalized-cluster no-ops,
  * transitioning-region skips, small-region merges (including the
  * HBASE-14867 second-smallest case and the empty-region seeding
  * rules), large-region splits, target size/count overrides, and the
  * enable/age/size/max-count gates. Pure JVM, no Spark session. */
class NormalizerSpec extends AnyFunSuite {

  private def rs(sizes: Long*): IndexedSeq[NRegion] =
    sizes.map(NRegion(_)).toIndexedSeq

  private val K = NKnobs()

  test("no plans for too few regions or a normalized cluster") {
    assert(Normalizer.computePlans(rs(10, 15), K).isEmpty)
    assert(Normalizer.computePlans(rs(10, 15, 8, 10), K).isEmpty)
  }

  test("transitioning (non-OPEN) regions never normalize") {
    val closed = Seq(10L, 1L, 100L).map(NRegion(_, open = false)).toIndexedSeq
    assert(Normalizer.computePlans(closed, K).isEmpty)
  }

  test("merge of small regions; non-adjacent smalls do not merge") {
    // testMergeOfSmallRegions: [15,5,5,15,16] -> merge regions 1,2
    assert(Normalizer.computePlans(rs(15, 5, 5, 15, 16), K) ==
      Seq(MergePlan(Seq(1, 2))))
    // HBASE-14867 second-smallest: [1,10000,10000,10000,2700,2700]
    assert(Normalizer.computePlans(rs(1, 10000, 10000, 10000, 2700, 2700), K) ==
      Seq(MergePlan(Seq(4, 5))))
    // testMergeOfSmallNonAdjacentRegions: nothing contiguous fits
    assert(Normalizer.computePlans(rs(15, 5, 16, 15, 5), K).isEmpty)
  }

  test("split of a large region; target size/count move the average") {
    // testSplitOfLargeRegion: [8,6,10,30], avg 13.5 -> split region 3
    assert(Normalizer.computePlans(rs(8, 6, 10, 30), K) ==
      Seq(SplitPlan(3, 30)))
    // testWithTargetRegionSize: [20,40,60,80,100,120]
    val sizes = rs(20, 40, 60, 80, 100, 120)
    assert(Normalizer.computePlans(sizes, K.copy(targetRegionSizeMb = 20)) ==
      Seq(SplitPlan(2, 60), SplitPlan(3, 80), SplitPlan(4, 100),
        SplitPlan(5, 120)))
    assert(Normalizer.computePlans(sizes, K.copy(targetRegionSizeMb = 200)) ==
      Seq(MergePlan(Seq(0, 1, 2, 3))))
    // testSplitWithTargetRegionCount: [20,40,60,80]
    val four = rs(20, 40, 60, 80)
    assert(Normalizer.computePlans(four, K.copy(targetRegionCount = 8)) ==
      Seq(SplitPlan(2, 60), SplitPlan(3, 80)))
    assert(Normalizer.computePlans(four, K.copy(targetRegionCount = 3))
      .contains(MergePlan(Seq(0, 1))))
  }

  test("empty regions seed and pair (testMergeEmptyRegions0-2)") {
    val k = K.copy(splitEnabled = false)
    assert(Normalizer.computePlans(rs(0, 1, 10, 0, 9, 10, 0), k) ==
      Seq(MergePlan(Seq(0, 1)), MergePlan(Seq(2, 3)), MergePlan(Seq(5, 6))))
    assert(Normalizer.computePlans(rs(0, 1, 10, 0, 9, 0, 10, 0), k) ==
      Seq(MergePlan(Seq(0, 1)), MergePlan(Seq(2, 3)), MergePlan(Seq(4, 5)),
        MergePlan(Seq(6, 7))))
    assert(Normalizer.computePlans(rs(0, 10, 1, 0, 9, 0, 10, 0), k) ==
      Seq(MergePlan(Seq(0, 1)), MergePlan(Seq(2, 3)), MergePlan(Seq(4, 5)),
        MergePlan(Seq(6, 7))))
  }

  test("split and multi-merge compose (testSplitAndMultiMerge)") {
    assert(Normalizer.computePlans(rs(3, 1, 1, 30, 9, 3, 1, 0), K) ==
      Seq(SplitPlan(3, 30), MergePlan(Seq(0, 1, 2)), MergePlan(Seq(5, 6, 7))))
  }

  test("gates: enable flags, min count, min age, min size, max per merge") {
    val smalls = rs(1, 1, 1, 1, 30)
    assert(Normalizer.computePlans(smalls, K.copy(mergeEnabled = false)) ==
      Seq(SplitPlan(4, 30)))
    assert(Normalizer.computePlans(smalls, K.copy(splitEnabled = false)) ==
      Seq(MergePlan(Seq(0, 1, 2, 3))))
    // min region count gate (testHonorsMinimumRegionCount: [1,1,10])
    assert(Normalizer.computePlans(rs(1, 1, 10), K.copy(mergeMinRegionCount = 1)) ==
      Seq(SplitPlan(2, 10), MergePlan(Seq(0, 1))))
    assert(Normalizer.computePlans(rs(1, 1, 10), K.copy(mergeMinRegionCount = 4)) ==
      Seq(SplitPlan(2, 10)))
    // min age: regions exactly min-age old are NOT old enough (isAfter)
    def aged(d: Int) = IndexedSeq(NRegion(1, ageDays = d), NRegion(1, ageDays = d),
      NRegion(10, ageDays = d))
    assert(Normalizer.computePlans(aged(3), K.copy(splitEnabled = false,
      mergeMinRegionCount = 1)).isEmpty)
    assert(Normalizer.computePlans(aged(4), K.copy(splitEnabled = false,
      mergeMinRegionCount = 1)) == Seq(MergePlan(Seq(0, 1))))
    // min merge size: under-sized regions are ineligible; an
    // under-sized AVERAGE kills merging outright
    assert(Normalizer.computePlans(rs(1, 1, 20, 20),
      K.copy(mergeMinRegionSizeMb = 2)).isEmpty)
    // max regions per merge (floor 2) caps the range
    assert(Normalizer.computePlans(rs(1, 1, 1, 1, 1, 1, 30),
      K.copy(mergeRequestMaxRegions = 3)) ==
      Seq(SplitPlan(6, 30), MergePlan(Seq(0, 1, 2)), MergePlan(Seq(3, 4, 5))))
  }
}
