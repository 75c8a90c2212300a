package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.codec.HFileV3
import graft.codec.HFileV3.HCell
import graft.flow.SplitPolicies
import graft.flow.SplitPolicies.SpKnobs

/** RegionSplitPolicy family twin ([[graft.flow.SplitPolicies]]):
  * the ConstantSize / IncreasingToUpperBound / Stepping size triggers,
  * the KeyPrefix / DelimitedKeyPrefix split-point adjustments, and the
  * physical index-mid-key split point (single- and multi-level
  * indexes, the first/last-row degenerate guard, TOP/BOTTOM daughter
  * identity). */
class SplitPoliciesSpec extends SparkSpec {

  private val k = SpKnobs(desiredMaxFileSize = 1000L, initialSize = 128L)

  test("size triggers: constant, increasing count-cubed ramp, stepping") {
    // ConstantSize: any store past the max
    assert(!SplitPolicies.constantSizeShouldSplit(Seq(900, 500), k))
    assert(SplitPolicies.constantSizeShouldSplit(Seq(900, 1001), k))
    // OVERALL_HREGION_FILES sums the stores
    assert(SplitPolicies.constantSizeShouldSplit(Seq(900, 500),
      k.copy(overallRegionFiles = true)))
    // IncreasingToUpperBound: initial × count³ capped at the max
    assert(SplitPolicies.increasingSizeToCheck(1, k) == 128L)
    assert(SplitPolicies.increasingSizeToCheck(2, k) == 1000L) // 1024 capped
    assert(SplitPolicies.increasingSizeToCheck(0, k) == 1000L) // guard
    assert(SplitPolicies.increasingSizeToCheck(101, k) == 1000L) // guard
    assert(SplitPolicies.increasingShouldSplit(Seq(129), 1, k))
    assert(!SplitPolicies.increasingShouldSplit(Seq(129), 2, k))
    // Stepping: one region → initialSize, else the max
    assert(SplitPolicies.steppingShouldSplit(Seq(129), 1, k))
    assert(!SplitPolicies.steppingShouldSplit(Seq(129), 2, k))
    assert(SplitPolicies.steppingShouldSplit(Seq(1001), 2, k))
  }

  test("split-point adjustments: key prefix and delimited prefix") {
    val p = "user123_event45".getBytes(UTF_8)
    assert(new String(SplitPolicies.keyPrefixAdjust(p, 7), UTF_8) == "user123")
    // prefix longer than the key: whole key
    assert(SplitPolicies.keyPrefixAdjust("ab".getBytes(UTF_8), 7)
      .sameElements("ab".getBytes(UTF_8)))
    // zero/invalid prefix length leaves the point alone
    assert(SplitPolicies.keyPrefixAdjust(p, 0).sameElements(p))
    // delimited: truncate at the FIRST delimiter occurrence
    assert(new String(SplitPolicies.delimitedPrefixAdjust(p,
      "_".getBytes(UTF_8)), UTF_8) == "user123")
    // delimiter absent: unchanged (the reference logs and keeps it)
    assert(SplitPolicies.delimitedPrefixAdjust("nounderscore".getBytes(UTF_8),
      "_".getBytes(UTF_8)).sameElements("nounderscore".getBytes(UTF_8)))
    // multi-byte delimiter
    assert(new String(SplitPolicies.delimitedPrefixAdjust(
      "ab::cd::ef".getBytes(UTF_8), "::".getBytes(UTF_8)), UTF_8) == "ab")
  }

  test("busy policy: deterministic replay of the reference scenario") {
    // TestRegionSplitPolicy.testBusyRegionSplitPolicy, with explicit
    // clocks: window 500 ms, threshold 0.1, snapshot (10 blocked / 20
    // writes) at create
    val t = new SplitPolicies.BusyTracker(startTime = 0L,
      startBlocked = 10L, startWrites = 20L, aggregationWindowMs = 500L)
    // 300 ms in: blocked jumped but no full window yet -> rate 0
    val r1 = t.updateRate(300L, 12L, 30L)
    assert(r1 == 0.0f)
    assert(!SplitPolicies.busyShouldSplit(Seq(1), 1,
      SpKnobs(Long.MaxValue, Long.MaxValue), r1, regionAgeMs = 300L,
      minAgeMs = 0L, maxBlockedRequests = 0.1f))
    // 502 ms in: a full window elapsed; rate = 4/20 = 0.2 >= 0.1
    val r2 = t.updateRate(502L, 14L, 40L)
    assert(math.abs(r2 - 0.2f) < 1e-4)
    assert(SplitPolicies.busyShouldSplit(Seq(1), 1,
      SpKnobs(Long.MaxValue, Long.MaxValue), r2, regionAgeMs = 502L,
      minAgeMs = 0L, maxBlockedRequests = 0.1f))
    // not old enough: the same rate does not split
    assert(!SplitPolicies.busyShouldSplit(Seq(1), 1,
      SpKnobs(Long.MaxValue, Long.MaxValue), r2, regionAgeMs = 502L,
      minAgeMs = 1000000L, maxBlockedRequests = 0.1f))
    // partial-window blend: after the 502ms reset, 250 ms later the
    // rate blends (1-0.5)*0.2 + 0.5*newRate
    val r3 = t.updateRate(752L, 14L, 50L) // no new blocked, 10 writes
    assert(math.abs(r3 - 0.1f) < 1e-3)
    // the size trigger still applies regardless of business
    assert(SplitPolicies.busyShouldSplit(Seq(200), 1,
      SpKnobs(desiredMaxFileSize = 1000, initialSize = 128), 0f,
      regionAgeMs = 0L))
    assert(!SplitPolicies.disabledShouldSplit)
  }

  private def fileOf(cells: Seq[HCell], blockSize: Int,
      indexMaxChunk: Int = 128 * 1024): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    HFileV3.write(bos, cells.iterator, blockSize = blockSize,
      indexMaxChunk = indexMaxChunk)
    bos.toByteArray
  }

  private def cell(row: String, q: String = "q", ts: Long = 1L): HCell =
    HCell(row.getBytes(UTF_8), "d".getBytes(UTF_8), q.getBytes(UTF_8),
      ts, HFileV3.TypePut, ("v" + row).getBytes(UTF_8))

  test("index mid-key row: single-level, multi-level, degenerate guard") {
    val cells = (0 until 400).map(i => cell(f"r$i%05d"))
    // single-level (big blocks, few root entries): root[count/2]'s row
    val single = fileOf(cells, blockSize = 256)
    val trailer = HFileV3.readTrailer(single.takeRight(4096))
    assert(trailer.numDataIndexLevels == 1)
    val rootCount = trailer.dataIndexCount
    val midSingle = HFileV3.midKeyRow(
      (off, n) => java.util.Arrays.copyOfRange(single, off.toInt, off.toInt + n),
      single.length.toLong).get
    // exact single-level contract: the middle root entry's first row
    val roots = HFileV3.readRootIndex(single, trailer)
    val wantRow = {
      val key = roots(rootCount / 2)._3
      val rl = ((key(0) & 0xff) << 8) | (key(1) & 0xff)
      java.util.Arrays.copyOfRange(key, 2, 2 + rl)
    }
    assert(java.util.Arrays.equals(midSingle, wantRow))

    // multi-level, one cell per block: the median cell's row (n-1)/2
    val multi = fileOf(cells, blockSize = 1, indexMaxChunk = 2048)
    val t2 = HFileV3.readTrailer(multi.takeRight(4096))
    assert(t2.numDataIndexLevels > 1)
    val midMulti = HFileV3.midKeyRow(
      (off, n) => java.util.Arrays.copyOfRange(multi, off.toInt, off.toInt + n),
      multi.length.toLong).get
    assert(new String(midMulti, UTF_8) == f"r${(400 - 1) / 2}%05d")

    // degenerate: a one-row file's mid key shares the first/last row
    val oneRow = fileOf((0 until 50).map(i => cell("same", q = f"q$i%02d")),
      blockSize = 1, indexMaxChunk = 512)
    assert(HFileV3.midKeyRow(
      (off, n) => java.util.Arrays.copyOfRange(oneRow, off.toInt, off.toInt + n),
      oneRow.length.toLong).isEmpty)
  }

  test("daughters reunite to the parent; key-prefix point never splits a prefix") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("splitpol").toString
    val df = (0 until 300)
      .map(i => (f"g${i / 10}%03d-${i % 10}", "d", "q", 1L, "Put", s"v$i"))
      .toDF("row", "family", "qualifier", "ts", "type", "value")
    graft.flow.HFiles.export(df, numRegions = 1, outPath = dir,
      blockSize = 1, indexMaxChunk = 1024)
    val mid = SplitPolicies.storeSplitPoint(spark, dir).get
    // median of 300 rows (one cell each): index 149 -> g014-9
    assert(new String(mid, UTF_8) == "g014-9")
    val prefix = SplitPolicies.keyPrefixAdjust(mid, 4)
    assert(new String(prefix, UTF_8) == "g014")
    val (bottom, top) = SplitPolicies.daughters(spark, dir, prefix)
    assert(bottom.count() == 140 && top.count() == 160)
    // no prefix group straddles the daughters
    val bp = bottom.select(substring(col("row"), 1, 4)).distinct().as[String].collect().toSet
    val tp = top.select(substring(col("row"), 1, 4)).distinct().as[String].collect().toSet
    assert(bp.intersect(tp).isEmpty)
    assert(bottom.unionByName(top).count() == 300)
  }
}
