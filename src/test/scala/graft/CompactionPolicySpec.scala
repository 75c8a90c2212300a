package graft

import org.apache.spark.sql.functions._

import graft.flow.{Compactions, HFiles}
import graft.flow.Compactions.Knobs

/** ExploringCompactionPolicy twin ([[graft.flow.Compactions]]):
  * size-list fixtures mirroring the reference's
  * TestDefaultCompactSelection.testCompactionRatio /
  * testStuckStoreCompaction ladders (run there against the default
  * store engine's exploring policy, with minFiles=3, maxFiles=5,
  * minCompactSize=10, maxCompactSize=2100, ratio=1.0 — see
  * TestCompactionPolicy.java:63-89), plus the physical selected-only
  * rewrite. */
class CompactionPolicySpec extends SparkSpec {

  private val K = Knobs(minFiles = 3, maxFiles = 5, ratio = 1.0,
    minCompactSize = 10, maxCompactSize = 2100)

  private def sel(sizes: Long*): Seq[Long] = {
    val v = sizes.toIndexedSeq
    Compactions.exploringSelect(v, K).map(v(_)).toSeq
  }
  private def selStuck(sizes: Long*): Seq[Long] = {
    val v = sizes.toIndexedSeq
    Compactions.exploringSelect(v, K, mightBeStuck = true).map(v(_)).toSeq
  }

  test("reference ratio ladders select the same subsets") {
    val tooBig = 2101L
    // preserve user ratio on size
    assert(sel(100, 50, 23, 12, 12) == Seq(23, 12, 12))
    // less than compact threshold = don't compact
    assert(sel(100, 50, 25, 12, 12).isEmpty)
    // greater than max compact size = those windows skipped
    assert(sel(tooBig, tooBig, 700, 700, 700) == Seq(700, 700, 700))
    assert(sel(tooBig, tooBig, 700, 700).isEmpty)
    // small files (window under minCompactSize): ratio not consulted
    assert(sel(7, 1, 1) == Seq(7, 1, 1))
    // never exceed maxFiles; among equal-count windows take least IO
    assert(sel(7, 6, 5, 4, 3, 2, 1) == Seq(5, 4, 3, 2, 1))
    assert(sel(50, 10, 10, 10, 10) == Seq(10, 10, 10, 10))
    assert(sel(10, 10, 10, 10, 50) == Seq(10, 10, 10, 10))
    assert(sel(251, 253, 251, 2100 - 1) == Seq(251, 253, 251))
    assert(sel(2100 - 1, 2100 - 1, 2100 - 1).isEmpty)
    // fewer than minFiles candidates: nothing
    assert(sel(12, 12).isEmpty)
    assert(sel().isEmpty)
  }

  test("stuck store prefers files-retired-per-byte (quality rule)") {
    // TestDefaultCompactSelection.testStuckStoreCompaction:150 — at
    // blocking file count the quality rule retires the cheap tail
    assert(selStuck(99, 99, 99, 99, 99, 99, 30, 30, 30, 30) ==
      Seq(30, 30, 30))
    // one file below blocking (:152) the normal rule applies: most
    // files, then least IO
    assert(sel(99, 99, 99, 99, 99, 30, 30, 30, 30) ==
      Seq(99, 30, 30, 30, 30))
    // stuck with NOTHING in ratio: fall back to the smallest window
    assert(selStuck(5000, 4000, 3000) == Seq(5000, 4000, 3000))
  }

  test("selection is always a contiguous age-ordered run") {
    val sizes = IndexedSeq(400L, 7L, 60L, 8L, 9L, 300L, 10L, 11L, 12L)
    val r = Compactions.exploringSelect(sizes, K)
    assert(r.isEmpty || (r.last - r.head + 1 == r.size))
  }

  test("minorCompact rewrites only the selected run; untouched files keep their bytes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("minorc").toString
    // five age-ordered files with a [big, big, small, small, small]
    // ladder: exploring picks the small tail
    val fileCells = Seq(
      0 -> (0 until 600), // oldest, biggest
      1 -> (600 until 900),
      2 -> (900 until 930),
      3 -> (930 until 960),
      4 -> (960 until 990))
    // 200 B values so the size ladder dominates the HFile's fixed
    // per-file overhead (4 KB trailer + index)
    fileCells.foreach { case (idx, range) =>
      val df = range.map(i => (f"r$i%05d", "d", "q0", 1L, "Put",
          s"v$i-" + "x" * 200))
        .toDF("row", "family", "qualifier", "ts", "type", "value")
      val tmp = java.nio.file.Files.createTempDirectory(s"minorc$idx").toString
      HFiles.export(df, numRegions = 1, outPath = tmp)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/part-00000.hfile"),
        new org.apache.hadoop.fs.Path(f"$dir/part-$idx%05d.hfile"))
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytesOf(name: String): Array[Byte] = {
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(dir, name))
      val in = fs.open(st.getPath)
      val b = new Array[Byte](st.getLen.toInt)
      try in.readFully(0, b) finally in.close()
      b
    }
    val untouchedBefore = Seq("part-00000.hfile", "part-00001.hfile").map(bytesOf)

    val selected = Compactions.minorCompact(spark, dir,
      Knobs(minFiles = 3, maxFiles = 5, ratio = 1.2,
        minCompactSize = 0, maxCompactSize = Long.MaxValue))
    // the three similar small files compact; the two big ones fail the
    // ratio in any window containing them
    assert(selected ==
      Seq("part-00002.hfile", "part-00003.hfile", "part-00004.hfile"))
    val after = fs.globStatus(new org.apache.hadoop.fs.Path(dir, "part-*.hfile"))
      .map(_.getPath.getName).sorted.toSeq
    assert(after ==
      Seq("part-00000.hfile", "part-00001.hfile", "part-00002.hfile"))
    // untouched files byte-identical; full read-back = identity
    val untouchedAfter = Seq("part-00000.hfile", "part-00001.hfile").map(bytesOf)
    untouchedBefore.zip(untouchedAfter).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    val back = HFiles.importCells(spark, dir)
    assert(back.count() == 990)
    assert(back.select("value").as[String].collect().toSet ==
      (0 until 990).map(i => s"v$i-" + "x" * 200).toSet)
    // idempotent: the compacted store has nothing left to select
    assert(Compactions.minorCompact(spark, dir,
      Knobs(minFiles = 3, maxFiles = 5, ratio = 1.2,
        minCompactSize = 0, maxCompactSize = Long.MaxValue)).isEmpty)
  }

  // ------------------------------------------------------------------
  // Date-tiered policy: the reference's TestDateTieredCompactionPolicy
  // fixtures, verbatim (config: base window 6 ms, 4 windows/tier,
  // max age 100 ms, incoming-window min 3; per-window exploring
  // min 2 / max 12 / ratio 1.2)
  // ------------------------------------------------------------------

  import graft.flow.Compactions.DtKnobs

  private val DT = DtKnobs(baseWindowMillis = 6, windowsPerTier = 4,
    maxTierAgeMillis = 100, incomingWindowMin = 3,
    maxStoreFileAgeMillis = 100,
    window = Knobs(minFiles = 2, maxFiles = 12, ratio = 1.2))

  private def dtSel(now: Long, maxTs: Seq[Long], sizes: Seq[Long]): Seq[Long] = {
    val sz = sizes.toIndexedSeq
    Compactions.dateTieredSelect(sz, maxTs.toIndexedSeq, now, DT).map(sz(_)).toSeq
  }

  test("date-tiered minor selection matches every reference fixture") {
    // incomingWindow: enough files in the window holding `now`
    assert(dtSel(16, Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
      Seq(30, 31, 32, 33, 34, 20, 21, 22, 23, 24, 25, 10, 11, 12, 13)) ==
      Seq(10, 11, 12, 13))
    // NotIncomingWindow: too few incoming, the previous window wins
    assert(dtSel(16, Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13),
      Seq(30, 31, 32, 33, 34, 20, 21, 22, 23, 24, 25, 10, 11)) ==
      Seq(20, 21, 22, 23, 24, 25))
    // OnUpperBoundOfIncomingWindow / NewerThanIncomingWindow: future
    // timestamps are tolerated inside the incoming window
    for (last <- Seq(18L, 19L))
      assert(dtSel(16, Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, last),
        Seq(30, 31, 32, 33, 34, 20, 21, 22, 23, 24, 25, 10, 11, 12, 13)) ==
        Seq(10, 11, 12, 13))
    // NoT2: if there is no T1 window we never build T2
    assert(dtSel(194, Seq(44, 60, 61, 97, 100, 193),
      Seq(0, 20, 21, 22, 23, 1)) == Seq(22, 23))
    // T1
    assert(dtSel(161, Seq(44, 60, 61, 96, 100, 104, 120, 124, 143, 145, 157),
      Seq(0, 50, 51, 40, 41, 42, 30, 31, 32, 2, 1)) == Seq(30, 31, 32))
    // RatioT0: exploring logic applies inside the non-incoming window
    assert(dtSel(16, Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12),
      Seq(30, 31, 32, 33, 34, 20, 21, 22, 280, 23, 24, 1)) ==
      Seq(20, 21, 22))
    // RatioT2
    assert(dtSel(161, Seq(44, 60, 61, 96, 100, 104, 120, 124, 143, 145, 157),
      Seq(0, 50, 51, 40, 41, 42, 350, 30, 31, 2, 1)) == Seq(30, 31))
    // RatioT0Next: the follow-up call after RatioT0's output landed
    assert(dtSel(16, Seq(1, 2, 3, 4, 5, 8, 9, 10, 11, 12),
      Seq(30, 31, 32, 33, 34, 22, 280, 23, 24, 1)) == Seq(23, 24))
    // olderThanMaxAge: windows past now-maxAge stop the walk
    assert(dtSel(161, Seq(44, 60, 61, 96, 100, 104, 105, 106, 113, 145, 157),
      Seq(0, 50, 51, 40, 41, 42, 33, 30, 31, 2, 1)) ==
      Seq(40, 41, 42, 33, 30, 31))
    // outOfOrder: files inherit the newest max timestamp seen
    assert(dtSel(16, Seq(0, 13, 3, 10, 11, 1, 2, 12, 14, 15),
      Seq(30, 31, 32, 33, 34, 22, 28, 23, 24, 1)) ==
      Seq(31, 32, 33, 34, 22, 28, 23, 24, 1))
    // negativeEpochtime: floor-division window membership below zero
    assert(dtSel(1, Seq(-28, -11, -10, -9, -8, -7, -6, -5, -4, -3),
      Seq(30, 31, 32, 33, 34, 22, 25, 23, 24, 1)) ==
      Seq(31, 32, 33, 34, 22, 25, 23, 24, 1))
  }

  test("date-tiered major boundaries match the reference fixtures") {
    // majorCompation / checkMinMaxTimestampSameBoundary (minTs = 0)
    assert(Compactions.dateTieredBoundariesForMajor(0, 161, DT) ==
      Seq(Long.MinValue, 24, 48, 72, 96, 120, 144, 150, 156))
    // negativeForMajor (minTs = -155, now = 16)
    assert(Compactions.dateTieredBoundariesForMajor(-155, 16, DT) ==
      Seq(Long.MinValue, -144, -120, -96, -72, -48, -24, 0, 6, 12))
    // maxValuesForMajor (overflow config: base = MaxValue/2, 2/tier) —
    // the wrap/clamp semantics of the window arithmetic, pinned
    val dtOv = DT.copy(baseWindowMillis = Long.MaxValue / 2, windowsPerTier = 2)
    assert(Compactions.dateTieredBoundariesForMajor(Long.MinValue,
      Long.MaxValue, dtOv) ==
      Seq(Long.MinValue, -4611686018427387903L, 0, 4611686018427387903L,
        9223372036854775806L))
  }

  test("date-tiered physical compaction: TIMERANGE-driven, windowed major layout") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dtstore").toString
    // 15 flush files, file i holding 40 cells all at ts i+1 — the
    // incomingWindow fixture shape with near-equal physical sizes
    for (i <- 0 until 15) {
      val tmp = java.nio.file.Files.createTempDirectory(s"dtf$i").toString
      val df = (0 until 40)
        .map(j => (f"r${j * 15 + i}%05d", "d", "q", (i + 1).toLong, "Put",
          s"v$i-$j-" + "x" * 120))
        .toDF("row", "family", "qualifier", "ts", "type", "value")
      HFiles.export(df, numRegions = 1, outPath = tmp)
      fsOf(dir).rename(new org.apache.hadoop.fs.Path(s"$tmp/part-00000.hfile"),
        new org.apache.hadoop.fs.Path(f"$dir/part-$i%05d.hfile"))
    }
    // minor: the incoming window (ts 13-15... base 6, now 16 -> [12,18))
    // holds files 11-14; near-equal sizes pass the ratio -> all four
    val selected = Compactions.dateTieredCompact(spark, dir, DT, now = 16L)
    assert(selected == (11 to 14).map(i => f"part-$i%05d.hfile"))
    val afterMinor = fsOf(dir)
      .globStatus(new org.apache.hadoop.fs.Path(dir, "part-*.hfile"))
      .map(_.getPath.getName).sorted.toSeq
    assert(afterMinor == (0 to 11).map(i => f"part-$i%05d.hfile"))
    assert(HFiles.importCells(spark, dir).count() == 600)

    // major: one output per compaction window, split by TIMERANGE
    // minTs = 1 lives in window [0,6): the walk stops there, so 0 is
    // NOT a boundary — everything below 6 lands in the [MIN,6) file
    val bounds = Compactions.dateTieredMajorCompact(spark, dir, DT, now = 16L)
    assert(bounds == Seq(Long.MinValue, 6, 12))
    val afterMajor = fsOf(dir)
      .globStatus(new org.apache.hadoop.fs.Path(dir, "part-*.hfile"))
      .map(s => (s.getPath, s.getLen)).sortBy(_._1.getName)
    // ts range 1..15 -> windows [MIN,0) empty, [0,6), [6,12), [12,inf)
    assert(afterMajor.length == 3)
    val ranges = afterMajor.map { case (p, l) =>
      val in = fsOf(dir).open(p)
      try {
        val pread: graft.codec.HFileV3.PRead =
          (off, n) => { val b = new Array[Byte](n); in.readFully(off, b); b }
        val tr = graft.codec.HFileV3.readTrailer(
          pread(l - graft.codec.HFileV3.TrailerSize, graft.codec.HFileV3.TrailerSize))
        graft.codec.HFileV3.parseTimeRange(
          graft.codec.HFileV3.readFileInfo(pread, tr)).get
      } finally in.close()
    }.toSeq
    assert(ranges == Seq((1L, 5L), (6L, 11L), (12L, 15L)))
    assert(HFiles.importCells(spark, dir).count() == 600)
  }

  test("FIFO compaction drops exactly the TTL-expired files, rewrites nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fifostore").toString
    for (i <- 0 until 4) {
      val tmp = java.nio.file.Files.createTempDirectory(s"ff$i").toString
      val df = (0 until 20)
        .map(j => (f"r${j * 4 + i}%05d", "d", "q", (i + 1) * 100L, "Put", s"v$i-$j"))
        .toDF("row", "family", "qualifier", "ts", "type", "value")
      HFiles.export(df, numRegions = 1, outPath = tmp)
      fsOf(dir).rename(new org.apache.hadoop.fs.Path(s"$tmp/part-00000.hfile"),
        new org.apache.hadoop.fs.Path(f"$dir/part-$i%05d.hfile"))
    }
    val survivorBytes = {
      val st = fsOf(dir).getFileStatus(
        new org.apache.hadoop.fs.Path(dir, "part-00003.hfile"))
      val in = fsOf(dir).open(st.getPath)
      val b = new Array[Byte](st.getLen.toInt)
      try in.readFully(0, b) finally in.close()
      b
    }
    // ttl 250 at now 500: expired iff maxTs <= 250 -> files 0 (ts 100)
    // and 1 (ts 200) drop; 2 (ts 300) and 3 (ts 400) survive untouched
    val dropped = Compactions.fifoCompact(spark, dir, ttlMillis = 250, now = 500)
    assert(dropped == Seq("part-00000.hfile", "part-00001.hfile"))
    val left = fsOf(dir)
      .globStatus(new org.apache.hadoop.fs.Path(dir, "part-*.hfile"))
      .map(_.getPath.getName).sorted.toSeq
    assert(left == Seq("part-00002.hfile", "part-00003.hfile"))
    val after = {
      val st = fsOf(dir).getFileStatus(
        new org.apache.hadoop.fs.Path(dir, "part-00003.hfile"))
      val in = fsOf(dir).open(st.getPath)
      val b = new Array[Byte](st.getLen.toInt)
      try in.readFully(0, b) finally in.close()
      b
    }
    assert(java.util.Arrays.equals(survivorBytes, after))
    assert(HFiles.importCells(spark, dir).count() == 40)
    // TTL unset (MaxValue) never drops
    assert(Compactions.fifoCompact(spark, dir, Long.MaxValue, now = Long.MaxValue).isEmpty)
  }

  test("off-peak ratio widens the selected window (testOffPeakCompactionRatio)") {
    // TestDefaultCompactSelection.testOffPeakCompactionRatio:
    // ladder [999, 50, 12, 12, 1] with ratio.offpeak = 5.0 —
    // off-peak retires [50, 12, 12, 1]; peak hours only [12, 12, 1]
    val v = IndexedSeq[Long](999, 50, 12, 12, 1)
    val off = Compactions.exploringSelect(v, K, isOffPeak = true).map(v(_))
    assert(off == Seq(50L, 12L, 12L, 1L))
    val peak = Compactions.exploringSelect(v, K).map(v(_))
    assert(peak == Seq(12L, 12L, 1L))
  }

  test("isOffPeakHour mirrors OffPeakHours (disabled, plain, wrapping)") {
    val disabled = Knobs() // -1/-1
    assert((0 to 23).forall(h => !disabled.isOffPeakHour(h)))
    assert(!Knobs(offPeakStartHour = 5, offPeakEndHour = 5).isOffPeakHour(5))
    val plain = Knobs(offPeakStartHour = 2, offPeakEndHour = 6)
    assert(!plain.isOffPeakHour(1) && plain.isOffPeakHour(2) &&
      plain.isOffPeakHour(5) && !plain.isOffPeakHour(6))
    val wrap = Knobs(offPeakStartHour = 22, offPeakEndHour = 6)
    assert(wrap.isOffPeakHour(23) && wrap.isOffPeakHour(0) &&
      wrap.isOffPeakHour(5) && !wrap.isOffPeakHour(6) &&
      !wrap.isOffPeakHour(12) && wrap.isOffPeakHour(22))
    // epoch-millis form: hour-of-day UTC; unknown clock never off-peak
    assert(wrap.isOffPeak(23L * 3600000L) && !wrap.isOffPeak(12L * 3600000L))
    assert(!wrap.isOffPeak(-1L))
    // offPeakZoneId: the window is evaluated in the configured zone
    // (the reference's CurrentHourProvider uses the JVM default zone;
    // graft pins UTC by default and makes the zone a knob). 23:00 UTC
    // is 01:00 at +02:00 — inside a [0,6) window there, outside in UTC
    val night = Knobs(offPeakStartHour = 0, offPeakEndHour = 6)
    val at23utc = 23L * 3600000L
    assert(!night.isOffPeak(at23utc))
    assert(night.copy(offPeakZoneId = "+02:00").isOffPeak(at23utc))
  }

  test("timed-major deadline: deterministic jitter within ±jitterPct") {
    val period = 7L * 24 * 3600000L
    assert(Compactions.nextMajorCompactTime(period, jitterPct = 0) == period)
    assert(Compactions.nextMajorCompactTime(0L) == 0L)
    val js = (0 until 50).map(s =>
      Compactions.nextMajorCompactTime(period, 0.5, seed = s.toLong))
    assert(js.forall(t => t >= period / 2 && t <= period * 3 / 2))
    assert(js.distinct.size > 1) // jitter actually spreads
    assert(Compactions.nextMajorCompactTime(period, 0.5, seed = 7L) ==
      Compactions.nextMajorCompactTime(period, 0.5, seed = 7L))
  }

  test("shouldPerformMajorCompaction fixtures (due, fresh, single-file skip)") {
    val day = 86400000L
    val period = 7 * day
    val now = 100 * day
    def due(times: Long*) = Compactions.shouldPerformMajorCompaction(
      times, now, period, jitterPct = 0)
    assert(due(now - 8 * day, now - 1 * day)) // oldest past the deadline
    assert(!due(now - 6 * day, now - day)) // all files fresh
    assert(!due()) // empty store
    assert(!Compactions.shouldPerformMajorCompaction(
      Seq(now - 100 * day), now, periodMillis = 0)) // disabled
    // single file, already a major output, no TTL-expired content: skip
    assert(!Compactions.shouldPerformMajorCompaction(
      Seq(now - 8 * day), now, period, 0, 0L,
      singleFileIsMajorResult = true,
      singleFileMinTimestamp = Some(now - 10 * day)))
    // same but the content HAS outlived the TTL: rewrite reclaims it
    assert(Compactions.shouldPerformMajorCompaction(
      Seq(now - 8 * day), now, period, 0, 0L,
      singleFileIsMajorResult = true,
      singleFileMinTimestamp = Some(now - 10 * day),
      ttlMillis = 9 * day))
    // single file that is NOT a prior major output always rewrites
    assert(Compactions.shouldPerformMajorCompaction(
      Seq(now - 8 * day), now, period, 0, 0L))
  }

  test("compactionChore walks a store through minor -> major -> clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("chore").toString
    // 5 similar-size files: the exploring window [all 5] qualifies
    for (i <- 0 until 5) {
      val tmp = java.nio.file.Files.createTempDirectory(s"ch$i").toString
      val df = (0 until 20)
        .map(j => (f"r${j * 5 + i}%05d", "d", "q", 100L, "Put", s"v$i-$j"))
        .toDF("row", "family", "qualifier", "ts", "type", "value")
      HFiles.export(df, numRegions = 1, outPath = tmp)
      fsOf(dir).rename(new org.apache.hadoop.fs.Path(s"$tmp/part-00000.hfile"),
        new org.apache.hadoop.fs.Path(f"$dir/part-$i%05d.hfile"))
    }
    val day = 86400000L
    val wall = System.currentTimeMillis()
    // pass 1: the ladder needs a minor — the chore requests it first
    assert(Compactions.compactionChore(spark, dir, now = wall) == "minor(5)")
    // pass 2: one fresh file, nothing due
    assert(Compactions.compactionChore(spark, dir, now = wall) == "clean")
    // pass 3, 8 days on: the timed major fires (jitter off for
    // determinism) — the sole file is a MINOR output, not a major
    // result, so the single-file short-circuit does NOT apply
    assert(Compactions.compactionChore(spark, dir, now = wall + 8 * day,
      jitterPct = 0) == "major")
    // pass 4: NOW the sole file carries MAJOR_COMPACTION_KEY and has
    // no TTL-expired content — the short-circuit skips the rewrite
    assert(Compactions.compactionChore(spark, dir, now = wall + 16 * day,
      jitterPct = 0) == "clean")
    // ...unless the content outlived a TTL: then the major reclaims
    assert(Compactions.compactionChore(spark, dir, now = wall + 16 * day,
      jitterPct = 0, ttlMillis = 1L) == "major")
    assert(HFiles.importCells(spark, dir).count() == 100)
    // FIFO-policy store: the chore drops expired files instead
    val fdir = java.nio.file.Files.createTempDirectory("chorefifo").toString
    for (i <- 0 until 2) {
      val tmp = java.nio.file.Files.createTempDirectory(s"cf$i").toString
      val df = Seq((f"r$i%05d", "d", "q", (i + 1) * 100L, "Put", s"v$i"))
        .toDF("row", "family", "qualifier", "ts", "type", "value")
      HFiles.export(df, numRegions = 1, outPath = tmp)
      fsOf(fdir).rename(new org.apache.hadoop.fs.Path(s"$tmp/part-00000.hfile"),
        new org.apache.hadoop.fs.Path(f"$fdir/part-$i%05d.hfile"))
    }
    // now=400, ttl=250: cutoff 150 — file 0 (maxTs 100) drops, file 1
    // (maxTs 200) survives
    assert(Compactions.compactionChore(spark, fdir, now = 400L,
      fifoTtlMillis = Some(250L)) == "fifo(1)")
    assert(Compactions.compactionChore(spark, fdir, now = 400L,
      fifoTtlMillis = Some(250L)) == "clean")
  }

  test("timed major executes, marks its output, then short-circuits on it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("timedmajor").toString
    for (i <- 0 until 3) {
      val tmp = java.nio.file.Files.createTempDirectory(s"tm$i").toString
      val df = (0 until 10)
        .map(j => (f"r${j * 3 + i}%05d", "d", "q", 100L, "Put", s"v$i-$j"))
        .toDF("row", "family", "qualifier", "ts", "type", "value")
      HFiles.export(df, numRegions = 1, outPath = tmp)
      fsOf(dir).rename(new org.apache.hadoop.fs.Path(s"$tmp/part-00000.hfile"),
        new org.apache.hadoop.fs.Path(f"$dir/part-$i%05d.hfile"))
    }
    val day = 86400000L
    val wall = System.currentTimeMillis()
    // not yet due: files were just written
    assert(Compactions.majorCompactIfDue(spark, dir, now = wall,
      jitterPct = 0).isEmpty)
    // 8 days on: due — the whole ladder merges into one MAJOR output
    val r1 = Compactions.majorCompactIfDue(spark, dir, now = wall + 8 * day,
      jitterPct = 0)
    assert(r1.contains("part-00000.hfile"))
    val one = fsOf(dir)
      .globStatus(new org.apache.hadoop.fs.Path(dir, "part-*.hfile"))
    assert(one.length == 1)
    // the output carries MAJOR_COMPACTION_KEY=true (StoreFileWriter
    // .appendMetadata) — read it back through the public codec API
    val info = {
      val in = fsOf(dir).open(one.head.getPath)
      try {
        val pread: graft.codec.HFileV3.PRead = (off, n) => {
          val buf = new Array[Byte](n); in.readFully(off, buf); buf
        }
        val tr = graft.codec.HFileV3.readTrailer(pread(
          one.head.getLen - graft.codec.HFileV3.TrailerSize,
          graft.codec.HFileV3.TrailerSize))
        graft.codec.HFileV3.readFileInfo(pread, tr)
      } finally in.close()
    }
    assert(info.get("MAJOR_COMPACTION_KEY").exists(v => v(0) != 0))
    // ANOTHER 8 days on: the sole file is a fresh major output with no
    // TTL-expired content — the single-file short-circuit skips it
    assert(Compactions.majorCompactIfDue(spark, dir, now = wall + 16 * day,
      jitterPct = 0).isEmpty)
    // but once the content has outlived a TTL the rewrite reclaims it
    assert(Compactions.majorCompactIfDue(spark, dir, now = wall + 16 * day,
      jitterPct = 0, ttlMillis = 1L).isDefined)
    assert(HFiles.importCells(spark, dir).count() == 30)
  }

  test("a 17-file ladder trips the blocking-file stuck hatch end-to-end") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stuckstore").toString
    val names = (0 until 17).map(i => f"part-$i%05d.hfile")
    names.zipWithIndex.foreach { case (n, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"stk$i").toString
      val df = Seq((f"r$i%05d", "d", "q", 1L, "Put", s"v$i"))
        .toDF("row", "family", "qualifier", "ts", "type", "value")
      HFiles.export(df, numRegions = 1, outPath = tmp)
      fsOf(dir).rename(new org.apache.hadoop.fs.Path(s"$tmp/part-00000.hfile"),
        new org.apache.hadoop.fs.Path(s"$dir/$n"))
    }
    // geometric logical ladder (4^16 .. 4^0, oldest largest): EVERY
    // window fails the ratio check, so normal exploring selects
    // nothing — only the blocking-file count (17 >= 16) reaches the
    // stuck fallback, which rewrites the smallest window seen
    val logical = names.zipWithIndex
      .map { case (n, i) => n -> (1L << (2 * (16 - i))) }.toMap
    val selected = Compactions.minorCompact(spark, dir, K,
      logicalSizes = Some(logical))
    assert(selected == names.takeRight(3))
    val left = fsOf(dir)
      .globStatus(new org.apache.hadoop.fs.Path(dir, "part-*.hfile"))
      .map(_.getPath.getName).sorted
    assert(left.length == 15 && left.contains("part-00014.hfile"))
    assert(HFiles.importCells(spark, dir).count() == 17)
  }

  private def fileInfoOf(dir: String, name: String): Map[String, Array[Byte]] = {
    val st = fsOf(dir).getFileStatus(new org.apache.hadoop.fs.Path(dir, name))
    val in = fsOf(dir).open(st.getPath)
    try {
      val pread: graft.codec.HFileV3.PRead = (off, n) => {
        val buf = new Array[Byte](n); in.readFully(off, buf); buf
      }
      val tr = graft.codec.HFileV3.readTrailer(pread(
        st.getLen - graft.codec.HFileV3.TrailerSize,
        graft.codec.HFileV3.TrailerSize))
      graft.codec.HFileV3.readFileInfo(pread, tr)
    } finally in.close()
  }

  test("compaction pressure and the pressure-aware throughput budget") {
    val k = Knobs(minFiles = 3, blockingFiles = 16)
    // DefaultStoreFileManager.getCompactionPressure: 0 at/under min,
    // 1.0 at blocking, linear between, >1 past it
    assert(Compactions.compactionPressure(2, k) == 0.0)
    assert(Compactions.compactionPressure(3, k) == 0.0)
    assert(Compactions.compactionPressure(16, k) == 1.0)
    assert(math.abs(Compactions.compactionPressure(9, k)
      - 6.0 / 13) < 1e-12)
    assert(Compactions.compactionPressure(20, k) > 1.0)
    // tune(): unlimited past blocking, off-peak cap, else linear
    // between 50 and 100 MB/s
    val mb = 1024L * 1024
    assert(Compactions.compactionThroughputLimit(1.1) == Double.MaxValue)
    assert(Compactions.compactionThroughputLimit(0.0) == 50.0 * mb)
    assert(Compactions.compactionThroughputLimit(1.0) == 100.0 * mb)
    assert(Compactions.compactionThroughputLimit(0.5) == 75.0 * mb)
    assert(Compactions.compactionThroughputLimit(0.5, isOffPeak = true)
      == Long.MaxValue.toDouble)
    assert(Compactions.compactionThroughputLimit(0.5, isOffPeak = true,
      offPeakLimit = 200 * mb) == 200.0 * mb)
    // stripe form: 2.0 past the store-wide blocking count; per-stripe
    // normalization with the L0 presence delta; clamp at 1.0
    import graft.flow.StripeStore
    assert(StripeStore.compactionPressure(5, Seq(6, 6, 6)) == 2.0)
    assert(StripeStore.compactionPressure(0, Nil) == 0.0)
    // blocking 16 over 2 stripes = 8 per stripe; min 4: (6-4)/(8-4)
    assert(StripeStore.compactionPressure(0, Seq(6, 5)) == 0.5)
    // an L0 file adds one to every stripe's count
    assert(StripeStore.compactionPressure(1, Seq(6, 5)) == 0.75)
    // an over-share stripe clamps to 1.0 (store not actually blocked)
    assert(StripeStore.compactionPressure(0, Seq(9, 1)) == 1.0)
  }

  test("off-peak max-compact-size admits the window the peak cap rejects") {
    // same ladder, window sum 110: the peak cap (100) rejects it, the
    // off-peak cap (200) admits it — getMaxCompactSize(mayUseOffpeak)
    val k2 = Knobs(minFiles = 3, maxFiles = 5, ratio = 1.0,
      maxCompactSize = 100, offPeakMaxCompactSize = 200)
    val v = IndexedSeq[Long](40, 40, 30)
    assert(Compactions.exploringSelect(v, k2).isEmpty)
    assert(Compactions.exploringSelect(v, k2, isOffPeak = true)
      .map(v(_)) == Seq(40L, 40L, 30L))
    // -1 (default) inherits the peak cap: off-peak changes nothing
    val k3 = k2.copy(offPeakMaxCompactSize = -1L)
    assert(Compactions.exploringSelect(v, k3, isOffPeak = true).isEmpty)
  }

  test("heterogeneous-storage window policies match the reference fixtures") {
    import Compactions.{DtKnobs, boundariesStoragePolicyForMajor,
      boundariesStoragePolicyForMinor, windowStoragePolicy}
    // TestDateTieredCompactionPolicyHeterogeneousStorage config: base
    // window 6, 4/tier, max tier age 100, hot age 6, warm age 12
    val dt = DtKnobs(baseWindowMillis = 6, windowsPerTier = 4,
      maxTierAgeMillis = 100, incomingWindowMin = 3,
      window = Knobs(minFiles = 2, maxFiles = 12, ratio = 1.2),
      storagePolicyEnable = true, hotWindowAgeMillis = 6,
      warmWindowAgeMillis = 12)
    // testIncomingWindowHot: window 12 at now 16 -> ALL_SSD
    assert(windowStoragePolicy(16, 12, dt) == "ALL_SSD")
    // testNotIncomingWindowWarm: window 6 at now 16 -> ONE_SSD
    assert(windowStoragePolicy(16, 6, dt) == "ONE_SSD")
    // testNotIncomingWindowAndIsHot: window 6 at now 12 -> ALL_SSD
    assert(windowStoragePolicy(12, 6, dt) == "ALL_SSD")
    // testColdWindow: window 6 at now 22 -> the cold policy ("HOT" is
    // HDFS's name for the disk tier)
    assert(windowStoragePolicy(22, 6, dt) == "HOT")
    // testRatioT0: single-output minor keys its policy at MIN_VALUE
    assert(boundariesStoragePolicyForMinor(singleOutput = true, 6, 16, dt)
      == Map(Long.MinValue -> "ONE_SSD"))
    assert(boundariesStoragePolicyForMinor(singleOutput = false, 12, 16, dt)
      == Map(12L -> "ALL_SSD"))
    // testMajorCompation: the full boundary walk at now=161
    val bounds = Compactions.dateTieredBoundariesForMajor(0L, 161L, dt)
    assert(bounds == Seq(Long.MinValue, 24L, 48L, 72L, 96L, 120L, 144L,
      150L, 156L))
    assert(boundariesStoragePolicyForMajor(bounds, 161L, dt) == Map(
      Long.MinValue -> "HOT", 24L -> "HOT", 48L -> "HOT", 72L -> "HOT",
      96L -> "HOT", 120L -> "HOT", 144L -> "HOT", 150L -> "ONE_SSD",
      156L -> "ALL_SSD"))
    // feature off: no policies at all
    assert(boundariesStoragePolicyForMajor(bounds, 161L,
      dt.copy(storagePolicyEnable = false)).isEmpty)
  }

  test("major outputs record their window's STORAGE_POLICY in FILE_INFO") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dtsp").toString
    val dt = Compactions.DtKnobs(baseWindowMillis = 6, windowsPerTier = 4,
      maxTierAgeMillis = 1000, incomingWindowMin = 3,
      storagePolicyEnable = true, hotWindowAgeMillis = 6,
      warmWindowAgeMillis = 12)
    // one cold-window file (ts 2) and one hot-window file (ts 20-21)
    Seq((Seq(2L), 0), (Seq(20L, 21L), 1)).foreach { case (tss, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"dtsp$i").toString
      val df = tss.zipWithIndex
        .map { case (ts, j) => (f"r$i$j%04d", "d", "q", ts, "Put", s"v$i$j") }
        .toDF("row", "family", "qualifier", "ts", "type", "value")
      HFiles.export(df, numRegions = 1, outPath = tmp)
      fsOf(dir).rename(new org.apache.hadoop.fs.Path(s"$tmp/part-00000.hfile"),
        new org.apache.hadoop.fs.Path(f"$dir/part-$i%05d.hfile"))
    }
    val bounds = Compactions.dateTieredMajorCompact(spark, dir, dt, now = 22L)
    assert(bounds == Seq(Long.MinValue, 6L, 12L, 18L))
    // window order: part-00000 = the MIN_VALUE (cold) window, the last
    // output = the [18, 24) hot window
    val names = fsOf(dir)
      .globStatus(new org.apache.hadoop.fs.Path(dir, "part-*.hfile"))
      .map(_.getPath.getName).sorted
    def pol(n: String): String = new String(
      fileInfoOf(dir, n)("STORAGE_POLICY"), "UTF-8")
    assert(pol(names.head) == "HOT")
    assert(pol(names.last) == "ALL_SSD")
    assert(HFiles.importCells(spark, dir).count() == 3)
    // feature off: no STORAGE_POLICY entry lands
    val dir2 = java.nio.file.Files.createTempDirectory("dtsp2").toString
    val df = Seq(("r0", "d", "q", 2L, "Put", "v")).toDF(
      "row", "family", "qualifier", "ts", "type", "value")
    val tmp2 = java.nio.file.Files.createTempDirectory("dtsp2f").toString
    HFiles.export(df, numRegions = 1, outPath = tmp2)
    fsOf(dir2).rename(new org.apache.hadoop.fs.Path(s"$tmp2/part-00000.hfile"),
      new org.apache.hadoop.fs.Path(s"$dir2/part-00000.hfile"))
    Compactions.dateTieredMajorCompact(spark, dir2,
      dt.copy(storagePolicyEnable = false), now = 22L)
    val n2 = fsOf(dir2)
      .globStatus(new org.apache.hadoop.fs.Path(dir2, "part-*.hfile"))
      .head.getPath.getName
    assert(!fileInfoOf(dir2, n2).contains("STORAGE_POLICY"))
  }

  test("date-tiered timed major: trigger fixtures and the windowed chore walk") {
    import Compactions.{DtFile, DtKnobs}
    val dt = DtKnobs(baseWindowMillis = 6, windowsPerTier = 4,
      maxTierAgeMillis = 1000, incomingWindowMin = 3)
    def due(files: DtFile*) = Compactions.dateTieredShouldPerformMajorCompaction(
      files, now = 1000L, dt, periodMillis = 10, jitterPct = 0)
    val fIncoming = DtFile(createTime = 100, minTs = 997, maxTs = 999,
      isMajorResult = true)
    val fOlder = DtFile(createTime = 100, minTs = 990, maxTs = 995,
      isMajorResult = true)
    // one major output per window: nothing to re-window
    assert(!due(fIncoming, fOlder))
    // deadline not yet passed: never
    assert(!Compactions.dateTieredShouldPerformMajorCompaction(
      Seq(fIncoming.copy(isMajorResult = false, createTime = 995)),
      now = 1000L, dt, periodMillis = 10, jitterPct = 0))
    // a non-major (or bulk-loaded) file forces the re-window
    assert(due(fIncoming.copy(isMajorResult = false), fOlder))
    assert(due(fIncoming.copy(isBulkLoad = true), fOlder))
    // a file straddling a window boundary forces it
    assert(due(fIncoming, fOlder, DtFile(100, 985, 992, isMajorResult = true)))
    // two files sharing a window force it
    assert(due(fIncoming, fIncoming.copy(minTs = 998)))
    // TTL-expired content forces it
    assert(Compactions.dateTieredShouldPerformMajorCompaction(
      Seq(fIncoming, fOlder), now = 1000L, dt, periodMillis = 10,
      jitterPct = 0, ttlMillis = 8))

    // physical walk: two un-marked single-window files, no minor
    // possible -> the chore runs the WINDOWED major (never the
    // single-file ratio major), marks every window output, and the
    // next pass is clean
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dtchore").toString
    val day = 86400000L
    val wall = System.currentTimeMillis()
    val now = wall + 8 * day
    val t0 = (now / 1000L) * 1000L
    // maxTierAge 3500 < 4 windows blocks tier promotion whatever the
    // wall clock's div position — window widths stay deterministic
    val pdt = DtKnobs(baseWindowMillis = 1000L, windowsPerTier = 4,
      maxTierAgeMillis = 3500L, incomingWindowMin = 30)
    Seq((Seq(t0 - 3000, t0 - 2800), 0), (Seq(t0 - 1900, t0 - 1800), 1))
      .foreach { case (tss, i) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"dtc$i").toString
        val df = tss.zipWithIndex
          .map { case (ts, j) => (f"r$i$j%04d", "d", "q", ts, "Put", s"v$i$j") }
          .toDF("row", "family", "qualifier", "ts", "type", "value")
        HFiles.export(df, numRegions = 1, outPath = tmp)
        fsOf(dir).rename(new org.apache.hadoop.fs.Path(s"$tmp/part-00000.hfile"),
          new org.apache.hadoop.fs.Path(f"$dir/part-$i%05d.hfile"))
      }
    assert(Compactions.compactionChore(spark, dir, now = now, dt = Some(pdt),
      jitterPct = 0) == "major")
    val names = fsOf(dir)
      .globStatus(new org.apache.hadoop.fs.Path(dir, "part-*.hfile"))
      .map(_.getPath.getName).sorted
    assert(names.length == 2, "one output per populated window")
    names.foreach(n => assert(
      fileInfoOf(dir, n).get("MAJOR_COMPACTION_KEY").exists(_(0) != 0)))
    // re-windowed + marked: the next pass has nothing to do
    assert(Compactions.compactionChore(spark, dir, now = now, dt = Some(pdt),
      jitterPct = 0) == "clean")
    assert(HFiles.importCells(spark, dir).count() == 4)
  }

  test("FIFO sanity checks reject FOREVER TTL, min-versions, low blocking count") {
    // TestFIFOCompactionPolicy.testSanityCheck{TTL,MinVersion,
    // BlockingStoreFiles}: the reference rejects the table descriptor
    // at create time with these exact complaints
    val ttlOk = 86400000L
    Compactions.fifoSanityCheck(ttlOk) // accepts
    val e1 = intercept[IllegalArgumentException] {
      Compactions.fifoSanityCheck(Long.MaxValue)
    }
    assert(e1.getMessage.contains("Default TTL is not supported"))
    val e2 = intercept[IllegalArgumentException] {
      Compactions.fifoSanityCheck(ttlOk, minVersions = 1)
    }
    assert(e2.getMessage.contains("MIN_VERSION > 0 is not supported for FIFO compaction"))
    val e3 = intercept[IllegalArgumentException] {
      Compactions.fifoSanityCheck(ttlOk, blockingFiles = 10)
    }
    assert(e3.getMessage.contains("Blocking file count 'hbase.hstore.blockingStoreFiles'"))
    assert(e3.getMessage.contains("is below recommended minimum of 1000 for column family"))
  }

  test("FIFO verdict: missing TIMERANGE on a NON-empty file never drops") {
    // FIFOCompactionPolicy.isEmptyStoreFile: empty == getEntries()==0,
    // NOT missing-TIMERANGE — a foreign/legacy file without the entry
    // has unknown age and must survive (dropping it is data loss)
    def tr(min: Long, max: Long) = Map("TIMERANGE" ->
      java.nio.ByteBuffer.allocate(16).putLong(min).putLong(max).array())
    // non-empty, no TIMERANGE: KEEP regardless of ttl/now
    assert(!Compactions.fifoExpired(Map.empty, entryCount = 5,
      ttlMillis = 1, now = Long.MaxValue))
    // empty file: drops even without TIMERANGE and with TTL unset
    assert(Compactions.fifoExpired(Map.empty, entryCount = 0,
      ttlMillis = Long.MaxValue, now = 0))
    // TIMERANGE present: the TTL cutoff decides
    assert(Compactions.fifoExpired(tr(0, 50), 5, ttlMillis = 100, now = 1000))
    assert(!Compactions.fifoExpired(tr(0, 50), 5, ttlMillis = 100, now = 120))
    assert(!Compactions.fifoExpired(tr(0, 50), 5, Long.MaxValue, Long.MaxValue))
  }

  test("FIFO compaction drops an empty store file, keeps live neighbors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fifoempty").toString
    val df = (0 until 10)
      .map(j => (f"r$j%05d", "d", "q", 400L, "Put", s"v$j"))
      .toDF("row", "family", "qualifier", "ts", "type", "value")
    val tmp = java.nio.file.Files.createTempDirectory("fifoe0").toString
    HFiles.export(df, numRegions = 1, outPath = tmp)
    fsOf(dir).rename(new org.apache.hadoop.fs.Path(s"$tmp/part-00000.hfile"),
      new org.apache.hadoop.fs.Path(s"$dir/part-00000.hfile"))
    // an empty flush: entryCount 0, no TIMERANGE written
    val out = fsOf(dir).create(
      new org.apache.hadoop.fs.Path(s"$dir/part-00001.hfile"), true)
    try { graft.codec.HFileV3.write(out,
      Iterator.empty[graft.codec.HFileV3.HCell], 65536); () }
    finally out.close()
    val dropped = Compactions.fifoCompact(spark, dir, ttlMillis = 250, now = 500)
    assert(dropped == Seq("part-00001.hfile"))
    assert(HFiles.importCells(spark, dir).count() == 10)
  }

  test("TIMERANGE FILE_INFO entry roundtrips; PB-magic form also parses") {
    import graft.codec.HFileV3
    val cells = Seq(5L, 42L, 7L).zipWithIndex.map { case (ts, i) =>
      HFileV3.HCell(f"r$i%03d".getBytes("UTF-8"), "d".getBytes("UTF-8"),
        "q".getBytes("UTF-8"), ts, HFileV3.TypePut, "v".getBytes("UTF-8"))
    }
    val bos = new java.io.ByteArrayOutputStream()
    HFileV3.write(bos, cells.iterator)
    val bytes = bos.toByteArray
    val tr = HFileV3.readTrailer(bytes.takeRight(4096))
    val fi = HFileV3.readFileInfo(bytes, tr)
    assert(HFileV3.parseTimeRange(fi).contains((5L, 42L)))
    // the pre-HBASE-21012 protobuf form: PBUF magic + uint64 from/to
    val pb = Array[Byte]('P', 'B', 'U', 'F', 0x08, 5, 0x10, 42)
    assert(HFileV3.parseTimeRange(Map("TIMERANGE" -> pb)).contains((5L, 42L)))
  }

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
