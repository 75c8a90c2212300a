package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.flow.{HFiles, StripeStore}
import graft.flow.StripeStore.{BoundaryReq, SFile, SKnobs, SplitReq}

/** StripeCompactionPolicy twin ([[graft.flow.StripeStore]]): the
  * reference's TestStripeCompactionPolicy fixtures on the pure
  * selection (single-stripe quality choice, split-off, L0 selection
  * gates, initial-count estimation, expired-stripe merges), plus the
  * physical lifecycle — L0 flushes → initial stripes → boundary
  * distribution → read-back identity, with stripe membership carried
  * only by STRIPE_START_KEY/STRIPE_END_KEY FILE_INFO. */
class StripeStoreSpec extends SparkSpec {

  private def fs(sizes: Long*): IndexedSeq[SFile] =
    sizes.map(s => SFile(s, s, 10L)).toIndexedSeq

  private def stripes(ss: Seq[Long]*): IndexedSeq[IndexedSeq[SFile]] =
    ss.map(s => fs(s: _*)).toIndexedSeq

  private val noL0 = IndexedSeq.empty[SFile]

  // TestStripeCompactionPolicy.testSingleStripeCompaction config
  private val single = SKnobs(minFiles = 3, maxFiles = 4, ratio = 1.0,
    sizeToSplit = 1000)

  private def selSizes(req: Option[StripeStore.StripeReq],
      st: IndexedSeq[IndexedSeq[SFile]]): Seq[(Int, Long)] =
    req.get.files.map { case (lvl, i) => (lvl, st(lvl)(i).size) }

  test("single-stripe selection matches the reference fixtures") {
    def pick(ss: Seq[Long]*): Option[StripeStore.StripeReq] =
      StripeStore.selectSingleStripe(noL0, stripes(ss: _*), single,
        includeL0 = false, canDropDeletesWithoutL0 = false)
    // no compaction due to min files or ratio
    assert(pick(Seq(2), Seq(3, 3), Seq(5, 1)).isEmpty)
    val st2 = stripes(Seq(2), Seq(3, 3), Seq(5, 1, 1))
    assert(StripeStore.selectSingleStripe(noL0, st2, single, false, false).isEmpty)
    assert(StripeStore.needsSingleStripeCompaction(st2, single))
    // one stripe has a possible compaction
    val r3 = pick(Seq(2), Seq(3, 3), Seq(5, 4, 3))
    assert(selSizes(r3, stripes(Seq(2), Seq(3, 3), Seq(5, 4, 3))) ==
      Seq((2, 5L), (2, 4L), (2, 3L)))
    // several possible: most files retired wins
    val st4 = stripes(Seq(3, 2, 2), Seq(2, 2, 1), Seq(3, 2, 2, 1))
    assert(selSizes(pick(Seq(3, 2, 2), Seq(2, 2, 1), Seq(3, 2, 2, 1)), st4)
      .map(_._1).distinct == Seq(2))
    val st5 = stripes(Seq(5), Seq(3, 2, 2, 1), Seq(3, 2, 2))
    assert(selSizes(pick(Seq(5), Seq(3, 2, 2, 1), Seq(3, 2, 2)), st5)
      .map(_._1).distinct == Seq(1))
    // equal file count: smallest IO wins
    val st6 = stripes(Seq(3, 3, 3), Seq(3, 1, 2), Seq(3, 2, 2))
    assert(selSizes(pick(Seq(3, 3, 3), Seq(3, 1, 2), Seq(3, 2, 2)), st6)
      .map(_._1).distinct == Seq(1))
  }

  // testSplitOffStripe config: minFiles 2, split size 18, count 1.8
  private val splitK = SKnobs(minFiles = 2, maxFiles = 10, ratio = 1.2,
    sizeToSplit = 18, splitPartCount = 1.8)

  test("split-off-stripe fixtures: split target estimation and eligibility") {
    // not eligible under the default ratio
    assert(StripeStore.selectStripeCompaction(noL0,
      stripes(Seq(16, 2)), splitK, now = 100).isEmpty)
    // everything eligible at ratio 500: whole stripe splits in 2 × 10 kvs
    val loose = splitK.copy(ratio = 500)
    StripeStore.selectStripeCompaction(noL0, stripes(Seq(16, 2)), loose, 100) match {
      case Some(SplitReq(files, 0, 0, 2, 10L, true)) => assert(files.size == 2)
      case other => fail(s"unexpected: $other")
    }
    // split-off at the end and in the middle
    StripeStore.selectStripeCompaction(noL0,
      stripes(Seq(16, 1), Seq(16, 1), Seq(16, 1, 1)), loose, 100) match {
      case Some(SplitReq(_, 2, 2, 2, 10L, true)) =>
      case other => fail(s"unexpected: $other")
    }
    StripeStore.selectStripeCompaction(noL0,
      stripes(Seq(16, 1), Seq(16, 1, 1), Seq(16, 1)), loose, 100) match {
      case Some(SplitReq(_, 1, 1, 2, 10L, true)) =>
      case other => fail(s"unexpected: $other")
    }
    // larger split size: same stripe compacts alone instead
    StripeStore.selectStripeCompaction(noL0,
      stripes(Seq(16, 1), Seq(16, 1, 1), Seq(16, 1)),
      loose.copy(sizeToSplit = 19), 100) match {
      case Some(SplitReq(_, 1, 1, 1, Long.MaxValue, true)) =>
      case other => fail(s"unexpected: $other")
    }
  }

  test("drop-deletes eligibility follows L0 presence") {
    // no L0: whole-stripe rewrite may drop deletes
    StripeStore.selectStripeCompaction(noL0,
      stripes(Seq(1), Seq(9, 9)), splitK, 100) match {
      case Some(SplitReq(_, 1, 1, 2, 10L, true)) =>
      case other => fail(s"unexpected: $other")
    }
    // with L0 (below the L0 threshold): same selection, no major range
    StripeStore.selectStripeCompaction(fs(2, 2),
      stripes(Seq(1), Seq(9, 9)), splitK, 100) match {
      case Some(SplitReq(_, 1, 1, 2, 10L, false)) =>
      case other => fail(s"unexpected: $other")
    }
  }

  test("initial stripe count from L0 (estimateTargetKvs growth rule)") {
    val base = SKnobs(l0MinFiles = 2, sizeToSplit = 18, splitPartCount = 1.8)
    def run(k: SKnobs, l0: IndexedSeq[SFile]) =
      StripeStore.selectStripeCompaction(l0, IndexedSeq.empty, k, 100)
    run(base.copy(initialCount = 2), fs(8, 8, 8)) match {
      case Some(SplitReq(files, -1, -1, 2, 12L, true)) => assert(files.size == 3)
      case other => fail(s"unexpected: $other")
    }
    // too large for 2 parts: the multiplier grows to 3
    run(base.copy(initialCount = 2), fs(10, 10, 10)) match {
      case Some(SplitReq(_, -1, -1, 3, 10L, true)) =>
      case other => fail(s"unexpected: $other")
    }
    run(base.copy(initialCount = 6), fs(10, 10, 10)) match {
      case Some(SplitReq(_, -1, -1, 6, 5L, true)) =>
      case other => fail(s"unexpected: $other")
    }
  }

  test("L0 selection gates: all, size-capped, count-capped") {
    val st = stripes(Seq(5, 1, 1), Seq(3, 2, 2), Seq(3, 2, 2))
    // all 10 L0 files into the boundaries
    StripeStore.selectStripeCompaction(fs(Seq.fill(10)(10L): _*), st,
      SKnobs(l0MinFiles = 4), 100) match {
      case Some(BoundaryReq(files)) =>
        assert(files.size == 10 && files.forall(_._1 == -1))
      case other => fail(s"unexpected: $other")
    }
    // size cap: first files until the cumulative crosses maxCompactSize
    StripeStore.selectStripeCompaction(fs(Seq.fill(5)(50L): _*), st,
      SKnobs(l0MinFiles = 4, maxCompactSize = 100), 100) match {
      case Some(BoundaryReq(files)) => assert(files == Seq((-1, 0), (-1, 1)))
      case other => fail(s"unexpected: $other")
    }
    // count cap: maxFiles bounds the exploring window
    StripeStore.selectStripeCompaction(fs(Seq.fill(10)(10L): _*), st,
      SKnobs(l0MinFiles = 4, maxFiles = 6, maxCompactSize = 1000), 100) match {
      case Some(BoundaryReq(files)) =>
        assert(files == (0 until 6).map((-1, _)))
      case other => fail(s"unexpected: $other")
    }
  }

  test("expired stripe merges: longest run, lone-stripe neighbor pull") {
    val now = 1000002L
    val k = SKnobs(minFiles = 4, ttlMillis = 1000000L)
    val expired = Seq.fill(2)(SFile(10, 10, 1L)) // maxTs < now - ttl
    val live = Seq.fill(2)(SFile(10, 10, 3L))
    def st(xs: Seq[SFile]*): IndexedSeq[IndexedSeq[SFile]] =
      xs.map(_.toIndexedSeq).toIndexedSeq
    def merge(xs: Seq[SFile]*) =
      StripeStore.selectStripeCompaction(noL0, st(xs: _*), k, now)
    merge(expired, expired, expired) match {
      case Some(SplitReq(_, 0, 2, 1, Long.MaxValue, true)) =>
      case other => fail(s"unexpected: $other")
    }
    assert(merge(live, live, live).isEmpty)
    merge(live, expired, live) match { // lone stripe pulls right neighbor
      case Some(SplitReq(_, 1, 2, 1, Long.MaxValue, true)) =>
      case other => fail(s"unexpected: $other")
    }
    merge(live, expired, live, expired, expired, live) match {
      case Some(SplitReq(_, 3, 4, 1, Long.MaxValue, true)) =>
      case other => fail(s"unexpected: $other")
    }
    merge(expired, expired, live, expired, Seq(expired.head, live.head)) match {
      case Some(SplitReq(_, 0, 1, 1, Long.MaxValue, true)) =>
      case other => fail(s"unexpected: $other")
    }
    // rightmost lone expired stripe cannot merge → falls through (here: None)
    assert(merge(live, live, expired).isEmpty)
  }

  test("physical lifecycle: flushes -> initial stripes -> boundary distribution -> identity") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stripestore").toString
    def cellsOf(flush: Int) = (0 until 120)
      .map(j => (f"r${j}%05d", "d", "q", flush.toLong, "Put", s"v$flush-$j-" + "x" * 40))
      .toDF("row", "family", "qualifier", "ts", "type", "value")
    // 3 flushes: 360 cells over 120 rows
    (1 to 3).foreach(i => StripeStore.stripeFlush(cellsOf(i), dir))
    val k = SKnobs(l0MinFiles = 3, minFiles = 3, initialCount = 3,
      sizeToSplit = Long.MaxValue / 4)

    // round 1: L0 -> 3 initial stripes, kv-balanced at row boundaries
    val r1 = StripeStore.stripeCompact(spark, dir, k, now = 100L)
    assert(r1.exists { case SplitReq(f, -1, -1, 3, 120L, true) => f.size == 3
                       case _ => false })
    val l1 = StripeStore.loadLayout(spark, dir)
    assert(l1.l0.isEmpty && l1.stripes.size == 3)
    // contiguity: open edges, chained boundaries at row switches
    assert(l1.stripes.head.head.start.isEmpty && l1.stripes.last.head.end.isEmpty)
    assert(java.util.Arrays.equals(l1.stripes(0).head.end, l1.stripes(1).head.start))
    assert(java.util.Arrays.equals(l1.stripes(1).head.end, l1.stripes(2).head.start))
    // 120 kvs per writer = 40 rows per stripe (3 cells per row)
    assert(new String(l1.stripes(0).head.end, UTF_8) == "r00040")
    assert(new String(l1.stripes(1).head.end, UTF_8) == "r00080")
    assert(l1.stripes.map(_.map(_.kvCount).sum) == Seq(120L, 120L, 120L))
    assert(HFiles.importCells(spark, dir, "{l0,stripe}-*.hfile").count() == 360)

    // round 2: more flushes distribute into the EXISTING boundaries
    (4 to 6).foreach(i => StripeStore.stripeFlush(cellsOf(i), dir))
    val before = l1.stripes.flatten.map(_.path.getName).toSet
    val r2 = StripeStore.stripeCompact(spark, dir, k, now = 100L)
    assert(r2.exists { case BoundaryReq(f) => f.forall(_._1 == -1)
                       case _ => false })
    val l2 = StripeStore.loadLayout(spark, dir)
    assert(l2.l0.isEmpty && l2.stripes.size == 3)
    // each stripe gained exactly one distribution file; originals untouched
    assert(l2.stripes.map(_.size) == Seq(2, 2, 2))
    assert(before.subsetOf(l2.stripes.flatten.map(_.path.getName).toSet))
    assert(l2.stripes.map(_.map(_.kvCount).sum) == Seq(240L, 240L, 240L))
    val back = HFiles.importCells(spark, dir, "{l0,stripe}-*.hfile")
    assert(back.count() == 720)
    assert(back.select(countDistinct(col("row"))).as[Long].head() == 120)
  }

  test("physical expired-stripe merge leaves an empty metadata carrier") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stripeexp").toString
    val dayMs = 86400000L
    def cellsAt(ts: Long) = (0 until 60)
      .map(j => (f"r${j}%05d", "d", "q", ts, "Put", s"v$ts-$j"))
      .toDF("row", "family", "qualifier", "ts", "type", "value")
    (1 to 2).foreach(_ => StripeStore.stripeFlush(cellsAt(1L * dayMs), dir))
    val k0 = SKnobs(l0MinFiles = 2, minFiles = 2, initialCount = 2,
      sizeToSplit = Long.MaxValue / 4)
    StripeStore.stripeCompact(spark, dir, k0, now = 2 * dayMs)
    assert(StripeStore.loadLayout(spark, dir).stripes.size == 2)
    // everything in the store is now older than the TTL: the expired
    // run merges to ONE stripe and the rewrite drops the expired cells
    val k1 = k0.copy(ttlMillis = 5L * dayMs)
    val now = 10L * dayMs
    val r = StripeStore.stripeCompact(spark, dir, k1, now)
    assert(r.exists { case SplitReq(_, 0, 1, 1, Long.MaxValue, true) => true
                      case _ => false })
    val l = StripeStore.loadLayout(spark, dir)
    assert(l.stripes.size == 1 && l.stripes.head.size == 1)
    assert(l.stripes.head.head.kvCount == 0L) // empty metadata carrier
    assert(l.stripes.head.head.start.isEmpty && l.stripes.head.head.end.isEmpty)
    assert(HFiles.importCells(spark, dir, "{l0,stripe}-*.hfile").count() == 0)
  }

  test("allFilesExpired counts empty files as expired (HBASE-21504 carve-out)") {
    val k = SKnobs(ttlMillis = 100L)
    val now = 1000L
    val expired = SFile(10, 5, maxTs = 1L)
    val emptyCarrier = SFile(0, 0, maxTs = Long.MinValue)
    val emptyButFresh = SFile(0, 0, maxTs = now) // empty NEVER blocks
    val live = SFile(10, 5, maxTs = now)
    // a stripe of [expired, empty] must trigger reclaim — the old
    // kvCount != 0 conjunct let one empty metadata carrier (which an
    // expired merge itself writes) permanently block expiry
    assert(StripeStore.hasExpiredStripes(
      IndexedSeq(IndexedSeq(expired, emptyCarrier)), k, now))
    assert(StripeStore.hasExpiredStripes(
      IndexedSeq(IndexedSeq(expired, emptyButFresh)), k, now))
    assert(!StripeStore.hasExpiredStripes(
      IndexedSeq(IndexedSeq(expired, live)), k, now))
    assert(!StripeStore.hasExpiredStripes(
      IndexedSeq(IndexedSeq(live, emptyCarrier)), k, now))
    // TTL unset: nothing expires, empty or not
    assert(!StripeStore.hasExpiredStripes(
      IndexedSeq(IndexedSeq(expired, emptyCarrier)),
      SKnobs(ttlMillis = Long.MaxValue), now))
  }

  test("stripeFlush allocates max+1 across holes left by subset L0 compactions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stripeflushgap").toString
    def cellsOf(flush: Int) = (0 until 5)
      .map(j => (f"r$j%05d", "d", "q", flush.toLong, "Put", s"v$flush-$j"))
      .toDF("row", "family", "qualifier", "ts", "type", "value")
    (1 to 3).foreach(i => StripeStore.stripeFlush(cellsOf(i), dir))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a subset compaction retired the MIDDLE file: hole in the ladder
    fs.delete(new org.apache.hadoop.fs.Path(dir, "l0-00001.hfile"), false)
    val survivorLen = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(dir, "l0-00002.hfile")).getLen
    val name = StripeStore.stripeFlush(cellsOf(4), dir)
    // count-based naming would have produced l0-00002 and silently
    // OVERWRITTEN the survivor (RawLocalFileSystem rename semantics)
    assert(name == "l0-00003.hfile")
    assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(dir,
      "l0-00002.hfile")).getLen == survivorLen)
    assert(HFiles.importCells(spark, dir, "l0-*.hfile").count() == 15)
  }

  test("BoundaryReq preserves a fully-consumed empty stripe's range metadata") {
    import graft.codec.HFileV3
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stripeboundary").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val split = "r00050"
    def writeStripe(name: String, cells: Iterator[HFileV3.HCell],
        start: Array[Byte], end: Array[Byte]): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
      try { HFileV3.write(out, cells, 65536, extraFileInfo = Seq(
        StripeStore.StripeStartKey -> start,
        StripeStore.StripeEndKey -> end)); () }
      finally out.close()
    }
    // stripe 0 [OPEN, r00050): ONE empty metadata carrier (the shape
    // an expired merge leaves behind); stripe 1 [r00050, OPEN): data
    writeStripe("stripe-00000.hfile", Iterator.empty,
      StripeStore.OpenKey, split.getBytes(UTF_8))
    writeStripe("stripe-00001.hfile",
      (50 until 100).iterator.map(j => HFileV3.HCell(
        f"r$j%05d".getBytes(UTF_8), "d".getBytes(UTF_8), "q".getBytes(UTF_8),
        1L, HFileV3.TypePut, s"s1-$j".getBytes(UTF_8))),
      split.getBytes(UTF_8), StripeStore.OpenKey)
    // one L0 flush whose rows ALL land in stripe 1's range
    StripeStore.stripeFlush((50 until 100)
      .map(j => (f"r$j%05d", "d", "q", 2L, "Put", s"l0-$j"))
      .toDF("row", "family", "qualifier", "ts", "type", "value"), dir)
    val layout = StripeStore.loadLayout(spark, dir)
    assert(layout.stripes.size == 2 && layout.l0.size == 1)
    // a boundary compaction consuming ALL of stripe 0 (the empty
    // carrier) + L0: range 0 receives no cells, so without the
    // needEmptyFile rule its metadata vanishes and the whole store
    // demotes to L0 on the next load
    StripeStore.execute(spark, dir, layout,
      BoundaryReq(Seq((0, 0), (-1, 0))), SKnobs(), now = 10L,
      blockSize = 65536)
    val after = StripeStore.loadLayout(spark, dir)
    assert(after.l0.isEmpty, "no demotion to L0")
    assert(after.stripes.size == 2, "boundary chain intact")
    assert(after.stripes(0).map(_.kvCount).sum == 0L)
    assert(new String(after.stripes(0).head.end, UTF_8) == split)
    assert(after.stripes(1).map(_.kvCount).sum == 100L)
    assert(HFiles.importCells(spark, dir, "{l0,stripe}-*.hfile").count() == 100)
  }
}
