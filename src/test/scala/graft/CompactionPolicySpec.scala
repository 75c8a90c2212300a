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
}
