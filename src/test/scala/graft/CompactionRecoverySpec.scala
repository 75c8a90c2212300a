package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.flow.{Compactions, HFiles}
import graft.flow.Compactions.Knobs

/** Crash-safe compaction commit ([[Compactions.commitRewrite]] /
  * [[Compactions.healStore]]): every interruption point of the
  * stage → intent-marker → retire → land → clean protocol heals to a
  * whole store — before the marker the store is untouched (staging is
  * garbage), after it the commit rolls forward to exactly the
  * compacted result. The MobFiles main-store-swap lesson applied to
  * the flat-store rewrites. */
class CompactionRecoverySpec extends SparkSpec {

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A 5-file store, 99 cells each, disjoint rows per file. */
  private def buildStore(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("healstore").toString
    val fs = fsOf(dir)
    for (i <- 0 until 5) {
      val tmp = java.nio.file.Files.createTempDirectory(s"hf$i").toString
      val df = (0 until 99)
        .map(j => (f"r${j * 5 + i}%05d", "d", "q", 1L, "Put", s"v$i-$j-" + "x" * 50))
        .toDF("row", "family", "qualifier", "ts", "type", "value")
      HFiles.export(df, numRegions = 1, outPath = tmp)
      fs.rename(new Path(s"$tmp/part-00000.hfile"),
        new Path(f"$dir/part-$i%05d.hfile"))
    }
    dir
  }

  private val K = Knobs(minFiles = 3, maxFiles = 3, ratio = 1.2)

  private def population(dir: String): Set[String] = {
    import spark.implicits._
    HFiles.importCells(spark, dir).select("value").as[String].collect().toSet
  }

  test("normal commit leaves no protocol residue") {
    val dir = buildStore()
    val before = population(dir)
    val sel = Compactions.minorCompact(spark, dir, K)
    assert(sel.size == 3)
    val fs = fsOf(dir)
    assert(!fs.exists(new Path(dir, ".compact.tmp")))
    assert(!fs.exists(new Path(dir, ".compact.commit")))
    assert(fs.globStatus(new Path(dir, "*.retired")) == null ||
      fs.globStatus(new Path(dir, "*.retired")).isEmpty)
    assert(population(dir) == before)
  }

  /** Manufacture the post-stage state: merged output for files 1-3
    * staged in tmp under its final name, inputs still live. */
  private def stage(dir: String): (Seq[String], String) = {
    val fs = fsOf(dir)
    val inputs = (1 to 3).map(i => f"part-$i%05d.hfile")
    val files = inputs.map { n =>
      val st = fs.getFileStatus(new Path(dir, n))
      (st.getPath.toString, st.getLen)
    }
    val tmp = s"$dir/.compact.tmp"
    HFiles.export(HFiles.importFiles(spark, files), 1, tmp)
    fs.rename(new Path(s"$tmp/part-00000.hfile"),
      new Path(s"$tmp/${inputs.head}"))
    (inputs, tmp)
  }

  test("crash BEFORE the intent marker: staging is garbage, store untouched") {
    val dir = buildStore()
    val before = population(dir)
    stage(dir)
    assert(Compactions.healStore(spark, dir) == "dropped staging")
    val fs = fsOf(dir)
    assert(!fs.exists(new Path(dir, ".compact.tmp")))
    assert(fs.globStatus(new Path(dir, "part-*.hfile")).length == 5)
    assert(population(dir) == before)
  }

  test("crash AFTER the marker rolls forward from every interruption point") {
    for (interruption <- Seq("none", "half-retired", "half-landed")) {
      val dir = buildStore()
      val before = population(dir)
      val (inputs, tmp) = stage(dir)
      val fs = fsOf(dir)
      // the intent marker, exactly as commitRewrite writes it
      val out = fs.create(new Path(dir, ".compact.commit"), true)
      try out.write((Seq("O " + inputs.head) ++ inputs.map("R " + _))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
      interruption match {
        case "none" => // crash right after the marker landed
        case "half-retired" => // some inputs renamed, not all
          fs.rename(new Path(dir, inputs(1)),
            new Path(dir, inputs(1) + ".retired"))
        case "half-landed" => // all retired, output already moved in
          inputs.foreach(n =>
            fs.rename(new Path(dir, n), new Path(dir, n + ".retired")))
          fs.rename(new Path(s"$tmp/${inputs.head}"),
            new Path(dir, inputs.head))
      }
      assert(Compactions.healStore(spark, dir) == "rolled forward",
        interruption)
      assert(!fs.exists(new Path(dir, ".compact.tmp")), interruption)
      assert(!fs.exists(new Path(dir, ".compact.commit")), interruption)
      val names = fs.globStatus(new Path(dir, "part-*.hfile"))
        .map(_.getPath.getName).sorted.toSeq
      assert(names ==
        Seq("part-00000.hfile", "part-00001.hfile", "part-00004.hfile"),
        interruption)
      assert(population(dir) == before, interruption)
      // idempotent: a second heal is a no-op
      assert(Compactions.healStore(spark, dir) == "clean")
    }
  }

  test("stray retired files without a marker roll back") {
    val dir = buildStore()
    val before = population(dir)
    val fs = fsOf(dir)
    fs.rename(new Path(dir, "part-00002.hfile"),
      new Path(dir, "part-00002.hfile.retired"))
    assert(Compactions.healStore(spark, dir) == "rolled back")
    assert(population(dir) == before)
  }

  test("a compaction entered mid-crash heals first, then proceeds") {
    val dir = buildStore()
    val before = population(dir)
    val (inputs, _) = stage(dir)
    val fs = fsOf(dir)
    val out = fs.create(new Path(dir, ".compact.commit"), true)
    try out.write((Seq("O " + inputs.head) ++ inputs.map("R " + _))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    // minorCompact heals (rolls the pending commit forward) and then
    // runs its own selection over the healed 3-file ladder
    Compactions.minorCompact(spark, dir, K)
    assert(population(dir) == before)
    assert(!fs.exists(new Path(dir, ".compact.commit")))
  }
}
