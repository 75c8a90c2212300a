package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.functions._

import graft.flow.{HFiles, MobFiles, PWalFiles, ShippedConf}

/** A local filesystem under a PRIVATE scheme, registered only in the
  * DRIVER's Hadoop configuration (`fs.graftmarker.impl`). Any
  * executor-side open that builds a fresh `Configuration()` instead of
  * the shipped driver conf cannot resolve the scheme and fails — so a
  * distributed export/import completing through `graftmarker:` paths
  * PROVES every file open on the task side observed the driver's
  * settings (the credentials/endpoint-drop hazard, end to end). */
class MarkerFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftmarker"
  override def getUri: URI = URI.create("graftmarker:///")
}

class ShippedConfSpec extends SparkSpec {

  private def withMarkerFs[A](body: => A): A = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftmarker.impl", classOf[MarkerFileSystem].getName)
    // never cache: a cached instance created by the driver would mask
    // a fresh-Configuration bug on the executor side (shared JVM)
    hc.set("fs.graftmarker.impl.disable.cache", "true")
    try body
    finally {
      hc.unset("fs.graftmarker.impl")
      hc.unset("fs.graftmarker.impl.disable.cache")
    }
  }

  test("ShippedConf rebuilds the driver's entries on the task side") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("graft.test.marker", "sentinel-42")
    try {
      val bconf = ShippedConf.broadcast(spark)
      val seen = spark.sparkContext.parallelize(Seq(1, 2), 2)
        .map(_ => bconf.value.conf.get("graft.test.marker", "MISSING"))
        .collect().toSet
      assert(seen == Set("sentinel-42"))
    } finally hc.unset("graft.test.marker")
  }

  test("HFile export/import/pointGet run on a driver-conf-only filesystem") {
    withMarkerFs {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("markerhf").toString
      val out = s"graftmarker:$dir/hf"
      val cells = (0 until 300).map(i =>
        (f"r$i%05d", "d", "q0", 1L, "Put", s"v$i"))
        .toDF("row", "family", "qualifier", "ts", "type", "value")
      HFiles.export(cells, numRegions = 3, outPath = out)
      val back = HFiles.importCells(spark, out)
      assert(back.count() == 300)
      val got = HFiles.pointGet(spark, out, Seq("r00007", "r00250"))
        .select("row", "value").as[(String, String)].collect().toMap
      assert(got == Map("r00007" -> "v7", "r00250" -> "v250"))
    }
  }

  test("PWAL export/import runs on a driver-conf-only filesystem") {
    withMarkerFs {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("markerwal").toString
      val out = s"graftmarker:$dir/wal"
      val wal = (0 until 200).map(i =>
        (f"r$i%05d", "d", "q0", 1000L + i, "Put", s"v$i"))
        .toDF("row", "family", "qualifier", "ts", "type", "value")
      PWalFiles.export(wal, numSegments = 2, outPath = out)
      val back = PWalFiles.importEntries(spark, out)
      assert(back.count() == 200)
      assert(back.select("value").as[String].collect().toSet ==
        (0 until 200).map(i => s"v$i").toSet)
    }
  }

  test("MOB export/resolve/compaction/sweep run on a driver-conf-only filesystem") {
    withMarkerFs {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("markermob").toString
      val out = s"graftmarker:$dir/mob"
      val cells = (0 until 150).map { i =>
        val v = if (i % 3 == 0) "X" * 40 else s"small-$i"
        (f"r$i%05d", "d", "q0", 86400000L + i, "Put", v)
      }.toDF("row", "family", "qualifier", "ts", "type", "value")
      MobFiles.export(cells, threshold = 30, numRegions = 2, outPath = out,
        table = "tm", numMobBuckets = 2)
      val resolved = MobFiles.importResolved(spark, out, table = "tm")
      assert(resolved.count() == 150)
      assert(resolved.filter(col("mob")).count() == 50)
      assert(resolved.filter(col("value").startsWith("!MOB-MISS")).count() == 0)
      val newFiles = MobFiles.compactMobGenerations(spark, out, table = "tm",
        policy = "MONTHLY")
      assert(newFiles.nonEmpty)
      MobFiles.sweepUnreferencedMobFiles(spark, out, "tm")
      assert(MobFiles.importResolved(spark, out, table = "tm")
        .filter(col("value").startsWith("!MOB-MISS")).count() == 0)
    }
  }
}
