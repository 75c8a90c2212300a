package graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.codec.HFileV3
import graft.codec.HFileV3.HCell
import graft.flow.MobFiles

/** MOB byte-format contract ([[graft.flow.MobFiles]] + HFileV3 tags):
  * KeyValue tag wire roundtrip, MobFileName shape, ref-cell value
  * layout and tag types, mob-dir layout, resolved-import identity on a
  * real fixture, MOB_CELLS_COUNT audit, and dangling-ref surfacing.
  */
class HFileMobSpec extends SparkSpec {

  test("tag wire format roundtrips; tagged cells survive write/read") {
    val tags = HFileV3.tagBytes(Seq(
      (MobFiles.MobRefTagType, Array.emptyByteArray),
      (MobFiles.MobTableNameTagType, "tbl".getBytes(UTF_8))))
    val parsed = HFileV3.parseTags(tags)
    assert(parsed.map(_._1) == Seq(5.toByte, 6.toByte))
    assert(parsed(0)._2.isEmpty)
    assert(new String(parsed(1)._2, UTF_8) == "tbl")

    val cells = (0 until 50).map { i =>
      HCell(f"r$i%04d".getBytes(UTF_8), "d".getBytes(UTF_8),
        "q".getBytes(UTF_8), 1L, HFileV3.TypePut,
        s"v$i".getBytes(UTF_8),
        tags = if (i % 3 == 0) tags else Array.emptyByteArray)
    }
    val bos = new java.io.ByteArrayOutputStream()
    HFileV3.write(bos, cells.iterator, blockSize = 256, withTags = true)
    val back = HFileV3.readCells(bos.toByteArray).toSeq
    assert(back.size == cells.size)
    cells.zip(back).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.tags, b.tags))
      assert(java.util.Arrays.equals(a.value, b.value))
    }
    // a file declaring tags parses even when every section is empty
    val bos2 = new java.io.ByteArrayOutputStream()
    HFileV3.write(bos2, cells.map(_.copy(tags = Array.emptyByteArray)).iterator,
      blockSize = 256, withTags = true)
    assert(HFileV3.readCells(bos2.toByteArray).size == cells.size)
  }

  test("mob file names have the MobFileName shape") {
    // md5hex(startKey)[32] + yyyymmdd[8] + uuid[32] + "_" + regionName
    val n = MobFiles.mobFileName("t1", "d", "19700101", 3L)
    val (prefix, region) = n.splitAt(n.indexOf('_'))
    assert(prefix.length == 72)
    assert(prefix.slice(32, 40) == "19700101")
    assert(prefix.forall(c => c.isDigit || ('a' to 'f').contains(c)))
    assert(region == "_" + MobFiles.mobRegionName("t1"))
    // deterministic, and distinct across buckets/families/days
    assert(n == MobFiles.mobFileName("t1", "d", "19700101", 3L))
    assert(n != MobFiles.mobFileName("t1", "d", "19700101", 4L))
    assert(n != MobFiles.mobFileName("t1", "m", "19700101", 3L))
  }

  test("export splits at the threshold; import resolves to identity") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("mobspec").toString
    val cells = (0 until 400).map { i =>
      val v = if (i % 5 == 0) "X" * (40 + i % 20) else s"small-$i"
      (f"r$i%05d", "d", "q0", 1L, "Put", v)
    }.toDF("row", "family", "qualifier", "ts", "type", "value")
    MobFiles.export(cells, threshold = 30, numRegions = 3, outPath = out,
      table = "t1", numMobBuckets = 2)

    // main files hold ref cells whose value is [4B len][file name]
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mainFiles = fs.globStatus(new org.apache.hadoop.fs.Path(s"$out/main/part-*.hfile"))
    assert(mainFiles.nonEmpty)
    val mainCells = mainFiles.flatMap { st =>
      val in = fs.open(st.getPath)
      val bytes = new Array[Byte](st.getLen.toInt)
      try in.readFully(0, bytes) finally in.close()
      HFileV3.readCells(bytes).toSeq
    }
    val refs = mainCells.filter(c =>
      HFileV3.parseTags(c.tags).exists(_._1 == MobFiles.MobRefTagType))
    assert(refs.length == 80) // every i % 5 == 0
    refs.foreach { c =>
      val bb = ByteBuffer.wrap(c.value)
      val len = bb.getInt
      assert(len > 30)
      val fname = new String(c.value, 4, c.value.length - 4, UTF_8)
      assert(fname.indexOf('_') == 72)
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"${MobFiles.mobFamilyDir(out, "t1", "d")}/$fname")))
      // the table-name tag a snapshot clone would use
      val tbl = HFileV3.parseTags(c.tags)
        .find(_._1 == MobFiles.MobTableNameTagType).get._2
      assert(new String(tbl, UTF_8) == "t1")
    }

    // resolved import = identity, with mob provenance only on big values
    val resolved = MobFiles.importResolved(spark, out, table = "t1")
    assert(resolved.count() == 400)
    assert(resolved.filter(col("mob")).count() == 80)
    assert(resolved.filter(col("value").startsWith("!MOB-MISS")).count() == 0)
    val got = resolved.select("row", "value").as[(String, String)].collect().toMap
    assert(got("r00000") == "X" * 40)
    assert(got("r00001") == "small-1")

    // audit: declared MOB_CELLS_COUNT matches actual cells per file
    val audit = MobFiles.mobFileAudit(spark, out, table = "t1").collect()
    assert(audit.nonEmpty)
    audit.foreach(r => assert(r.getLong(1) == r.getLong(2)))
    assert(audit.map(_.getLong(1)).sum == 80L)

    // dangling ref: delete one mob file -> its refs surface as misses
    val victim = audit.head.getString(0)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"${MobFiles.mobFamilyDir(out, "t1", "d")}/$victim"), false)
    val broken = MobFiles.importResolved(spark, out, table = "t1")
    assert(broken.filter(col("value").startsWith("!MOB-MISS")).count() ==
      audit.head.getLong(1))
  }

  test("expired mob cleaner drops whole pre-cutoff days; TTL'd reads never miss") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("mobexp").toString
    // two flush days: day0 (epoch ms ~0) and day2 (epoch + 2 days)
    val day2Ms = 2L * 86400000L
    val cells = (0 until 200).map { i =>
      val ts = if (i < 100) 1000L + i else day2Ms + i
      (f"r$i%05d", "d", "q0", ts, "Put", "X" * 40)
    }.toDF("row", "family", "qualifier", "ts", "type", "value")
    MobFiles.export(cells, threshold = 30, numRegions = 2, outPath = out,
      table = "t2", numMobBuckets = 2)
    val before = MobFiles.mobFileAudit(spark, out, table = "t2").collect()
    val day0Files = before.map(_.getString(0)).filter(n =>
      n.substring(32, 40) == "19700101")
    assert(day0Files.nonEmpty && day0Files.length < before.length)

    // cutoff between the days: every 19700101 file goes, 19700103 stays
    val deleted = MobFiles.expiredMobFileCleaner(spark, out, "t2", "19700102")
    assert(deleted.sorted == day0Files.toSeq.sorted)
    val after = MobFiles.mobFileAudit(spark, out, table = "t2").collect()
    assert(after.length == before.length - day0Files.length)

    // a TTL'd read under the same cutoff never dereferences the
    // deleted files: refs to them are themselves expired
    val live = MobFiles.importResolved(spark, out, table = "t2")
      .filter(col("ts") >= day2Ms)
    assert(live.count() == 100)
    assert(live.filter(col("value").startsWith("!MOB-MISS")).count() == 0)
    // idempotent: nothing left before the cutoff
    assert(MobFiles.expiredMobFileCleaner(spark, out, "t2", "19700102").isEmpty)
  }

  test("unreferenced-mob sweep keeps exactly the files live refs name") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("mobsweep").toString
    // two days so the dropped half's mob files become fully
    // unreferenced (mob files are (family, day, bucket)-scoped)
    val day2Ms = 2L * 86400000L
    val cells = (0 until 200).map { i =>
      val ts = if (i < 100) 1000L + i else day2Ms + i
      (f"r$i%05d", "d", "q0", ts, "Put", "X" * 40)
    }.toDF("row", "family", "qualifier", "ts", "type", "value")
    MobFiles.export(cells, threshold = 30, numRegions = 2, outPath = out,
      table = "t3", numMobBuckets = 4)
    // nothing dangles yet: the sweep is a no-op
    assert(MobFiles.sweepUnreferencedMobFiles(spark, out, "t3").isEmpty)

    // simulate a compaction that rewrote the main store without the
    // day-0 rows (their Puts masked): re-export the surviving half
    // over the same mob dir — its refs name a subset of the mob files
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val survivors = cells.filter(col("row") >= "r00100")
    // re-write ONLY the main store (keep the mob dir): export to a tmp
    // tree and move its main/ over ours
    val tmp2 = java.nio.file.Files.createTempDirectory("mobsweep2").toString
    MobFiles.export(survivors, threshold = 30, numRegions = 2,
      outPath = tmp2, table = "t3", numMobBuckets = 4)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/main"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$tmp2/main"),
      new org.apache.hadoop.fs.Path(s"$out/main"))

    val beforeNames = MobFiles.mobFileAudit(spark, out, table = "t3")
      .collect().map(_.getString(0)).toSet
    val day0Names = beforeNames.filter(_.substring(32, 40) == "19700101")
    assert(day0Names.nonEmpty)
    val swept = MobFiles.sweepUnreferencedMobFiles(spark, out, "t3")
    // exactly the day-0 files dangle: deterministic (family, day,
    // bucket) names mean the survivors' re-export referenced the same
    // day-2 names the original wrote
    assert(swept.toSet == day0Names)
    val keptNames = MobFiles.mobFileAudit(spark, out, table = "t3")
      .collect().map(_.getString(0)).toSet
    assert(keptNames == beforeNames -- day0Names)
    val resolved = MobFiles.importResolved(spark, out, table = "t3")
    assert(resolved.count() == 100)
    assert(resolved.filter(col("value").startsWith("!MOB-MISS")).count() == 0)
  }

  test("generation compaction consolidates per policy partition, repoints refs, re-runs idempotently") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("mobgen").toString
    val dayMs = 86400000L
    // 10 flush days spanning two ISO weeks (1970-01-05 Mon .. 01-14),
    // 2 row-hash buckets -> up to 20 daily files; every value is mob
    val cells = (0 until 200).map { i =>
      (f"r$i%05d", "d", "q0", (4 + i % 10) * dayMs, "Put", "B" * (35 + i % 7))
    }.toDF("row", "family", "qualifier", "ts", "type", "value")
    MobFiles.export(cells, threshold = 30, numRegions = 3, outPath = out,
      table = "tg", numMobBuckets = 2)
    val before = MobFiles.mobFileAudit(spark, out, table = "tg").collect()
    assert(before.length > 2)

    val newFiles = MobFiles.compactMobGenerations(spark, out, table = "tg",
      policy = "WEEKLY")
    // two ISO weeks -> two consolidated files; each name's date is the
    // LATEST constituent flush day of its week (the reference's
    // latestPutTs naming — TTL expiry must never outrun live cells),
    // NOT the week's Monday: week1 spans 01-05..01-11, week2 holds
    // flushes through 01-14
    assert(newFiles.size === 2)
    assert(newFiles.map(_.substring(32, 40)).sorted ==
      Seq("19700111", "19700114"))
    val swept = MobFiles.sweepUnreferencedMobFiles(spark, out, table = "tg")
    assert(swept.toSet === before.map(_.getString(0)).toSet,
      "exactly the old generation is unreferenced after the repoint")

    // audit consistency + identity through the new generation
    val audit = MobFiles.mobFileAudit(spark, out, table = "tg").collect()
    assert(audit.map(_.getString(0)).sorted.toSeq === newFiles)
    audit.foreach(r => assert(r.getLong(1) == r.getLong(2)))
    assert(audit.map(_.getLong(1)).sum == 200L)
    val resolved = MobFiles.importResolved(spark, out, table = "tg")
    assert(resolved.filter(col("mob")).count() === 200)
    assert(resolved.filter(col("value").startsWith("!MOB-MISS")).count() === 0)
    assert(resolved.select("row", "value").as[(String, String)].collect()
      .toMap === cells.select("row", "value").as[(String, String)]
      .collect().toMap)

    // a second run consumes the consolidated generation and rewrites
    // the SAME names in place — nothing new to sweep
    val again = MobFiles.compactMobGenerations(spark, out, table = "tg",
      policy = "WEEKLY")
    assert(again === newFiles)
    assert(MobFiles.sweepUnreferencedMobFiles(spark, out, table = "tg").isEmpty)
    assert(MobFiles.importResolved(spark, out, table = "tg")
      .filter(col("value").startsWith("!MOB-MISS")).count() === 0)
  }

  test("DAILY generation compaction consolidates per day across buckets") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("mobdaily").toString
    val dayMs = 86400000L
    // 3 flush days × 4 row-hash buckets -> up to 12 flush files; DAILY
    // collapses each day's buckets into ONE file, dated that same day
    val cells = (0 until 120).map { i =>
      (f"r$i%05d", "d", "q0", (1 + i % 3) * dayMs, "Put", "B" * 40)
    }.toDF("row", "family", "qualifier", "ts", "type", "value")
    MobFiles.export(cells, threshold = 30, numRegions = 2, outPath = out,
      table = "td", numMobBuckets = 4)
    val before = MobFiles.mobFileAudit(spark, out, table = "td").collect()
    assert(before.length > 3, "bucketing must have split the days")

    val newFiles = MobFiles.compactMobGenerations(spark, out, table = "td",
      policy = "DAILY")
    // DAILY: partition = day = latest constituent day — one file each
    assert(newFiles.size === 3)
    assert(newFiles.map(_.substring(32, 40)).sorted ==
      Seq("19700102", "19700103", "19700104"))
    MobFiles.sweepUnreferencedMobFiles(spark, out, table = "td")
    val audit = MobFiles.mobFileAudit(spark, out, table = "td").collect()
    assert(audit.map(_.getString(0)).sorted.toSeq === newFiles)
    assert(audit.map(_.getLong(1)).sum == 120L)
    val resolved = MobFiles.importResolved(spark, out, table = "td")
    assert(resolved.count() === 120)
    assert(resolved.filter(col("value").startsWith("!MOB-MISS")).count() === 0)
  }

  test("WEEKLY generation compaction: Monday-start weeks across the year boundary") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("mobweekly").toString
    val dayMs = 86400000L
    // flush days Jan 2-6 1970: Fri/Sat/Sun belong to the ISO week
    // FLOORED at Monday 1969-12-29 — the previous YEAR — while Mon/Tue
    // open the week of 1970-01-05. Week-start convention is exactly
    // the engine-dependent edge this pins (Spark date_trunc("week") is
    // Monday-start like the reference's calendar grouping).
    val cells = (0 until 100).map { i =>
      (f"r$i%05d", "d", "q0", (1 + i % 5) * dayMs, "Put", "W" * 40)
    }.toDF("row", "family", "qualifier", "ts", "type", "value")
    MobFiles.export(cells, threshold = 30, numRegions = 2, outPath = out,
      table = "tw", numMobBuckets = 3)
    val before = MobFiles.mobFileAudit(spark, out, table = "tw").collect()
    assert(before.length > 5, "bucketing must have split the days")

    val newFiles = MobFiles.compactMobGenerations(spark, out, table = "tw",
      policy = "WEEKLY")
    // two week partitions; each file dated its LATEST constituent day
    assert(newFiles.size === 2)
    assert(newFiles.map(_.substring(32, 40)).sorted ==
      Seq("19700104", "19700106"))
    MobFiles.sweepUnreferencedMobFiles(spark, out, table = "tw")
    val audit = MobFiles.mobFileAudit(spark, out, table = "tw").collect()
    assert(audit.map(_.getString(0)).sorted.toSeq === newFiles)
    // membership: days 1-3 (Fri/Sat/Sun) land in the Dec-29 week's
    // file, days 4-5 in the Jan-5 week's — 20 cells per day
    val byDate = audit.map(r => (r.getString(0).substring(32, 40), r.getLong(1))).toMap
    assert(byDate("19700104") == 60L)
    assert(byDate("19700106") == 40L)
    val resolved = MobFiles.importResolved(spark, out, table = "tw")
    assert(resolved.count() === 100)
    assert(resolved.filter(col("value").startsWith("!MOB-MISS")).count() === 0)
  }

  test("MONTHLY compaction + expired cleaner never strands live refs (latestPutTs naming)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("mobttl").toString
    val dayMs = 86400000L
    // one month, flushes on the 2nd and the 25th; compact MONTHLY,
    // then expire with a MID-MONTH cutoff. With floor-dated output
    // (the old bug) the consolidated file was dated 19700101 < cutoff
    // and deleted while holding the 25th's live blobs — dangling refs.
    // latestPutTs naming dates it 19700125, so it survives.
    val cells = (0 until 100).map { i =>
      val d = if (i < 50) 1L else 24L // epoch day 1 = Jan 2, 24 = Jan 25
      (f"r$i%05d", "d", "q0", d * dayMs + i, "Put", "C" * 40)
    }.toDF("row", "family", "qualifier", "ts", "type", "value")
    MobFiles.export(cells, threshold = 30, numRegions = 2, outPath = out,
      table = "tt", numMobBuckets = 2)
    val newFiles = MobFiles.compactMobGenerations(spark, out, table = "tt",
      policy = "MONTHLY")
    MobFiles.sweepUnreferencedMobFiles(spark, out, table = "tt")
    assert(newFiles.size === 1)
    assert(newFiles.head.substring(32, 40) == "19700125")

    // mid-month TTL pass: the consolidated file must NOT be deleted
    val deleted = MobFiles.expiredMobFileCleaner(spark, out, "tt", "19700115")
    assert(deleted.isEmpty)
    // the mid-month-and-later read dereferences cleanly
    val live = MobFiles.importResolved(spark, out, table = "tt")
      .filter(col("ts") >= 15L * dayMs)
    assert(live.count() === 50)
    assert(live.filter(col("value").startsWith("!MOB-MISS")).count() === 0)
  }

  test("a crash inside the main-store swap window auto-recovers on the next read") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("mobcrash").toString
    val cells = (0 until 60).map { i =>
      (f"r$i%05d", "d", "q0", 1000L + i, "Put", "D" * 40)
    }.toDF("row", "family", "qualifier", "ts", "type", "value")
    MobFiles.export(cells, threshold = 30, numRegions = 2, outPath = out,
      table = "tc", numMobBuckets = 2)
    // simulate dying between the two commit renames: main retired to
    // main.old, nothing committed in its place
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$out/main"),
      new org.apache.hadoop.fs.Path(s"$out/main.old")))
    // the next layout read heals the orphan and serves the previous
    // generation whole
    val resolved = MobFiles.importResolved(spark, out, table = "tc")
    assert(resolved.count() === 60)
    assert(resolved.filter(col("value").startsWith("!MOB-MISS")).count() === 0)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$out/main")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/main.old")))
  }
}
