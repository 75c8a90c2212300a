package graft.flow

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.codec.HFileV3
import graft.codec.HFileV3.HCell
import graft.model.CellType

/** Distributed HFile-v3 export / import — the byte-format twin of
  * Jobs.bulkLoadLayout (reference: HFileOutputFormat2 writes one HFile
  * per region per family, `hbase-mapreduce/.../HFileOutputFormat2.java`;
  * LoadIncrementalHFiles / Import read them back).
  *
  * Scale shape: export range-partitions the cell stream on the row key
  * (total order across files = the region split layout), each task
  * streams its partition through [[HFileV3.write]] straight onto a
  * Hadoop FileSystem — no driver involvement, no whole-file buffering.
  * Import parallelizes one task per file and streams block-by-block via
  * positional reads (one 64 KB block resident per task), so a 10 GB
  * reference store file never materializes as one array.
  */
object HFiles {

  private[graft] val typeToCode: Map[String, Byte] = Map(
    CellType.Put -> HFileV3.TypePut,
    CellType.Delete -> HFileV3.TypeDelete,
    CellType.DeleteFamilyVersion -> HFileV3.TypeDeleteFamilyVersion,
    CellType.DeleteColumn -> HFileV3.TypeDeleteColumn,
    CellType.DeleteFamily -> HFileV3.TypeDeleteFamily)

  private[graft] val codeToType: Map[Byte, String] = typeToCode.map(_.swap)

  /** KeyValue type-code rank for the within-(row,fam,qual,ts) sort:
    * CellComparatorImpl orders larger codes first (deletes before
    * puts). */
  private[flow] def typeRank = {
    val pairs = typeToCode.toSeq
    pairs.foldLeft(lit(0)) { case (acc, (name, code)) =>
      when(col("type") === name, lit(code.toInt)).otherwise(acc)
    }
  }

  /** TagType.STRING_VIS_TAG_TYPE (TagType.java:37) — the string form
    * visibility expressions take outside a live label registry. */
  val StringVisTagType: Byte = 7

  val cellSchema: StructType = StructType(Seq(
    StructField("row", StringType, nullable = false),
    StructField("family", StringType, nullable = false),
    StructField("qualifier", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))

  /** Write `cells` (canonical CellSet columns) as `numRegions` HFiles
    * under `outPath` (`part-NNNNN.hfile`, row-range-disjoint and sorted
    * — exactly the layout a reference bulk-load expects). `encoding`
    * selects a data-block encoding ([[graft.codec.BlockEncoding]] ids:
    * PREFIX/DIFF/FAST_DIFF/ROW_INDEX_V1) — FAST_DIFF being the common
    * production default on reference clusters; the delta encoders
    * require a single column family per export, like the reference's
    * one-store-file-per-family layout. */
  def export(cells: DataFrame, numRegions: Int, outPath: String,
      blockSize: Int = 65536, gz: Boolean = false, encoding: Int = 0,
      compression: Int = HFileV3.CompressionNone,
      rowColBloom: Boolean = false, perFamily: Boolean = false,
      encryptSubject: Option[String] = None,
      rowPrefixBloom: Option[Int] = None,
      visColumn: Option[String] = None,
      compressTags: Boolean = false,
      indexMaxChunk: Int = 128 * 1024,
      extraFileInfo: Seq[(String, Array[Byte])] = Nil): Unit = {
    // visColumn: each cell persists its visibility expression as a
    // STRING_VIS (type 7) wire tag in the store files; with
    // compressTags + an encoding the tag sections dictionary-compress
    // per block (COMPRESS_TAGS — TagCompressionContext)
    // perFamily: ONE STORE FILE PER COLUMN FAMILY per region — the
    // reference's actual store layout (a Store is per-family;
    // HFileOutputFormat2 opens one writer per family). Sorting puts
    // the family FIRST within the region's row range, so each
    // family's run is itself comparator-sorted and streams through
    // its own writer; multi-family tables then match the reference
    // layout exactly (and the delta encodings' one-family-per-file
    // requirement holds by construction).
    val sortCols =
      if (perFamily)
        Seq(col("family"), col("row"), col("qualifier"),
          col("ts").desc, typeRank.desc)
      else
        Seq(col("row"), col("family"), col("qualifier"),
          col("ts").desc, typeRank.desc)
    val ordered = cells
      .repartitionByRange(numRegions, col("row"))
      .sortWithinPartitions(sortCols: _*)
      .select((Seq("row", "family", "qualifier", "ts", "type", "value") ++
        visColumn.toSeq).map(col): _*)
    val bconf = ShippedConf.broadcast(cells.sparkSession)
    val r_visDefined = visColumn.isDefined
    val compressTagsB = compressTags
    val indexMaxChunkB = indexMaxChunk
    val extraFileInfoB = extraFileInfo
    ordered.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = TaskContext.getPartitionId()
        val fs = new Path(outPath).getFileSystem(bconf.value.conf)
        def toCell(r: Row): HCell = HCell(
          r.getString(0).getBytes("UTF-8"),
          r.getString(1).getBytes("UTF-8"),
          r.getString(2).getBytes("UTF-8"),
          r.getLong(3),
          typeToCode(r.getString(4)),
          Option(r.getString(5)).getOrElse("").getBytes("UTF-8"),
          tags =
            if (r.length > 6 && r.getString(6) != null && r.getString(6).nonEmpty)
              HFileV3.tagBytes(Seq((StringVisTagType,
                r.getString(6).getBytes("UTF-8"))))
            else Array.emptyByteArray)
        val tagged = r_visDefined
        if (!perFamily) {
          val path = new Path(f"$outPath%s/part-$pid%05d.hfile")
          val out = fs.create(path, true)
          try {
            HFileV3.write(out, it.map(toCell), blockSize, gz = gz,
              encoding = encoding, compression = compression,
              rowColBloom = rowColBloom, rowPrefixBloom = rowPrefixBloom,
              withTags = tagged, compressTags = compressTagsB,
              indexMaxChunk = indexMaxChunkB,
              encryption = encryptSubject.map(graft.codec.HCrypto.randomCtx),
              extraFileInfo = extraFileInfoB)
            ()
          } finally out.close()
        } else {
          // consume one family run at a time; each run is sorted and
          // streams straight through its own file writer
          val bufIt = it.buffered
          while (bufIt.hasNext) {
            val fam = bufIt.head.getString(1)
            val path = new Path(f"$outPath%s/part-$pid%05d-$fam%s.hfile")
            val out = fs.create(path, true)
            try {
              // (named bufIt: `buffered` inside the anonymous Iterator
              // would resolve to ITS OWN inherited .buffered method)
              val run = new Iterator[HCell] {
                def hasNext: Boolean =
                  bufIt.hasNext && bufIt.head.getString(1) == fam
                def next(): HCell = toCell(bufIt.next())
              }
              HFileV3.write(out, run, blockSize, gz = gz,
                encoding = encoding, compression = compression,
                rowColBloom = rowColBloom, rowPrefixBloom = rowPrefixBloom,
                withTags = tagged, compressTags = compressTagsB,
                indexMaxChunk = indexMaxChunkB,
                encryption = encryptSubject.map(graft.codec.HCrypto.randomCtx),
                extraFileInfo = extraFileInfoB)
              ()
            } finally out.close()
          }
        }
      }
    }
  }

  /** Export MANY region stores in ONE job — the OutputSink-per-region
    * shape ([[WalRecovery.writeRegionLogs]]'s twin for store files):
    * one shuffle keyed by the integer `regionCol`, each writer task
    * cutting a new HFile on region change (the sort guarantees
    * contiguity), files landing at `outPath/<name(region)>`. Replaces
    * N per-region export jobs (each a full scan + shuffle of the
    * source) with one pass — the difference between O(regions) and
    * O(1) source scans when a fixture or a real table lands its whole
    * region layout at once (HFileOutputFormat2 writes all regions of
    * a bulk load in one job the same way). */
  def exportRegions(cells: DataFrame, regionCol: String, outPath: String,
      name: Int => String, blockSize: Int = 65536,
      indexMaxChunk: Int = 128 * 1024): Unit = {
    val ordered = cells
      .repartition(col(regionCol))
      .sortWithinPartitions(col(regionCol), col("row"), col("family"),
        col("qualifier"), col("ts").desc, typeRank.desc)
      .select(col(regionCol).cast("int").as("__region"),
        col("row"), col("family"), col("qualifier"), col("ts"),
        col("type"), col("value"))
    val bconf = ShippedConf.broadcast(cells.sparkSession)
    val nameB = name
    ordered.foreachPartition { (it: Iterator[Row]) =>
      val fs = new Path(outPath).getFileSystem(bconf.value.conf)
      def toCell(r: Row): HCell = HCell(
        r.getString(1).getBytes("UTF-8"),
        r.getString(2).getBytes("UTF-8"),
        r.getString(3).getBytes("UTF-8"),
        r.getLong(4),
        typeToCode(r.getString(5)),
        Option(r.getString(6)).getOrElse("").getBytes("UTF-8"))
      val rows = it.buffered
      while (rows.hasNext) {
        val region = rows.head.getInt(0)
        val run = new Iterator[HCell] {
          def hasNext: Boolean =
            rows.hasNext && rows.head.getInt(0) == region
          def next(): HCell = toCell(rows.next())
        }
        val path = new Path(s"$outPath/${nameB(region)}")
        fs.mkdirs(path.getParent)
        val out = fs.create(path, true)
        try {
          HFileV3.write(out, run, blockSize,
            indexMaxChunk = indexMaxChunk)
          ()
        } finally out.close()
      }
    }
  }

  /** Multi-get served straight from an exported HFile directory — the
    * reference's Get path against store files: a driver-side range
    * table (region-count-bounded, 3 positional reads per file — the
    * meta-table location lookup's analogue) routes each row to the one
    * file whose [first, last] range can hold it; one task per touched
    * file then binary-searches the block index and reads ONLY the
    * row's block(s) ([[HFileV3.getRow]]). Absent rows cost an index
    * probe, never a scan. */
  def pointGet(spark: SparkSession, dir: String, rows: Seq[String],
      qualifier: Option[String] = None): DataFrame = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(new Path(dir, "part-*.hfile")))
      .getOrElse(Array.empty)
      .map(s => (s.getPath.toString, s.getLen)).toSeq.sortBy(_._1)
    def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    val ranges = files.flatMap { case (pathStr, len) =>
      val in = fs.open(new Path(pathStr))
      try {
        val pread: HFileV3.PRead = (off, n) => {
          val b = new Array[Byte](n); in.readFully(off, b); b
        }
        val trailer = HFileV3.readTrailer(pread(len - 4096, 4096))
        if (trailer.dataIndexCount == 0) None
        else {
          val idx = HFileV3.readRootIndex(pread, trailer)
          val firstKey = idx.head._3
          val bb = java.nio.ByteBuffer.wrap(firstKey)
          val rl = bb.getShort & 0xffff
          val firstRow = java.util.Arrays.copyOfRange(firstKey, 2, 2 + rl)
          val lastKey = HFileV3.readFileInfo(pread, trailer)("hfile.LASTKEY")
          val lb = java.nio.ByteBuffer.wrap(lastKey)
          val lrl = lb.getShort & 0xffff
          val lastRow = java.util.Arrays.copyOfRange(lastKey, 2, 2 + lrl)
          Some((pathStr, len, firstRow, lastRow))
        }
      } finally in.close()
    }
    val targets = rows.distinct.map(_.getBytes("UTF-8"))
    val assignments = ranges.flatMap { case (p, len, lo, hi) =>
      val mine = targets.filter(r => cmp(r, lo) >= 0 && cmp(r, hi) <= 0)
      if (mine.isEmpty) None else Some((p, len, mine.map(new String(_, "UTF-8"))))
    }
    val bconf = ShippedConf.broadcast(spark)
    val rdd = spark.sparkContext
      .parallelize(assignments, math.max(assignments.size, 1))
      .flatMap { case (pathStr, len, targetRows) =>
        val path = new Path(pathStr)
        val in = path.getFileSystem(bconf.value.conf).open(path)
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        val pread: HFileV3.PRead = (off, n) => {
          val b = new Array[Byte](n); in.readFully(off, b); b
        }
        // open once per file: index/bloom loads amortize across gets
        val handle = new HFileV3.HFileHandle(pread, len)
        targetRows.sorted.iterator.flatMap { r =>
          val cells = qualifier match {
            case Some(q) => handle.get(r.getBytes("UTF-8"), q.getBytes("UTF-8"))
            case None => handle.get(r.getBytes("UTF-8"))
          }
          cells.map { c =>
            Row(new String(c.row, "UTF-8"), new String(c.family, "UTF-8"),
              new String(c.qualifier, "UTF-8"), c.ts, codeToType(c.typ),
              new String(c.value, "UTF-8"))
          }
        }
      }
    spark.createDataFrame(rdd, cellSchema)
  }

  /** Read every matching HFile under `dir` back into the canonical
    * CellSet frame — one task per file, streaming positional reads.
    * `glob` defaults to a flat export; an epoch glob of the form
    * `"epoch=?" + "/part-?.hfile"` (with `?` = `*`) reads a
    * streaming-backup directory tree. */
  def importCells(spark: SparkSession, dir: String,
      glob: String = "part-*.hfile"): DataFrame = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(new Path(dir, glob)))
      .getOrElse(Array.empty)
      .map(s => (s.getPath.toString, s.getLen)).toSeq.sortBy(_._1)
    importFiles(spark, files)
  }

  /** [[importCells]] over an explicit (path, length) list — the
    * manifest-driven path (SnapshotShip reads the file list from
    * `data.manifest`, never from a glob). */
  def importFiles(spark: SparkSession,
      files: Seq[(String, Long)]): DataFrame =
    importFilesFiltered(spark, files.map { case (p, l) => (p, l, None) })

  /** [[importFiles]] with an optional split-half filter per file —
    * the HalfStoreFileReader twin (Reference semantics: BOTTOM = rows
    * strictly below the split row, TOP = the split row and up), so a
    * snapshot taken after region splits imports without rewriting the
    * parent files. */
  def importFilesFiltered(spark: SparkSession,
      files: Seq[(String, Long, Option[(Array[Byte], Boolean)])]): DataFrame = {
    def cmpB(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    val bconf = ShippedConf.broadcast(spark)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { case (pathStr, len, half) =>
        val path = new Path(pathStr)
        val in = path.getFileSystem(bconf.value.conf).open(path)
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        val pread: HFileV3.PRead = (off, n) => {
          val buf = new Array[Byte](n)
          in.readFully(off, buf)
          buf
        }
        val cells = HFileV3.readCellsFrom(pread, len)
        val scoped = half match {
          case Some((splitRow, top)) =>
            if (top) cells.filter(c => cmpB(c.row, splitRow) >= 0)
            else cells.filter(c => cmpB(c.row, splitRow) < 0)
          case None => cells
        }
        scoped.map { c =>
          Row(
            new String(c.row, "UTF-8"),
            new String(c.family, "UTF-8"),
            new String(c.qualifier, "UTF-8"),
            c.ts,
            codeToType(c.typ),
            new String(c.value, "UTF-8"))
        }
      }
    spark.createDataFrame(rdd, cellSchema)
  }

  /** [[importCells]] plus each cell's visibility expression extracted
    * from its STRING_VIS wire tag ('' when untagged) — the read half
    * of [[export]]'s `visColumn`, exercising per-cell tag parsing
    * (dictionary-decompressed inside encoded blocks when the file
    * declares COMPRESS_TAGS). */
  def importCellsTagged(spark: SparkSession, dir: String,
      glob: String = "part-*.hfile"): DataFrame = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(new Path(dir, glob)))
      .getOrElse(Array.empty)
      .map(s => (s.getPath.toString, s.getLen)).toSeq.sortBy(_._1)
    val bconf = ShippedConf.broadcast(spark)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { case (pathStr, len) =>
        val path = new Path(pathStr)
        val in = path.getFileSystem(bconf.value.conf).open(path)
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        val pread: HFileV3.PRead = (off, n) => {
          val buf = new Array[Byte](n)
          in.readFully(off, buf)
          buf
        }
        HFileV3.readCellsFrom(pread, len).map { c =>
          val vis = HFileV3.parseTags(c.tags)
            .collectFirst { case (StringVisTagType, data) =>
              new String(data, "UTF-8") }
            .getOrElse("")
          Row(
            new String(c.row, "UTF-8"),
            new String(c.family, "UTF-8"),
            new String(c.qualifier, "UTF-8"),
            c.ts,
            codeToType(c.typ),
            new String(c.value, "UTF-8"),
            vis)
        }
      }
    spark.createDataFrame(rdd,
      StructType(cellSchema.fields :+
        StructField("vis", StringType, nullable = false)))
  }
}
