package graft.flow

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.codec.HFileV3

/** HFilePrettyPrinter twin (hbase-server/.../io/hfile/
  * HFilePrettyPrinter.java — the `hbase hfile -m -s` diagnostic): one
  * report row per store file, built from METADATA preads only —
  * trailer (entry count, index levels, comparator, compression
  * ordinal), root index (first key), and FILE_INFO (LASTKEY,
  * TIMERANGE, AVG_KEY_LEN, AVG_VALUE_LEN) — never a data-block scan.
  * The file LIST is driver metadata; the per-file preads parallelize
  * one task per file, so describing a 100 TB store costs three preads
  * per file across the fleet.
  */
object HFilePrint {

  final case class FileReport(file: String, entry_count: Long,
      index_levels: Long, comparator: String, codec: Long,
      first_row: String, last_row: String, ts_min: Long, ts_max: Long,
      avg_key_len: Long, avg_value_len: Long, file_bytes: Long)

  /** Row key of an HBase key blob: 2B big-endian row length + row
    * (cellKeyBytes layout / KeyValue.java key format). */
  private def rowOfKey(key: Array[Byte]): String = {
    if (key == null || key.length < 2) return ""
    val bb = ByteBuffer.wrap(key)
    val rl = bb.getShort & 0xFFFF
    new String(key, 2, rl, UTF_8)
  }

  private def beInt(b: Array[Byte]): Int =
    ByteBuffer.wrap(b).getInt

  /** Describe every `glob` file under `dir`. */
  def describe(spark: SparkSession, dir: String,
      glob: String = "*.hfile"): DataFrame = {
    import spark.implicits._
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(new Path(dir, glob)))
      .getOrElse(Array.empty).filter(_.isFile)
      .map(f => (f.getPath.toString, f.getLen)).toSeq.sorted
    val bconf = ShippedConf.broadcast(spark)
    spark.sparkContext.parallelize(files, math.max(files.size, 1))
      .map { case (pathStr, len) =>
        val p = new Path(pathStr)
        val tfs = p.getFileSystem(bconf.value.conf)
        val in = tfs.open(p)
        try {
          val tail = new Array[Byte](HFileV3.TrailerSize)
          in.readFully(len - tail.length, tail)
          val trailer = HFileV3.readTrailer(tail)
          val pread: HFileV3.PRead = (off, n) => {
            val buf = new Array[Byte](n); in.readFully(off, buf); buf
          }
          val info = HFileV3.readFileInfo(pread, trailer)
          val root = HFileV3.readRootIndex(pread, trailer)
          val firstRow =
            root.headOption.map(e => rowOfKey(e._3)).getOrElse("")
          val lastRow =
            info.get("hfile.LASTKEY").map(rowOfKey).getOrElse("")
          val (tsMin, tsMax) =
            HFileV3.parseTimeRange(info).getOrElse((0L, 0L))
          FileReport(p.getName, trailer.entryCount,
            trailer.numDataIndexLevels.toLong,
            trailer.comparatorClassName, trailer.compressionCodec.toLong,
            firstRow, lastRow, tsMin, tsMax,
            info.get("hfile.AVG_KEY_LEN").map(beInt(_).toLong).getOrElse(0L),
            info.get("hfile.AVG_VALUE_LEN").map(beInt(_).toLong).getOrElse(0L),
            len)
        } finally in.close()
      }
      .toDS().toDF()
  }
}
