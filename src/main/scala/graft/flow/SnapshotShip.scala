package graft.flow

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.codec.{HFileV3, SnapshotManifestCodec => SM}

/** Reference-layout snapshot shipping — the ExportSnapshot twin at the
  * DIRECTORY level, not just the store-file level: the destination
  * tree is what a reference cluster's `.hbase-snapshot` scanner and
  * clone_snapshot expect (ExportSnapshot.java ships exactly this):
  *
  *   <root>/.hbase-snapshot/<name>/.snapshotinfo     (SnapshotDescription)
  *   <root>/.hbase-snapshot/<name>/data.manifest     (SnapshotDataManifest)
  *   <root>/archive/data/<ns>/<table>/<region>/<family>/<storefile>
  *
  * The import side enumerates store files FROM the manifest (names +
  * sizes verified), never by globbing — a manifest that lies about a
  * file is an error, exactly like the reference's snapshot
  * verification. Store files are full HFile v3 ([[HFileV3]]); graft
  * region files carry all families of the table in one file, so each
  * region manifest lists its file under every declared family with a
  * shared name (noted for reference-cluster adopters: single-family
  * tables — the common case — match the reference layout exactly).
  */
object SnapshotShip {

  private def split(table: String): (String, String) =
    table.split(":", 2) match {
      case Array(n, q) => (n, q)
      case _ => ("default", table)
    }

  /** Export `cells` as a complete snapshot tree under `destRoot`.
    * Region store files write distributed ([[HFiles.export]]); the
    * driver then lays out the archive tree (renames are metadata-only)
    * and writes the manifest pair. */
  def exportSnapshot(cells: DataFrame, numRegions: Int, destRoot: String,
      snapshotName: String, table: String,
      creationTime: Long = 0L): Unit = {
    val (ns, qual) = split(table)
    val spark = cells.sparkSession
    val tmp = s"$destRoot/.tmp-$snapshotName"
    HFiles.export(cells, numRegions, tmp)
    val fs = new Path(destRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = Option(fs.globStatus(new Path(tmp, "part-*.hfile")))
      .getOrElse(Array.empty).sortBy(_.getPath.getName)
    // families come from the table's cells — a bounded set (schema-like)
    val families = cells.select("family").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    // region boundaries from the store files themselves: 3 preads each
    val firstRows = parts.map { st =>
      val in = fs.open(st.getPath)
      try {
        val pread: HFileV3.PRead = (off, n) => {
          val b = new Array[Byte](n); in.readFully(off, b); b
        }
        val trailer = HFileV3.readTrailer(pread(st.getLen - 4096, 4096))
        val idx = HFileV3.readRootIndex(pread, trailer)
        if (idx.isEmpty) Array.emptyByteArray
        else {
          val k = idx.head._3
          val rl = ((k(0) & 0xff) << 8) | (k(1) & 0xff)
          java.util.Arrays.copyOfRange(k, 2, 2 + rl)
        }
      } finally in.close()
    }
    val regions = parts.zipWithIndex.map { case (st, i) =>
      val regionName = f"region-$i%05d"
      val sfName = f"sf-$i%05d"
      val famDirs = families.map { fam =>
        val famDir = new Path(s"$destRoot/archive/data/$ns/$qual/$regionName/$fam")
        fs.mkdirs(famDir)
        famDir
      }
      // the one physical file lives under the FIRST family dir; other
      // families reference the same name (graft region files are
      // multi-family; single-family tables match the reference 1:1)
      val target = new Path(famDirs.head, sfName)
      fs.rename(st.getPath, target)
      val size = fs.getFileStatus(target).getLen
      SM.RegionManifest(
        regionId = creationTime + i,
        startKey = if (i == 0) Array.emptyByteArray else firstRows(i),
        endKey = if (i == parts.length - 1) Array.emptyByteArray
          else firstRows(i + 1),
        families = families.map(f =>
          SM.FamilyFiles(f.getBytes(StandardCharsets.UTF_8),
            Seq(SM.StoreFileRef(sfName, size)))))
    }.toSeq
    fs.delete(new Path(tmp), true)
    val snap = SM.Snapshot(snapshotName, table, creationTime,
      SM.ManifestVersion,
      families.map(_.getBytes(StandardCharsets.UTF_8)), regions)
    val snapDir = new Path(s"$destRoot/.hbase-snapshot/$snapshotName")
    fs.mkdirs(snapDir)
    for ((fname, bytes) <- Seq(
        ".snapshotinfo" -> SM.encodeDescription(snap),
        "data.manifest" -> SM.encodeDataManifest(snap))) {
      val out = fs.create(new Path(snapDir, fname), true)
      try out.write(bytes) finally out.close()
    }
  }

  /** Read a snapshot back through its manifest: parse `.snapshotinfo`
    * + `data.manifest`, resolve each region's store files (sizes
    * verified against the manifest), and import the cell stream —
    * one task per store file. */
  def importSnapshot(spark: SparkSession, destRoot: String,
      snapshotName: String): DataFrame = {
    val fs = new Path(destRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapDir = new Path(s"$destRoot/.hbase-snapshot/$snapshotName")
    def readAll(p: Path): Array[Byte] = {
      val st = fs.getFileStatus(p)
      val b = new Array[Byte](st.getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0, b) finally in.close()
      b
    }
    val (name, table, _, _) =
      SM.decodeDescription(readAll(new Path(snapDir, ".snapshotinfo")))
    require(name == snapshotName,
      s"manifest names snapshot '$name', expected '$snapshotName'")
    val (_, regions) =
      SM.decodeDataManifest(readAll(new Path(snapDir, "data.manifest")))
    val (ns, qual) = split(table)
    // each region's physical files: first family dir holds them (the
    // export layout above); dedupe shared names across families
    val files = regions.zipWithIndex.flatMap { case (r, i) =>
      val regionName = f"region-$i%05d"
      r.families.headOption.toSeq.flatMap { ff =>
        val fam = new String(ff.family, StandardCharsets.UTF_8)
        ff.files.map { sf =>
          val p = new Path(s"$destRoot/archive/data/$ns/$qual/$regionName/$fam/${sf.name}")
          val len = fs.getFileStatus(p).getLen
          require(len == sf.fileSize,
            s"store file ${sf.name}: size $len != manifest ${sf.fileSize}")
          (p.toString, len)
        }
      }
    }
    HFiles.importFiles(spark, files)
  }
}
