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

  /** Encoded region names are dash-free hex like the reference's md5
    * form (RegionInfoBuilder.ENCODED_REGION_NAME_REGEX) — HFileLink
    * names `table=region-hfile` split on the region/hfile dash. */
  private[graft] def regionNameOf(i: Int): String = f"$i%032x"

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
      val regionName = regionNameOf(i)
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
    // export layout above); dedupe shared names across families.
    // Store-file names may be HFileLink names (`[ns=]table=region-
    // hfile` — split-parent files referenced from a daughter or a
    // cloned table), and entries may carry a split-half Reference:
    // both resolve here, like the reference's StoreFileInfo open path.
    val files = regions.zipWithIndex.flatMap { case (r, i) =>
      val regionName = regionNameOf(i)
      r.families.headOption.toSeq.flatMap { ff =>
        val fam = new String(ff.family, StandardCharsets.UTF_8)
        ff.files.map { sf =>
          val p = SM.parseLinkName(sf.name) match {
            case Some((lns, ltable, lregion, lhfile)) =>
              new Path(s"$destRoot/archive/data/$lns/$ltable/$lregion/$fam/$lhfile")
            case None =>
              new Path(s"$destRoot/archive/data/$ns/$qual/$regionName/$fam/${sf.name}")
          }
          val len = fs.getFileStatus(p).getLen
          if (sf.reference.isEmpty)
            require(len == sf.fileSize,
              s"store file ${sf.name}: size $len != manifest ${sf.fileSize}")
          (p.toString, len, sf.reference.map(h => (h.splitRow, h.top)))
        }
      }
    }
    HFiles.importFilesFiltered(spark, files)
  }

  /** Simulate what a region SPLIT leaves behind and snapshot it:
    * every region of `srcName` becomes TWO daughter regions whose
    * store files are half-file REFERENCES (FS.proto Reference:
    * TOP/BOTTOM around the parent file's middle block row) through
    * HFileLink names back to the parent's archive file — the layout a
    * reference cluster's snapshot holds when taken after splits,
    * before the daughters compact. No cell data is rewritten. */
  def splitSnapshot(spark: SparkSession, destRoot: String,
      srcName: String, newName: String): Unit = {
    val fs = new Path(destRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapDir = new Path(s"$destRoot/.hbase-snapshot/$srcName")
    def readAll(p: Path): Array[Byte] = {
      val st = fs.getFileStatus(p)
      val b = new Array[Byte](st.getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0, b) finally in.close()
      b
    }
    val (_, table, ct, ver) =
      SM.decodeDescription(readAll(new Path(snapDir, ".snapshotinfo")))
    val (families, regions) =
      SM.decodeDataManifest(readAll(new Path(snapDir, "data.manifest")))
    val (ns, qual) = split(table)
    val daughters = regions.zipWithIndex.flatMap { case (r, i) =>
      val parentRegion = regionNameOf(i)
      val fam = new String(r.families.head.family, StandardCharsets.UTF_8)
      val sf = r.families.head.files.head
      val path = new Path(
        s"$destRoot/archive/data/$ns/$qual/$parentRegion/$fam/${sf.name}")
      // split row = the parent file's middle block first-row (the
      // reference splits at the store's midkey — HFileBlockIndex
      // mid-key metadata's purpose)
      val in = fs.open(path)
      val midRow = try {
        val len = fs.getFileStatus(path).getLen
        val pread: HFileV3.PRead = (off, n) => {
          val b = new Array[Byte](n); in.readFully(off, b); b
        }
        val trailer = HFileV3.readTrailer(pread(len - 4096, 4096))
        val idx = HFileV3.readRootIndex(pread, trailer)
        val k = idx(idx.size / 2)._3
        val rl = ((k(0) & 0xff) << 8) | (k(1) & 0xff)
        java.util.Arrays.copyOfRange(k, 2, 2 + rl)
      } finally in.close()
      val linkName = s"$ns=$qual=$parentRegion-${sf.name}"
      Seq(false, true).zipWithIndex.map { case (top, d) =>
        SM.RegionManifest(
          regionId = ct + i * 2 + d,
          startKey = if (top) midRow else r.startKey,
          endKey = if (top) r.endKey else midRow,
          families = r.families.map(ffam => SM.FamilyFiles(ffam.family,
            Seq(SM.StoreFileRef(linkName, sf.fileSize,
              Some(SM.RefHalf(midRow, top)))))))
      }
    }
    val snap = SM.Snapshot(newName, table, ct, ver,
      families, daughters)
    val newDir = new Path(s"$destRoot/.hbase-snapshot/$newName")
    fs.mkdirs(newDir)
    for ((fname, bytes) <- Seq(
        ".snapshotinfo" -> SM.encodeDescription(snap),
        "data.manifest" -> SM.encodeDataManifest(snap))) {
      val out = fs.create(new Path(newDir, fname), true)
      try out.write(bytes) finally out.close()
    }
  }
}
