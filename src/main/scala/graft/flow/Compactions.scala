package graft.flow

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Minor (file-selection) compaction — the reference's
  * ExploringCompactionPolicy
  * (hbase-server/.../compactions/ExploringCompactionPolicy.java:55-121
  * `applyCompactionPolicy`, ratio check `filesInRatio`:178, quality
  * tie-break `isBetterSelection`:142) re-expressed as a pure selection
  * over a (name, size) ladder plus a rewrite of ONLY the selected
  * files through the existing HFile machinery.
  *
  * Why it matters at scale: graft's stores accumulate one HFile set
  * per landed epoch (q84 streaming backup, [[MobFiles]] generations,
  * bulk loads). Major compaction (q62) rewrites the WHOLE store —
  * an O(store) maintenance cost per pass. The exploring policy keeps
  * write amplification bounded: it searches every contiguous window of
  * the age-ordered file ladder within [minFiles, maxFiles], keeps
  * windows whose members are mutually size-similar (each file ≤ sum of
  * the others × ratio — skipped for windows under `minCompactSize`,
  * the small-file exemption), and picks the window that retires the
  * most files for the least IO. Untouched files are left byte-for-byte
  * in place.
  *
  * Scale shape: the selection is a driver-side O(n²) scan of the
  * store's FILE ladder (n = files in ONE store, tens at most — the
  * reference runs the same loop per store on the regionserver); the
  * rewrite reads only the selected files and streams through one
  * writer task. Parallelism across a 100 TB table comes from
  * compacting many region stores concurrently, exactly like the
  * reference's per-region compaction threads.
  */
object Compactions {

  /** Knobs mirroring CompactionConfiguration.java:147-163 defaults
    * (min 3 / max 10 files, ratio 1.2; `minCompactSize` is the
    * memstore-flush-size small-file exemption, `maxCompactSize`
    * unbounded). */
  final case class Knobs(
      minFiles: Int = 3,
      maxFiles: Int = 10,
      ratio: Double = 1.2,
      minCompactSize: Long = 0L,
      maxCompactSize: Long = Long.MaxValue)

  /** ExploringCompactionPolicy.applyCompactionPolicy:55-121, pure.
    * `sizes` is the store's file ladder in AGE order (oldest first —
    * the reference's seqId-ascending candidate order). Returns the
    * selected CONTIGUOUS index range (empty when nothing should
    * compact). `mightBeStuck` is the blocked-store escape hatch (the
    * reference sets it at blocking-file count): selection quality
    * switches to files-retired-per-byte (×1.05 replacement threshold,
    * :149) and, if nothing qualifies, falls back to the smallest
    * window seen. */
  def exploringSelect(sizes: IndexedSeq[Long], knobs: Knobs,
      mightBeStuck: Boolean = false): Range = {
    val n = sizes.length
    val prefix = sizes.scanLeft(0L)(_ + _)
    def winSize(s: Int, e: Int): Long = prefix(e + 1) - prefix(s)
    // filesInRatio:178 — every member ≤ (sum of the others) × ratio;
    // the LARGEST member is the binding constraint but the loop stays
    // literal for auditability (n is tiny)
    def inRatio(s: Int, e: Int): Boolean = {
      if (e - s + 1 < 2) true
      else {
        val total = winSize(s, e)
        (s to e).forall(i => sizes(i) <= (total - sizes(i)) * knobs.ratio)
      }
    }
    var bestStart = -1; var bestEnd = -1; var bestLen = 0; var bestSize = 0L
    var smStart = -1; var smEnd = -1; var smSize = Long.MaxValue
    var start = 0
    while (start < n) {
      var end = start + knobs.minFiles - 1
      while (end < n) {
        val len = end - start + 1
        if (len >= knobs.minFiles && len <= knobs.maxFiles) {
          val size = winSize(start, end)
          // the stuck fallback tracks the smallest window BEFORE the
          // maxCompactSize gate, like the Java (:87)
          if (mightBeStuck && size < smSize) {
            smStart = start; smEnd = end; smSize = size
          }
          if (size <= knobs.maxCompactSize &&
              !(size >= knobs.minCompactSize && !inRatio(start, end))) {
            // isBetterSelection:142 — stuck mode keeps the selection
            // retiring the most files per byte (1.05 hysteresis);
            // normal mode: more files, then less IO
            val better =
              if (mightBeStuck && bestSize > 0 && size > 0)
                (bestLen.toDouble / bestSize) * 1.05 < len.toDouble / size
              else
                len > bestLen || (len == bestLen && size < bestSize)
            if (better) {
              bestStart = start; bestEnd = end; bestLen = len; bestSize = size
            }
          }
        }
        end += 1
      }
      start += 1
    }
    if (bestLen == 0 && mightBeStuck && smStart >= 0) smStart to smEnd
    else if (bestLen == 0) 0 until 0
    else bestStart to bestEnd
  }

  /** Run one exploring minor compaction over a flat HFile store
    * directory (`part-*.hfile`, name order = age order, oldest
    * first): select with [[exploringSelect]] on the files' sizes
    * (physical bytes by default; `logicalSizes` overrides with a
    * caller-computed metric when the selection must be reproducible
    * from the data alone), rewrite ONLY the selected run into one
    * merged file named after the first selected input
    * (write-to-tmp, delete inputs, rename — the commit-by-rename the
    * reference performs through its tmp/archive dirs), and leave
    * every other file untouched. Returns the selected file names
    * (empty = store already compact, nothing rewritten). */
  def minorCompact(spark: SparkSession, dir: String,
      knobs: Knobs = Knobs(), mightBeStuck: Boolean = false,
      logicalSizes: Option[Map[String, Long]] = None,
      blockSize: Int = 65536): Seq[String] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(new Path(dir, "part-*.hfile")))
      .getOrElse(Array.empty)
      .map(s => (s.getPath, s.getLen)).toSeq.sortBy(_._1.getName)
    val sizes = files.map { case (p, l) =>
      logicalSizes.fold(l)(_(p.getName))
    }.toIndexedSeq
    val sel = exploringSelect(sizes, knobs, mightBeStuck)
    if (sel.isEmpty) return Nil

    val selected = sel.map(files(_))
    val tmpDir = s"$dir/.compact.tmp"
    val tmpPath = new Path(tmpDir)
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
    // merge-rewrite the selected run: one output file per compaction,
    // like the reference's single StoreFileWriter per minor compaction
    HFiles.export(
      HFiles.importFiles(spark, selected.map { case (p, l) => (p.toString, l) }),
      numRegions = 1, outPath = tmpDir, blockSize = blockSize)
    val outName = selected.head._1.getName
    selected.foreach { case (p, _) => fs.delete(p, false) }
    require(fs.rename(new Path(s"$tmpDir/part-00000.hfile"),
      new Path(dir, outName)), s"could not commit compacted $outName")
    fs.delete(tmpPath, true)
    selected.map(_._1.getName)
  }
}
