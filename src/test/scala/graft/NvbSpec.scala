package graft

import org.apache.spark.sql.functions._

import graft.read.Resolve

/** NEW_VERSION_BEHAVIOR resolve: mvcc-sensitive masking scenarios from
  * NewVersionBehaviorTracker.java semantics. Each test states the
  * tracker behavior it pins.
  */
class NvbSpec extends SparkSpec {

  private def cellsOf(rows: (String, String, String, Long, String, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("row", "family", "qualifier", "ts", "type", "value", "seq")
  }

  private def visible(df: org.apache.spark.sql.DataFrame, maxVersions: Int = 1,
      resultMax: Int = Int.MaxValue): Set[(String, String, String, Long, String)] =
    Resolve.latestNvb(df, maxVersions = maxVersions, resultMaxVersions = resultMax)
      .select("row", "family", "qualifier", "ts", "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4))).toSet

  test("a put written AFTER a delete is visible even at an older timestamp") {
    // the headline NVB semantic (ColumnFamilyDescriptorBuilder.java:197
    // doc): masking follows write order, not timestamps
    val df = cellsOf(
      ("r", "f", "q", 5L, "Put", "old", 1L),
      ("r", "f", "q", 10L, "DeleteColumn", null, 2L),
      ("r", "f", "q", 7L, "Put", "rewritten", 3L))
    assert(visible(df, maxVersions = 3) ===
      Set(("r", "f", "q", 7L, "rewritten")))
  }

  test("exact-version Delete masks only earlier-sequence writes") {
    val df = cellsOf(
      ("r", "f", "q", 10L, "Delete", null, 3L),
      ("r", "f", "q", 10L, "Put", "afterDelete", 5L))
    assert(visible(df) === Set(("r", "f", "q", 10L, "afterDelete")))
    val df2 = cellsOf(
      ("r", "f", "q", 10L, "Put", "beforeDelete", 5L),
      ("r", "f", "q", 10L, "Delete", null, 7L))
    assert(visible(df2) === Set.empty)
  }

  test("deleted versions consume version slots within their mvcc segment") {
    // tracker isDeleted() :248-255: X is version-deleted but still
    // counts against maxVersions for earlier-mvcc cells -> Y masked
    val df = cellsOf(
      ("r", "f", "q", 9L, "Put", "Y", 1L),
      ("r", "f", "q", 10L, "Put", "X", 3L),
      ("r", "f", "q", 10L, "Delete", null, 4L))
    assert(visible(df, maxVersions = 1) === Set.empty)
    // but a cell written AFTER the delete starts a fresh segment
    val df2 = df.unionByName(cellsOf(("r", "f", "q", 8L, "Put", "Z", 6L)))
    assert(visible(df2, maxVersions = 1) === Set(("r", "f", "q", 8L, "Z")))
  }

  test("duplicate-timestamp puts: newest write wins and no slot is consumed") {
    // tracker prepare() :173-178
    val df = cellsOf(
      ("r", "f", "q", 5L, "Put", "a", 1L),
      ("r", "f", "q", 5L, "Put", "b", 2L),
      ("r", "f", "q", 4L, "Put", "c", 0L))
    assert(visible(df, maxVersions = 2) ===
      Set(("r", "f", "q", 5L, "b"), ("r", "f", "q", 4L, "c")))
  }

  test("3+ duplicate-ts puts all bound against the FIRST-scanned put's mvcc") {
    // tracker prepare() :173-178 returns EARLY on a duplicate without
    // updating lastCqMvcc — so the 2nd AND 3rd puts at the same ts both
    // cap their counting segment at the newest put's mvcc, and only the
    // newest survives while consuming one slot
    val df = cellsOf(
      ("r", "f", "q", 5L, "Put", "a", 1L),
      ("r", "f", "q", 5L, "Put", "b", 2L),
      ("r", "f", "q", 5L, "Put", "c", 3L),
      ("r", "f", "q", 4L, "Put", "older", 0L))
    assert(visible(df, maxVersions = 2) ===
      Set(("r", "f", "q", 5L, "c"), ("r", "f", "q", 4L, "older")))
    // with a version delete BETWEEN duplicates: the delete (ts 5, seq 4)
    // masks all three ts-5 puts; the older put is still within versions
    val df2 = df.unionByName(cellsOf(("r", "f", "q", 5L, "Delete", null, 4L)))
    assert(visible(df2, maxVersions = 2) === Set(("r", "f", "q", 4L, "older")))
  }

  test("family markers track per family and stay mvcc-sensitive") {
    val df = cellsOf(
      ("r", "f", "q1", 5L, "Put", "gone", 1L),
      ("r", "f", "q2", 5L, "Put", "kept", 4L),
      ("r", "f", "", 9L, "DeleteFamily", null, 3L),
      ("r", "g", "q1", 5L, "Put", "otherFam", 2L))
    // q1 put (seq 1) predates the DeleteFamily (seq 3) -> masked;
    // q2 put (seq 4) was written after it -> visible; family g untouched
    assert(visible(df, maxVersions = 1) ===
      Set(("r", "f", "q2", 5L, "kept"), ("r", "g", "q1", 5L, "otherFam")))
  }

  test("DeleteFamilyVersion masks one ts across columns, write-order aware") {
    val df = cellsOf(
      ("r", "f", "q1", 7L, "Put", "before", 1L),
      ("r", "f", "q2", 7L, "Put", "after", 5L),
      ("r", "f", "", 7L, "DeleteFamilyVersion", null, 3L))
    assert(visible(df) === Set(("r", "f", "q2", 7L, "after")))
  }

  test("version gate keeps the newest resultMaxVersions per column") {
    val df = cellsOf(
      ("r", "f", "q", 1L, "Put", "v1", 1L),
      ("r", "f", "q", 2L, "Put", "v2", 2L),
      ("r", "f", "q", 3L, "Put", "v3", 3L))
    assert(visible(df, maxVersions = 3, resultMax = 2) ===
      Set(("r", "f", "q", 3L, "v3"), ("r", "f", "q", 2L, "v2")))
  }
}
