package graft.model

import org.apache.spark.sql.types._

/** The canonical cell model of the engine.
  *
  * Mirrors the reference's 6-tuple cell addressing
  * (hbase-common/src/main/java/org/apache/hadoop/hbase/Cell.java:60):
  * (row, family, qualifier, timestamp, type, value). Values are kept as
  * canonical strings in the test fixtures (the reference stores untyped
  * `byte[]`; typing is a client-side codec convention — see graft.codec).
  *
  * Keys are zero-padded ASCII so Spark's `StringType` ordering coincides
  * with the reference's unsigned byte-lexicographic `CellComparatorImpl`
  * order (CellComparatorImpl.java:46).
  */
final case class GCell(
    row: String,
    family: String,
    qualifier: String,
    ts: Long,
    `type`: String,
    value: String
)

/** Cell mutation types (reference: Cell.java:146-155). */
object CellType {
  val Put                 = "Put"
  val Delete              = "Delete"              // exact (row,fam,qual,ts)
  val DeleteColumn        = "DeleteColumn"        // (row,fam,qual), ts <= marker
  val DeleteFamily        = "DeleteFamily"        // (row,fam), ts <= marker
  val DeleteFamilyVersion = "DeleteFamilyVersion" // (row,fam), ts == marker
  val all: Seq[String] =
    Seq(Put, Delete, DeleteColumn, DeleteFamily, DeleteFamilyVersion)
}

object CellSchema {
  /** Canonical CellSet schema (SURVEY.md §1.3). */
  val schema: StructType = StructType(Seq(
    StructField("row", StringType, nullable = false),
    StructField("family", StringType, nullable = false),
    StructField("qualifier", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("value", StringType, nullable = true)
  ))

  val columns: Seq[String] =
    Seq("row", "family", "qualifier", "ts", "type", "value")
}
