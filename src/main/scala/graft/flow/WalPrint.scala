package graft.flow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WALPrettyPrinter twin (hbase-server/.../wal/WALPrettyPrinter.java:
  * 64-229) — the operator's log-inspection tool. Filters compose
  * exactly like the reference's setters: sequence (:149), region
  * (:165), exact row (:173), row prefix (:181); `outputValues` (:121)
  * toggles the value column, `outputOnlyRowKey` (:186) reduces each
  * cell line to its row key. `position` (:196 — a byte offset to seek
  * one file) is a single-file streaming knob with no Spark analogue
  * (segments split into tasks whole); callers scope by segment glob
  * instead.
  *
  * Input is the WALInputFormat frame ([[PWalFiles.importEntries]] —
  * one output row per cell with its WALKey columns alongside); the
  * printer itself is pure column pruning + predicates, so Catalyst
  * fuses it into the segment scan.
  */
object WalPrint {

  /** One printed line per surviving cell: the WALKey fields, the cell
    * coordinate (`column` = family:qualifier like printCell), and the
    * value (null unless `outputValues`) + its length. */
  def print(entries: DataFrame,
      region: Option[String] = None,
      sequence: Option[Long] = None,
      row: Option[String] = None,
      rowPrefix: Option[String] = None,
      outputValues: Boolean = false,
      outputOnlyRowKey: Boolean = false): DataFrame = {
    require(row.isEmpty || rowPrefix.isEmpty,
      "row and rowPrefix are mutually exclusive (WALPrettyPrinter.java:300)")
    var df = entries
    region.foreach(r => df = df.filter(col("wal_region") === r))
    sequence.foreach(q => df = df.filter(col("wal_seq") === q))
    row.foreach(r => df = df.filter(col("row") === r))
    rowPrefix.foreach(p => df = df.filter(col("row").startsWith(p)))
    if (outputOnlyRowKey) df.select(col("row"))
    else df.select(
      col("wal_table"), col("wal_region"), col("wal_seq"), col("write_time"),
      col("row"),
      concat(col("family"), lit(":"), col("qualifier")).as("column"),
      col("ts"), col("type"),
      octet_length(coalesce(col("value"), lit(""))).cast("long")
        .as("value_len"),
      (if (outputValues) col("value") else lit(null).cast("string"))
        .as("value"))
  }
}
