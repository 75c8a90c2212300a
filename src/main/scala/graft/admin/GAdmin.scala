package graft.admin

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.model.CellSchema
import graft.write.BucketedStore

/** Admin surface — the graft twin of the reference's `Admin` API
  * (hbase-client/.../client/Admin.java: `createTable`, `deleteTable`,
  * `disableTable/enableTable`, `snapshot:~1487`, `cloneSnapshot`,
  * `listTableNames`). Tables are catalog entries over bucketed cell
  * stores (see [[BucketedStore]]); snapshots are point-in-time copies
  * (the reference snapshots HFile manifests — immutable parquet plays
  * the same role, a full copy here since we own no file-manifest
  * layer). Disable/enable is a catalog property — reads check it the
  * way the reference's master rejects ops on disabled tables.
  */
object GAdmin {

  /** Table names are interpolated into SQL — restrict to identifier
    * characters (the reference enforces its own name charset,
    * TableName.isLegalTableQualifierName). */
  private def qualified(name: String) = {
    require(name.matches("[A-Za-z0-9_]+"),
      s"illegal table name '$name': only [A-Za-z0-9_] allowed")
    s"graft_$name"
  }

  /** Create an empty cell table (bucketed region layout). Families are
    * schema metadata in graft (the cell schema is universal); they are
    * recorded as a table property for describe-parity. */
  def createTable(spark: SparkSession, name: String, path: String,
      families: Seq[String] = Seq("d"), buckets: Int = 16): Unit = {
    // families are interpolated into SET TBLPROPERTIES — same identifier
    // charset guard as table names
    families.foreach(f => require(f.matches("[A-Za-z0-9_]+"),
      s"illegal family name '$f': only [A-Za-z0-9_] allowed"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], CellSchema.schema)
    BucketedStore.write(empty, qualified(name), s"$path/$name", buckets)
    spark.sql(s"ALTER TABLE ${qualified(name)} SET TBLPROPERTIES " +
      s"('graft.families' = '${families.mkString(",")}', 'graft.enabled' = 'true')")
  }

  def listTables(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_")).map(_.stripPrefix("graft_")).toSeq

  private def prop(spark: SparkSession, name: String, key: String): Option[String] =
    spark.sql(s"SHOW TBLPROPERTIES ${qualified(name)}")
      .collect().find(_.getString(0) == key).map(_.getString(1))

  def isEnabled(spark: SparkSession, name: String): Boolean =
    prop(spark, name, "graft.enabled").forall(_ == "true")

  def disableTable(spark: SparkSession, name: String): Unit =
    spark.sql(s"ALTER TABLE ${qualified(name)} SET TBLPROPERTIES ('graft.enabled' = 'false')")

  def enableTable(spark: SparkSession, name: String): Unit =
    spark.sql(s"ALTER TABLE ${qualified(name)} SET TBLPROPERTIES ('graft.enabled' = 'true')")

  /** Read a table; rejects disabled tables like the reference's
    * `TableNotEnabledException` path. */
  def table(spark: SparkSession, name: String): DataFrame = {
    require(isEnabled(spark, name), s"table $name is disabled")
    spark.table(qualified(name))
  }

  /** Append a mutation batch (Put/Delete cells) to the table store —
    * merge-on-read semantics, reconciliation at scan time (Resolve).
    * Rejected on a disabled table, like the reference's
    * TableNotEnabledException on mutate. */
  def put(spark: SparkSession, name: String, cells: DataFrame): Unit = {
    require(isEnabled(spark, name), s"table $name is disabled")
    cells.select(CellSchema.columns.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Append).insertInto(qualified(name))
  }

  /** Point-in-time snapshot: immutable copy of the current store.
    * Deliberately allowed on DISABLED tables too — the reference
    * supports offline snapshots (SnapshotType of a disabled table). */
  def snapshot(spark: SparkSession, name: String, snapName: String,
      path: String): Unit =
    spark.table(qualified(name)).write.mode(SaveMode.ErrorIfExists)
      .parquet(s"$path/$snapName")

  /** Clone a snapshot into a new (bucketed) table. */
  def cloneSnapshot(spark: SparkSession, snapPath: String, newName: String,
      path: String, buckets: Int = 16): Unit =
    BucketedStore.write(spark.read.schema(CellSchema.schema).parquet(snapPath),
      qualified(newName), s"$path/$newName", buckets)

  def deleteTable(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${qualified(name)}")
}
