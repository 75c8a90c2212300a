package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.flow.Jobs
import graft.model.{CellType, Cellify, Fixtures}
import graft.oracle.Cte
import graft.stream.WalStream

/** Q73–Q76, Q79: declared-query gates for the dataflow jobs that were
  * previously spec-only (SURVEY §2.7 D3/D4/D5, §2.5 M10 + §2.7 D11,
  * §2.8 serial apply). Each runs the real tool — including its durable
  * write where the tool IS a writer — and exposes the result (or its
  * layout invariants) to the DuckDB oracle.
  */
object FlowQueries {

  private val outCols = Seq("row", "family", "qualifier", "ts", "value")

  private def tmpDir(pfx: String): String = graft.Queries.scratchDir(pfx)

  val defs: Seq[QDef] = Seq(
    QDef(
      // D3 Export (mapreduce/Export.java:43) + Import (Import.java:88):
      // dump a predicated scan to files, re-ingest with an import-side
      // filter and a family rename — the full roundtrip, through the
      // durable parquet boundary, not a plan-fusion shortcut.
      "q73_export_import",
      (s, dir) => {
        val cells = Fixtures.cellsOrders(s, dir)
        val tmp = tmpDir("export_q")
        Jobs.export(cells,
          Some(col("qualifier") === "o_orderstatus" ||
            col("qualifier") === "o_orderpriority"), s"$tmp/export")
        Jobs.importCells(s, s"$tmp/export",
            pred = Some(col("value") =!= "F"),
            familyRename = Map("d" -> "e"))
          .select(outCols.map(col): _*)
          .orderBy(col("row"), col("family"), col("qualifier"), col("ts").desc)
      },
      Some(Cte.withCtes(Cte.cellsOrders)(
        """SELECT row, 'e' AS family, qualifier, ts, value FROM cells_orders
          |WHERE qualifier IN ('o_orderstatus', 'o_orderpriority') AND value <> 'F'
          |ORDER BY row, family, qualifier, ts DESC""".stripMargin))
    ),
    QDef(
      // D4 ImportTsv (ImportTsv.java:75): a real TSV file set parsed
      // under a positional column spec (HBASE_ROW_KEY + family:qualifier
      // pairs) into Put cells at an import timestamp. The TSV itself is
      // derived deterministically from `orders`, so the oracle can
      // rebuild the expected cells from the parquet directly.
      "q74_import_tsv",
      (s, dir) => {
        val tmp = tmpDir("tsv_q")
        Fixtures.orders(s, dir)
          .select(Cellify.padKey(col("o_orderkey")),
            col("o_orderstatus"), col("o_orderpriority"))
          .write.option("sep", "\t").mode("overwrite").csv(s"$tmp/tsv")
        Jobs.importTsv(s, s"$tmp/tsv",
            Seq("HBASE_ROW_KEY", "d:status", "d:priority"), ts = 7L)
          .select(outCols.map(col): _*)
          .orderBy(col("row"), col("family"), col("qualifier"), col("ts").desc)
      },
      Some(
        """SELECT * FROM (
          |  SELECT lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS row, 'd' AS family,
          |         'status' AS qualifier, CAST(7 AS BIGINT) AS ts, o_orderstatus AS value
          |  FROM orders
          |  UNION ALL
          |  SELECT lpad(CAST(o_orderkey AS VARCHAR), 10, '0'), 'd',
          |         'priority', CAST(7 AS BIGINT), o_orderpriority
          |  FROM orders
          |) ORDER BY row, family, qualifier, ts DESC""".stripMargin)
    ),
    QDef(
      // D5 CopyTable (CopyTable.java:55): predicated copy with family
      // rename, landed durably and read back from the copy — the
      // scan→rename→write pipeline, not a view.
      "q75_copy_table",
      (s, dir) => {
        val tmp = tmpDir("copy_q")
        Jobs.copyTable(Fixtures.cellsOrders(s, dir),
          Some(col("row") < "0000000500"), Map("d" -> "c"), s"$tmp/copy")
        s.read.parquet(s"$tmp/copy")
          .select(outCols.map(col): _*)
          .orderBy(col("row"), col("family"), col("qualifier"), col("ts").desc)
      },
      Some(Cte.withCtes(Cte.cellsOrders)(
        """SELECT row, 'c' AS family, qualifier, ts, value FROM cells_orders
          |WHERE row < '0000000500'
          |ORDER BY row, family, qualifier, ts DESC""".stripMargin))
    ),
    QDef(
      // M10 bulk load + D11 total-order partitioner
      // (HFileOutputFormat2.java:109, SimpleTotalOrderPartitioner.java:42):
      // land the region layout (8 range-partitioned, within-sorted
      // "HFiles"), read the files back, and assert the layout contract
      // the reference's load path depends on: every cell present, the
      // declared region count, regions pairwise DISJOINT in row-range,
      // and rows non-decreasing in each file's physical order. A writer
      // that shuffled randomly or skipped the sort cannot pass.
      "q76_bulk_load_layout",
      (s, dir) => {
        val tmp = tmpDir("bulkload_q")
        Jobs.bulkLoadLayout(Fixtures.cellsOrders(s, dir), 8, s"$tmp/bl")
        // monotonically_increasing_id follows read order, and a parquet
        // scan reads each file's rows contiguously in file order — so a
        // per-file lag() over it sees the physical cell order.
        val w = Window.partitionBy(col("fid")).orderBy(col("mid"))
        val perRegion = s.read.parquet(s"$tmp/bl")
          .withColumn("fid", input_file_name())
          .withColumn("mid", monotonically_increasing_id())
          .withColumn("unsorted",
            when(lag(col("row"), 1).over(w) > col("row"), 1).otherwise(0))
          .groupBy("fid")
          .agg(min(col("row")).as("lo"), max(col("row")).as("hi"),
            count(lit(1)).as("n"), sum(col("unsorted")).as("uns"))
        val summary = perRegion.agg(
          count(lit(1)).as("n_regions"), sum(col("n")).as("n_cells"),
          sum(col("uns")).as("unsorted_pairs"))
        val overlaps = perRegion.alias("a")
          .join(perRegion.alias("b"),
            col("a.fid") < col("b.fid") &&
              col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
          .agg(count(lit(1)).as("overlap_pairs"))
        summary.crossJoin(overlaps)
      },
      Some(Cte.withCtes(Cte.cellsOrders)(
        """SELECT CAST(8 AS BIGINT) AS n_regions, COUNT(*) AS n_cells,
          |       CAST(0 AS BIGINT) AS unsorted_pairs, CAST(0 AS BIGINT) AS overlap_pairs
          |FROM cells_orders""".stripMargin))
    ),
    QDef(
      // Serial replication apply (ReplicationSink.java + the serial-peer
      // sequenceId ordering of ReplicationSourceManager): the sink
      // resolves same-coordinate conflicts by WAL sequence id, so a
      // re-sent entry with a higher seq supersedes the original even at
      // an identical cell timestamp. Fixture: the event WAL plus a
      // re-send of every event_type Put at seq+5 with a rewritten value
      // — the apply must keep exactly the re-sent values while
      // tombstones and unconflicted cells pass through unchanged.
      "q79_serial_apply",
      (s, dir) => {
        val wal = Fixtures.cellsEventsV(s, dir)
          .withColumn("seq", col("ts") * 10 + 1)
        val resend = wal
          .filter(col("type") === CellType.Put && col("qualifier") === "event_type")
          .withColumn("seq", col("seq") + 5)
          .withColumn("value", concat(lit("v2:"), col("value")))
        WalStream.applyBatch(wal.unionByName(resend), seqCol = Some("seq"))
          .select(col("row"), col("family"), col("qualifier"), col("ts"),
            col("type"), col("value"))
          .orderBy(col("row"), col("family"), col("qualifier"),
            col("ts").desc, col("type"))
      },
      Some(Cte.withCtes(Cte.cellsEventsV,
        """__wal_all AS (
          |  SELECT row, family, qualifier, ts, type, value, ts * 10 + 1 AS seq
          |  FROM cells_events_v
          |  UNION ALL
          |  SELECT row, family, qualifier, ts, type, 'v2:' || value, ts * 10 + 6
          |  FROM cells_events_v WHERE type = 'Put' AND qualifier = 'event_type')""".stripMargin)(
        """SELECT row, family, qualifier, ts, type, value FROM (
          |  SELECT *, row_number() OVER (PARTITION BY row, family, qualifier, ts, type ORDER BY seq DESC) AS rn
          |  FROM __wal_all
          |) WHERE rn = 1 ORDER BY row, family, qualifier, ts DESC, type""".stripMargin))
    ),
    QDef(
      // Bulk-load REPLICATION (HBASE-13153 — ReplicationSink
      // .replicateEntries + HFileReplicator, the
      // hbase.replication.bulkload.enabled path): a bulk load lands
      // store files directly, leaving NO per-cell WAL entries — only a
      // BULK_LOAD descriptor naming the files — so a peer applying WAL
      // cells alone silently loses every bulk-loaded cell. Fixture:
      // the props-qualifier Puts bulk-load as real HFiles while
      // everything else travels as WAL cells; the sink applies the WAL
      // slice AND imports the descriptor-named files — the peer's view
      // must equal the COMPLETE source table.
      "q102_bulkload_replication",
      (s, dir) => {
        import graft.stream.WalMeta
        val cells = Fixtures.cellsEventsV(s, dir)
        val isBulk = col("type") === CellType.Put &&
          col("qualifier") === "props" && col("value").isNotNull
        val out = tmpDir("q102_blrep")
        graft.flow.HFiles.export(cells.filter(isBulk), numRegions = 4,
          outPath = s"$out/bl")
        val fs = new org.apache.hadoop.fs.Path(out)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val files = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$out/bl", "part-*.hfile"))
          .map(_.getPath.toString).sorted.toSeq
        val wal = cells.filter(not(isBulk))
          .unionByName(WalMeta.bulkLoadMarker(s, "0000000000", 9L, files))
        WalStream.applyBatchWithBulkLoads(wal)
          .select("row", "family", "qualifier", "ts", "type", "value")
          .orderBy("row", "family", "qualifier", "ts", "type")
      },
      Some(Cte.withCtes(Cte.cellsEventsV)(
        """SELECT row, family, qualifier, ts, type, value
          |FROM cells_events_v
          |ORDER BY row, family, qualifier, ts, type""".stripMargin))
    )
  )
}
