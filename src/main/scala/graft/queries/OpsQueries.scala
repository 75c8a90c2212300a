package graft.queries

import org.apache.spark.sql.functions._

import graft.QDef
import graft.model.Fixtures
import graft.oracle.Cte

/** Q108+: cluster-operations tooling — pre-split planning
  * (RegionSplitter), space quotas, diagnostic printers, the canary
  * probe. Each runs the real admin surface and exposes its output (or
  * the partition/report it produces) to the DuckDB oracle.
  */
object OpsQueries {

  val defs: Seq[QDef] = Seq(
    QDef(
      // RegionSplitter pre-split planning (RegionSplitter.java:825,
      // :842, :1048): all three split algorithms plan a 7-way
      // pre-split (7 does NOT divide any of the keyspaces — the last
      // region absorbs the slop, the part worth pinning), then the
      // plan is USED: orders keys hash-route to their region via a
      // broadcast range join (the TotalOrderPartitioner companion
      // shape — at 100 TB the same join partitions the bulk-load).
      // HEX/UNI route md5 prefixes; DEC routes the md5-derived
      // decimal rendering. The oracle re-derives every boundary from
      // the split arithmetic (BigInteger division, lowercase
      // rendering, zero-pad) and re-counts the routing.
      "q109_region_splitter",
      (s, dir) => {
        import graft.admin.RegionSplit
        val n = 7
        val algos = Seq(
          ("DEC", "00000000", RegionSplit.decimalStringSplit(n)),
          ("HEX", "00000000", RegionSplit.hexStringSplit(n)),
          ("UNI", "", RegionSplit.uniformSplit(n).map(RegionSplit.hex)))
        // region r of n covers [start(r), end(r)): start(0) = firstRow,
        // else boundary r-1; end(n-1) = a sentinel above the keyspace
        val regionRows = algos.flatMap { case (algo, first, bs) =>
          val starts = first +: bs
          val ends = bs :+ "~" // 0x7e, sorts after every hex/dec digit
          starts.indices.map(r => (algo, r.toLong, starts(r), ends(r)))
        }
        import s.implicits._
        val regDf = regionRows.toDF("algo", "region", "start_key", "end_key")
        val o = Fixtures.orders(s, dir)
        val h = md5(col("o_orderkey").cast("string").cast("binary"))
        val keyed = o.select(lit("DEC").as("algo"),
            lpad((conv(substring(h, 1, 8), 16, 10).cast("long") % 100000000L)
              .cast("string"), 8, "0").as("key"))
          .unionByName(o.select(lit("HEX").as("algo"),
            substring(h, 1, 8).as("key")))
          .unionByName(o.select(lit("UNI").as("algo"),
            substring(h, 1, 16).as("key")))
        val counts = keyed.join(broadcast(regDf),
            keyed("algo") === regDf("algo") &&
              keyed("key") >= regDf("start_key") &&
              keyed("key") < regDf("end_key"))
          .groupBy(regDf("algo").as("algo"), col("region"))
          .agg(count(lit(1)).as("n"))
        regDf.join(counts, Seq("algo", "region"), "left")
          .select(col("algo"), col("region"),
            col("start_key"), coalesce(col("n"), lit(0L)).as("n_rows"))
          .orderBy("algo", "region")
      },
      Some(
        """WITH __rs_b(algo, idx, k) AS (
          |  SELECT 'HEX', i, lpad(lower(to_hex(i * (4294967296 // 7))), 8, '0')
          |  FROM generate_series(1, 6) t(i)
          |  UNION ALL
          |  SELECT 'DEC', i, lpad(CAST(i * (100000000 // 7) AS VARCHAR), 8, '0')
          |  FROM generate_series(1, 6) t(i)
          |  UNION ALL
          |  SELECT 'UNI', i,
          |    lpad(lower(to_hex(CAST((i::HUGEINT * (18446744073709551616::HUGEINT // 7))
          |      // 4294967296 AS BIGINT))), 8, '0') ||
          |    lpad(lower(to_hex(CAST((i::HUGEINT * (18446744073709551616::HUGEINT // 7))
          |      % 4294967296 AS BIGINT))), 8, '0')
          |  FROM generate_series(1, 6) t(i)
          |), __rs_regions AS (
          |  SELECT x.algo, x.r,
          |    CASE WHEN x.r = 0 THEN CASE x.algo WHEN 'UNI' THEN '' ELSE '00000000' END
          |         ELSE (SELECT k FROM __rs_b b WHERE b.algo = x.algo AND b.idx = x.r)
          |    END AS start_key
          |  FROM (SELECT a.algo, t.r
          |        FROM (SELECT DISTINCT algo FROM __rs_b) a
          |        CROSS JOIN generate_series(0, 6) t(r)) x
          |), __rs_keys AS (
          |  SELECT 'HEX' AS algo, substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS key
          |  FROM orders
          |  UNION ALL
          |  SELECT 'DEC', lpad(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
          |    % 100000000 AS VARCHAR), 8, '0')
          |  FROM orders
          |  UNION ALL
          |  SELECT 'UNI', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 16)
          |  FROM orders
          |), __rs_assign AS (
          |  SELECT k.algo,
          |    (SELECT COUNT(*) FROM __rs_b b WHERE b.algo = k.algo AND b.k <= k.key) AS r
          |  FROM __rs_keys k
          |)
          |SELECT g.algo AS algo, CAST(g.r AS BIGINT) AS region, g.start_key,
          |       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_rows
          |FROM __rs_regions g
          |LEFT JOIN (SELECT algo, r, COUNT(*) AS n FROM __rs_assign GROUP BY 1, 2) c
          |  ON g.algo = c.algo AND g.r = c.r
          |ORDER BY 1, 2""".stripMargin)
    )
  )
}
