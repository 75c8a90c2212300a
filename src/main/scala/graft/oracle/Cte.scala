package graft.oracle

/** DuckDB SQL equivalents of the [[graft.model.Fixtures]] cellified
  * views, as CTE bodies spliced into every oracle query. The driver runs
  * these against the same parquet tables (registered by bare table name)
  * and hash-compares with the Spark result — so each CTE here must stay
  * in exact lockstep with its Spark twin in Cellify/Fixtures.
  */
object Cte {

  /** One SELECT per orders column, canonical string values. */
  private def ordersSelect(keyExpr: String, pred: String): String = {
    val quals = Seq(
      "o_custkey"       -> "CAST(o_custkey AS VARCHAR)",
      "o_orderstatus"   -> "o_orderstatus",
      "o_totalprice"    -> "printf('%.2f', o_totalprice)",
      "o_orderdate"     -> "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')",
      "o_orderpriority" -> "o_orderpriority"
    )
    quals
      .map { case (q, v) =>
        s"SELECT $keyExpr AS row, 'd' AS family, '$q' AS qualifier, " +
          s"CAST(1 AS BIGINT) AS ts, 'Put' AS type, $v AS value FROM orders$pred"
      }
      .mkString(" UNION ALL ")
  }

  val cellsOrders: String =
    s"cells_orders AS (${ordersSelect("lpad(CAST(o_orderkey AS VARCHAR), 10, '0')", "")})"

  val cellsOrdersMut: String = {
    val base =
      s"""__mut_base AS (
         |  SELECT row, family, qualifier, ts, type,
         |         CASE WHEN CAST(row AS BIGINT) % 11 = 0 AND qualifier = 'o_totalprice'
         |              THEN value || '_mut' ELSE value END AS value
         |  FROM cells_orders WHERE CAST(row AS BIGINT) % 19 <> 0
         |)""".stripMargin
    val extra =
      s"__mut_extra AS (${ordersSelect("lpad(CAST(o_orderkey + 1000000000 AS VARCHAR), 10, '0')", " WHERE o_orderkey < 500")})"
    s"$base, $extra, cells_orders_mut AS (SELECT * FROM __mut_base UNION ALL SELECT * FROM __mut_extra)"
  }

  /** Multi-version + tombstone fixture (see Fixtures.cellsEventsV). */
  val cellsEventsV: String =
    """__ev AS (
      |  SELECT user_id, event_type, value, props,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS r
      |  FROM events
      |), __ev5 AS (SELECT * FROM __ev WHERE r <= 5),
      |__ev_users AS (SELECT DISTINCT user_id, lpad(CAST(user_id AS VARCHAR), 10, '0') AS row FROM events),
      |cells_events_v AS (
      |  SELECT lpad(CAST(user_id AS VARCHAR), 10, '0') AS row, 'd' AS family,
      |         'event_type' AS qualifier, CAST(r AS BIGINT) AS ts, 'Put' AS type, event_type AS value FROM __ev5
      |  UNION ALL
      |  SELECT lpad(CAST(user_id AS VARCHAR), 10, '0'), 'd', 'value', CAST(r AS BIGINT), 'Put', printf('%.4f', value) FROM __ev5
      |  UNION ALL
      |  SELECT lpad(CAST(user_id AS VARCHAR), 10, '0'), 'd', 'props', CAST(r AS BIGINT), 'Put', props FROM __ev5
      |  UNION ALL
      |  SELECT row, 'd', 'value', CAST(3 AS BIGINT), 'DeleteColumn', NULL FROM __ev_users WHERE user_id % 7 = 0
      |  UNION ALL
      |  SELECT row, 'd', '', CAST(2 AS BIGINT), 'DeleteFamily', NULL FROM __ev_users WHERE user_id % 13 = 0
      |  UNION ALL
      |  SELECT row, 'd', 'props', CAST(4 AS BIGINT), 'Delete', NULL FROM __ev_users WHERE user_id % 17 = 0
      |)""".stripMargin

  /** Tombstone-masked live puts of `src` (Resolve.maskTombstones twin),
    * emitted as CTE `out`. Internal CTE names are prefixed with `out`
    * so multiple instantiations can coexist in one oracle query.
    * `tombVisibleBelow` mirrors the KEEP_DELETED_CELLS ceiling: only
    * tombstones with ts strictly below it mask. */
  def liveView(src: String, out: String,
      tombVisibleBelow: Option[Long] = None): String = {
    val ceil = tombVisibleBelow.fold("")(m => s" AND ts < $m")
    s"""__${out}_puts AS (SELECT * FROM $src WHERE type = 'Put'),
       |__${out}_dfam AS (SELECT row, family, max(ts) AS mts FROM $src WHERE type = 'DeleteFamily'$ceil GROUP BY 1, 2),
       |__${out}_dcol AS (SELECT row, family, qualifier, max(ts) AS mts FROM $src WHERE type = 'DeleteColumn'$ceil GROUP BY 1, 2, 3),
       |__${out}_dver AS (SELECT DISTINCT row, family, qualifier, ts FROM $src WHERE type = 'Delete'$ceil),
       |__${out}_dfv AS (SELECT DISTINCT row, family, ts FROM $src WHERE type = 'DeleteFamilyVersion'$ceil),
       |$out AS (
       |  SELECT p.row, p.family, p.qualifier, p.ts, p.type, p.value FROM __${out}_puts p
       |  LEFT JOIN __${out}_dfam f ON p.row = f.row AND p.family = f.family
       |  LEFT JOIN __${out}_dcol c ON p.row = c.row AND p.family = c.family AND p.qualifier = c.qualifier
       |  WHERE (f.mts IS NULL OR p.ts > f.mts)
       |    AND (c.mts IS NULL OR p.ts > c.mts)
       |    AND NOT EXISTS (SELECT 1 FROM __${out}_dver v WHERE v.row = p.row AND v.family = p.family AND v.qualifier = p.qualifier AND v.ts = p.ts)
       |    AND NOT EXISTS (SELECT 1 FROM __${out}_dfv g WHERE g.row = p.row AND g.family = p.family AND g.ts = p.ts)
       |)""".stripMargin
  }

  /** Back-compat alias used by the scan/filter oracles. */
  val liveEventsV: String = liveView("cells_events_v", "live_events")

  /** chain — Fixtures.chain twin. */
  val chain: String =
    """chain AS (
      |  SELECT CAST(t.range AS BIGINT) AS id,
      |         CASE WHEN t.range = 0 THEN NULL ELSE CAST(t.range - 1 AS BIGINT) END AS prev,
      |         lpad(CAST(t.range AS VARCHAR), 16, '0') AS rowkey
      |  FROM range(10000) t WHERE t.range % 997 <> 0
      |)""".stripMargin

  def withCtes(parts: String*)(body: String): String =
    s"WITH ${parts.mkString(", ")} $body"
}
