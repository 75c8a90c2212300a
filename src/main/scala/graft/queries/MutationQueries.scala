package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.QDef
import graft.model.Fixtures
import graft.oracle.Cte
import graft.write.Mutations

/** Q31–Q33: mutation semantics as batch folds; Q36: ITBLL-style chain
  * integrity verify (SURVEY §2.9, §5).
  */
object MutationQueries {

  val defs: Seq[QDef] = Seq(
    QDef(
      // M3/M4 setReturnResults (VERDICT r4 gap #4): every RMW op's
      // post-image, in commit order — ONE running-fold window per key
      // serves both the Increment post-sum and the Append post-seq.
      // The window frame is sequential per key, so the double running
      // sum is order-stable (same fold order on both engines);
      // ROUND(.,4) absorbs representation noise as in q31.
      "q81_rmw_returning",
      (s, dir) =>
        Mutations.rmwReturning(Fixtures.events(s, dir),
            keys = Seq(col("user_id")), delta = col("value"),
            appendVal = col("event_type"),
            orderBy = Seq(col("ts"), col("event_id")), sep = ",")
          .select(col("user_id"), col("event_id"),
            round(col("post_sum"), 4).as("post_sum"), col("post_seq"))
          .orderBy("user_id", "event_id"),
      Some("""SELECT user_id, event_id,
             |       ROUND(SUM(value) OVER w, 4) AS post_sum,
             |       string_agg(event_type, ',') OVER w AS post_seq
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)
    ),
    QDef(
      // Known boundary: SUM over doubles is FP-order-dependent on both
      // engines; ROUND(.,4) absorbs partition-order noise and has held
      // at every tested SF/parallelism, but a sum landing exactly on a
      // .00005 boundary could flip the last digit between engines.
      "q31_increment_fold",
      (s, dir) =>
        Mutations.incrementFold(Fixtures.events(s, dir),
            keys = Seq(col("user_id")), delta = col("value"))
          .select(col("user_id"), round(col("value"), 4).as("total"))
          .orderBy("user_id"),
      Some("""SELECT user_id, ROUND(SUM(value), 4) AS total
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),
    QDef(
      // M4 per-op TimeRange (Increment.setTimeRange, Increment.java
      // :148): only deltas inside [Jan 8, Jan 15) participate.
      "q46_increment_timerange",
      (s, dir) =>
        Mutations.incrementFold(Fixtures.events(s, dir),
            keys = Seq(col("user_id")), delta = col("value"),
            timeRange = Some((1704672000000000000L, 1705276800000000000L)))
          .select(col("user_id"), round(col("value"), 4).as("total"))
          .orderBy("user_id"),
      Some("""SELECT user_id, ROUND(SUM(value), 4) AS total FROM events
             |WHERE epoch_ns(ts) >= 1704672000000000000 AND epoch_ns(ts) < 1705276800000000000
             |GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),
    QDef(
      "q32_append_fold",
      (s, dir) =>
        Mutations.appendFold(Fixtures.events(s, dir),
            keys = Seq(col("user_id")), value = col("event_type"),
            orderBy = Seq(col("ts"), col("event_id")), sep = ",")
          .select(col("user_id"), col("value").as("seq"))
          .orderBy("user_id"),
      Some("""SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),
    QDef(
      // M3 per-op TimeRange (Append.setTimeRange — the
      // TestAppendTimeRange contract, symmetric with q46's Increment
      // window): only appends inside [Jan 8, Jan 15) participate in
      // the per-key ordered concat.
      "q103_append_timerange",
      (s, dir) =>
        Mutations.appendFold(Fixtures.events(s, dir),
            keys = Seq(col("user_id")), value = col("event_type"),
            orderBy = Seq(col("ts"), col("event_id")), sep = ",",
            timeRange = Some((1704672000000000000L, 1705276800000000000L)))
          .select(col("user_id"), col("value").as("seq"))
          .orderBy("user_id"),
      Some("""SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
             |FROM events
             |WHERE epoch_ns(ts) >= 1704672000000000000 AND epoch_ns(ts) < 1705276800000000000
             |GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),
    QDef(
      "q33_check_and_mutate",
      (s, dir) => {
        val cells = Fixtures.cellsOrders(s, dir)
        val mutated = Mutations.checkAndMutate(
          cells,
          Mutations.Guard("d", "o_orderstatus", col("value") === "F"),
          hit => hit.withColumn("value",
            when(col("qualifier") === "o_orderpriority", lit("X"))
              .otherwise(col("value"))))
        mutated
          .filter(col("qualifier") === "o_orderpriority" && col("value") === "X")
          .agg(count_distinct(col("row")).as("changed_rows"))
      },
      Some(Cte.withCtes(Cte.cellsOrders)(
        """SELECT COUNT(DISTINCT row) AS changed_rows FROM cells_orders
          |WHERE family = 'd' AND qualifier = 'o_orderstatus' AND value = 'F'""".stripMargin))
    ),
    QDef(
      // M5 CheckAndMutate with an ARBITRARY Filter guard (CheckAndMutate
      // .java ifMatches(Filter), Table.java:380): the guard is a full
      // FilterList OR of two SCVFs, compiled by FilterCompiler.
      "q42_cas_filter_guard",
      (s, dir) => {
        import graft.filter._
        val cells = Fixtures.cellsOrders(s, dir)
        val mutated = Mutations.checkAndMutate(
          cells,
          FilterList.or(
            SingleColumnValueFilter("d", "o_orderstatus", CompareOp.Equal,
              BinaryComparator("P"), filterIfMissing = true),
            SingleColumnValueFilter("d", "o_orderpriority", CompareOp.Equal,
              BinaryComparator("1-URGENT"), filterIfMissing = true)),
          hit => hit.withColumn("value",
            when(col("qualifier") === "o_custkey", lit("CAS"))
              .otherwise(col("value"))))
        mutated
          .filter(col("qualifier") === "o_custkey" && col("value") === "CAS")
          .agg(count_distinct(col("row")).as("changed_rows"))
      },
      Some(Cte.withCtes(Cte.cellsOrders)(
        """SELECT COUNT(DISTINCT row) AS changed_rows FROM cells_orders WHERE row IN (
          |  SELECT row FROM cells_orders WHERE family = 'd' AND qualifier = 'o_orderstatus' AND value = 'P'
          |  UNION
          |  SELECT row FROM cells_orders WHERE family = 'd' AND qualifier = 'o_orderpriority' AND value = '1-URGENT'
          |)""".stripMargin))
    ),
    QDef(
      "q36_chain_verify",
      (s, _) => {
        val c = Fixtures.chain(s)
        val p = c.select(col("id").as("pid"))
        c.filter(col("prev").isNotNull)
          .join(p, col("prev") === col("pid"), "left_anti")
          .agg(count(lit(1)).as("broken"))
      },
      Some(Cte.withCtes(Cte.chain)(
        """SELECT COUNT(*) AS broken FROM chain c
          |LEFT JOIN chain p ON c.prev = p.id
          |WHERE c.prev IS NOT NULL AND p.id IS NULL""".stripMargin))
    ),
    QDef(
      // Nonce idempotency on the non-idempotent mutations
      // (ServerNonceManager.java:36-160, HConstants.NO_NONCE = 0): a
      // client retry re-sends the SAME (nonceGroup, nonce) and must
      // apply ONCE; a genuinely new op (fresh nonce) applies; a
      // nonce-LESS duplicate (NO_NONCE) double-applies — the
      // reference's explicit contract. The batch: every event as an
      // increment op (nonce = event_id + 1), user_id%5 ops re-sent
      // verbatim (retries — collapse), user_id%7 ops re-sent under a
      // FRESH nonce (count twice), user_id%11 ops duplicated with
      // NO_NONCE (count twice — untracked). Oracle: per-user factor
      // 1 + [7|uid] + [11|uid]; the %5 retries contribute nothing.
      "q115_nonce_idempotency",
      (s, dir) => {
        val ev = Fixtures.events(s, dir).select(
          col("user_id"), col("value"), col("ts").cast("long").as("ts"),
          col("event_id"))
        // nonce = event_id + 1: the fixture's ids start at 0, and an
        // unshifted id 0 would put that op on the NO_NONCE sentinel
        // (untracked — its retry would double-apply if its user ever
        // landed in the %5 slice). FixtureInvariantsSpec pins the
        // uniqueness + range assumptions.
        val ops = ev.select(col("user_id"), col("value"), col("ts"),
          lit(1L).as("nonce_group"),
          (col("event_id").cast("long") + 1L).as("nonce"))
        val retries = ops.filter(col("user_id") % 5 === 0)
        // fresh nonce = nonce + 10^12: collision-free with every
        // original nonce (event_ids are far below 10^12) and never 0 —
        // negation would map onto NO_NONCE for id -1 and silently
        // assume globally unique event_ids
        val fresh = ops.filter(col("user_id") % 7 === 0)
          .withColumn("nonce", col("nonce") + lit(1000000000000L))
        val nonceless = ops.filter(col("user_id") % 11 === 0)
          .withColumn("nonce", lit(0L))
        val batch = ops.unionByName(retries).unionByName(fresh)
          .unionByName(nonceless)
        Mutations.incrementFold(
            Mutations.dedupNonces(batch, col("nonce_group"), col("nonce")),
            keys = Seq(col("user_id")), delta = col("value"))
          .select(col("user_id"), round(col("value"), 4).as("total"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |       ROUND(SUM(value * (1 + CASE WHEN user_id % 7 = 0 THEN 1 ELSE 0 END
             |                            + CASE WHEN user_id % 11 = 0 THEN 1 ELSE 0 END)), 4)
             |         AS total
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
    )
  )
}
