package graft.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.CellType

/** Mutation semantics (SURVEY §2.5) as batch dataflow.
  *
  * The reference's write path is OLTP read-modify-write under row locks
  * (HRegion.batchMutate, HRegion.java:4830 → doMiniBatchMutate:4937);
  * graft re-expresses each mutation kind as its batch-equivalent fold
  * or merge over the CellSet, with read-time resolve (graft.read.Resolve)
  * supplying the LSM semantics: writes are pure appends, exactly like
  * the reference's memstore/HFile model.
  */
object Mutations {

  /** M1 Put / M2 Delete: appending mutation rows to the cell log IS the
    * write (tombstones mask at read). `muts` must be canonical CellSet
    * rows with the appropriate `type`. */
  def applyMutations(cells: DataFrame, muts: DataFrame): DataFrame =
    cells.unionByName(muts)

  /** ServerNonceManager twin (regionserver/ServerNonceManager.java:
    * 36-160, HConstants.NO_NONCE = 0): a client retry of a
    * NON-idempotent op (Increment/Append) re-sends the same
    * (nonceGroup, nonce) pair; the server starts the operation only
    * if that nonce has not already succeeded — so a batch containing
    * retry duplicates must apply each nonce ONCE. Rows carrying
    * NO_NONCE (0) are never tracked and apply every time (the
    * reference's explicit contract — nonce-less retries DO
    * double-apply). Keeps the earliest row per nonce by `commitOrder`
    * (the first attempt to commit wins; later retries observe its
    * result). One aggregation — map-side combine, no window. */
  def dedupNonces(muts: DataFrame, nonceGroup: Column, nonce: Column,
      commitOrder: Column = col("ts")): DataFrame = {
    val tracked = muts.filter(nonce =!= 0L)
      .groupBy(nonceGroup.as("__ng"), nonce.as("__n"))
      .agg(min_by(struct(col("*")), commitOrder).as("__row"))
      .select(col("__row.*"))
    muts.filter(nonce === 0L).unionByName(tracked)
  }

  /** M4 Increment (client/Increment.java:53, HRegion.increment:8343):
    * counters are commutative, so the batch equivalent of N atomic
    * increments is one partial+final SUM per key — the exact dataflow
    * the server serializes per row lock. `timeRange` is the per-op
    * [min,max) window (Increment.setTimeRange, Increment.java:148):
    * only deltas whose `tsCol` falls inside it participate in the
    * fold, mirroring the server consulting only in-range current
    * cells. */
  def incrementFold(deltas: DataFrame, keys: Seq[Column], delta: Column,
      timeRange: Option[(Long, Long)] = None,
      tsCol: Column = col("ts")): DataFrame =
    timeRange.fold(deltas) { case (lo, hi) =>
        deltas.filter(tsCol >= lo && tsCol < hi)
      }
      .groupBy(keys: _*).agg(sum(delta).as("value"))

  /** M3 Append (client/Append.java:51, HRegion.append:8324): ordered
    * byte-concat onto the current value. Batch equivalent: fold all
    * appends per key in commit order. `orderBy` columns define the
    * commit order (the reference uses mvcc/ts order).
    * `timeRange` is the per-op [min,max) window (Append.setTimeRange —
    * the TestAppendTimeRange contract, same shape as Increment's):
    * only cells whose `tsCol` falls inside it participate in the fold.
    * Implemented as collect_list → array_sort → join: a single
    * partial/final aggregate, no window shuffle. */
  def appendFold(appends: DataFrame, keys: Seq[Column], value: Column,
      orderBy: Seq[Column], sep: String = "",
      timeRange: Option[(Long, Long)] = None,
      tsCol: Column = col("ts")): DataFrame = {
    val packed = struct(orderBy :+ value.as("__v"): _*)
    timeRange.fold(appends) { case (lo, hi) =>
        appends.filter(tsCol >= lo && tsCol < hi)
      }
      .groupBy(keys: _*)
      .agg(array_sort(collect_list(packed)).as("__arr"))
      .withColumn("value", array_join(expr("transform(__arr, x -> x.__v)"), sep))
      .drop("__arr")
  }

  /** M3/M4 setReturnResults (Increment.java:91, Append.java:91; the
    * server builds the post-image Result per op — HRegion.increment
    * :8343, HRegion.append:8324): each RMW returns the value AFTER its
    * own application, in commit order. Batch equivalent: the RUNNING
    * fold per key — one window over (keys, commit order), no join, no
    * second pass. Emits both post-images per mutation row:
    * `post_sum` (Increment: cumulative numeric fold of `delta`) and
    * `post_seq` (Append: cumulative byte/string concat of `appendVal`).
    * The frame is rows-unbounded-preceding→current — the exact
    * serialize-per-row-lock order the reference's region applies. */
  def rmwReturning(muts: DataFrame, keys: Seq[Column], delta: Column,
      appendVal: Column, orderBy: Seq[Column], sep: String = ""): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    muts
      .withColumn("post_sum", sum(delta).over(w))
      .withColumn("post_seq", array_join(collect_list(appendVal).over(w), sep))
  }

  /** Guard specification for CheckAndMutate: compare one (family,
    * qualifier) cell per row (client/CheckAndMutate.java;
    * Table.checkAndMutate Table.java:297). `timeRange` is the optional
    * [min,max) window the CHECK READ is restricted to
    * (CheckAndMutate.builder().timeRange, applied to the server-side
    * check Get in HRegion.checkAndMutate) — it scopes which cell
    * versions the guard may see, not which cells the mutation touches. */
  final case class Guard(family: String, qualifier: String, valuePred: Column,
      timeRange: Option[(Long, Long)] = None)

  /** M5 CheckAndMutate (HRegion.checkAndMutate:5130): batch CAS.
    * Rows whose guard cell matches get `mutation` applied; all other
    * cells pass through unchanged. The guard evaluation is one
    * aggregate on the guard column + a semi-join (AQE broadcasts the
    * matching-row list when it is small) — the batch analogue of the
    * server's read-check-apply under lock.
    *
    * `mutation` maps the cells of a matching row to their new state
    * (e.g. set one qualifier's value). */
  def checkAndMutate(cells: DataFrame, guard: Guard,
      mutation: DataFrame => DataFrame): DataFrame = {
    val matching = guardCheckRead(cells, guard.family, guard.qualifier,
      guard.timeRange).filter(guard.valuePred).select("row")
    applyWithVerdict(cells, matching, mutation)
  }

  /** Split-apply-recombine on a per-row verdict: ONE left join against
    * the distinct matching-row list, flag-filtered into the mutated and
    * pass-through branches. Both branches are the IDENTICAL join
    * subplan, so the exchanges under it plan once and re-serve
    * (ReuseExchange) — a semi+anti pair would compute the verdict
    * subplan twice. No broadcast hint: the matching-row set is bounded
    * by the GUARD, not by us — a broad guard can match most of the
    * table, and a forced broadcast would then exceed the 8 GB cap /
    * driver memory. AQE broadcasts it when it is actually small (same
    * policy as the sync-diff divergent-row list, flow/Jobs.scala). */
  private def applyWithVerdict(cells: DataFrame, matching: DataFrame,
      mutation: DataFrame => DataFrame, invert: Boolean = false): DataFrame = {
    val flagged = cells.join(
      matching.distinct().withColumn("__hit", lit(true)), Seq("row"), "left")
    val (hitPred, missPred) =
      if (invert) (col("__hit").isNull, col("__hit"))
      else (col("__hit"), col("__hit").isNull)
    mutation(flagged.filter(hitPred).drop("__hit"))
      .unionByName(flagged.filter(missPred).drop("__hit"))
  }

  /** M5 CheckAndMutate with an ARBITRARY Filter guard
    * (CheckAndMutate.java builder `ifMatches(Filter)`, Table.java:380):
    * a row passes the check iff the filter admits ANY of its cells —
    * the batch analogue of the server evaluating the guard filter over
    * the row before applying the mutation. Reuses the full
    * [[graft.filter.FilterCompiler]] algebra, so OR-lists, SCVF, and
    * row-level guards all compose. The guard filter evaluates over the
    * LIVE cells of the row (the check Get is delete-masked before the
    * filter runs in the matcher), optionally restricted to `timeRange`
    * — the filter itself then sees every live in-window version, which
    * is when the server runs filterCell (before version counting), so
    * SCVF's own latestVersionOnly knob keeps its meaning. */
  def checkAndMutate(cells: DataFrame, guard: graft.filter.GFilter,
      mutation: DataFrame => DataFrame,
      timeRange: Option[(Long, Long)] = None): DataFrame = {
    val live = graft.read.Resolve.maskTombstones(cells)
    val checkView = timeRange.fold(live) { case (lo, hi) =>
      live.filter(col("ts") >= lo && col("ts") < hi)
    }
    val matching = graft.filter.FilterCompiler.admittedRows(checkView, guard)
    applyWithVerdict(cells, matching, mutation)
  }

  /** CheckAndMutate.ifNotExists (CheckAndMutate.java builder,
    * `ifNotExists(family, qualifier)`): apply the mutation to rows
    * whose check read finds NO live version of the guard column — the
    * insert-if-absent CAS. Same check-read semantics as the value
    * guards (delete-masked, optional time window). */
  def checkAndMutateIfNotExists(cells: DataFrame, family: String,
      qualifier: String, mutation: DataFrame => DataFrame,
      timeRange: Option[(Long, Long)] = None): DataFrame = {
    val present = guardCheckRead(cells, family, qualifier, timeRange)
      .select("row")
    applyWithVerdict(cells, present, mutation, invert = true)
  }

  /** The check READ behind the cell guards: per row, the latest LIVE
    * version of the guard column within the optional time window —
    * what the server's check Get returns (HRegion.checkAndMutate:
    * delete-masked, THEN window-filtered, newest-1). ONE partial+final
    * aggregate over the guard family decides every row (the same
    * shape as FilterCompiler's SCVF verdict): tombstone thresholds and
    * the in-window put versions collect in a single groupBy(row) —
    * which co-partitions with the store layout — and the live-latest
    * pick is a per-row array fold, so no mask broadcast joins and no
    * rank window. Returns the checked CELL (row, family, qualifier,
    * ts, type, value) for rows whose check read found a live version;
    * rows with none are absent. Masking
    * is NOT window-restricted (a marker at any ts kills its targets;
    * the window then filters surviving puts — Resolve.latest order). */
  private def guardCheckRead(cells: DataFrame, family: String,
      qualifier: String, timeRange: Option[(Long, Long)]): DataFrame = {
    val isQ = col("qualifier") === qualifier
    val win = timeRange.fold(lit(true)) { case (lo, hi) =>
      col("ts") >= lo && col("ts") < hi
    }
    val agg = cells.filter(col("family") === family).groupBy("row").agg(
      max(when(col("type") === CellType.DeleteFamily, col("ts"))).as("__dfam"),
      collect_set(when(col("type") === CellType.DeleteFamilyVersion,
        col("ts"))).as("__dfamv"),
      max(when(col("type") === CellType.DeleteColumn && isQ,
        col("ts"))).as("__dcol"),
      collect_set(when(col("type") === CellType.Delete && isQ,
        col("ts"))).as("__dver"),
      collect_list(when(col("type") === CellType.Put && isQ && win,
        struct(col("ts"), col("value")))).as("__puts"))
    val live = filter(col("__puts"), p =>
      (col("__dfam").isNull || p.getField("ts") > col("__dfam")) &&
        (col("__dcol").isNull || p.getField("ts") > col("__dcol")) &&
        !array_contains(col("__dfamv"), p.getField("ts")) &&
        !array_contains(col("__dver"), p.getField("ts")))
    // struct max orders by (ts, value): newest version, ties on value —
    // the same deterministic tie-break as the SCVF verdict aggregate.
    // Presence = a live version EXISTS (size, not value non-nullness: a
    // live null-valued Put is present, and must fail ifNotExists). The
    // full cell coordinate is projected so valuePreds over ts (or
    // family/qualifier) keep resolving.
    agg.filter(size(live) > 0)
      .select(col("row"), lit(family).as("family"),
        lit(qualifier).as("qualifier"),
        array_max(live).getField("ts").as("ts"),
        lit(CellType.Put).as("type"),
        array_max(live).getField("value").as("value"))
  }

  /** M6 RowMutations / latest-view MERGE: collapse the mutation log
    * into the latest visible state per column — upserts win by ts,
    * tombstones delete (MERGE ... WHEN MATCHED semantics over paths
    * without a transactional table format). */
  def mergeLatest(cells: DataFrame, muts: DataFrame, maxVersions: Int = 1): DataFrame =
    graft.read.Resolve.latest(applyMutations(cells, muts), maxVersions)

  /** Helper: build a Put cell row for a wide-table mutation. */
  def putCell(row: Column, family: String, qualifier: String, ts: Column,
      value: Column): Seq[Column] =
    Seq(row.as("row"), lit(family).as("family"), lit(qualifier).as("qualifier"),
      ts.as("ts"), lit(CellType.Put).as("type"), value.as("value"))
}
