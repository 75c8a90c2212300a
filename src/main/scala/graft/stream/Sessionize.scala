package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key sessionization — the `KeyValueGroupedDataset` typed
  * state surface. The reference has no session concept; this is part of
  * graft's streaming extension (SURVEY §2.8 "late data" row), the
  * operator shape a training-data pipeline uses for user/document
  * activity grouping.
  *
  * Two twins with identical semantics (30-min-gap sessions on
  * µs-truncated event time, ties broken by event_id):
  *
  *  - [[sessionize]] — batch: `flatMapSortedGroups` walks each user's
  *    events in event-time order inside one task. The shuffle is the
  *    same single exchange a `groupBy(user_id)` needs; within-group
  *    *sorted* iteration is guaranteed by the sort expressions (no
  *    per-group in-memory sort, no window-function second exchange —
  *    and unlike gaps-and-islands it emits arbitrary per-session
  *    records, not just per-row flags).
  *  - [[sessionizeStream]] — streaming: `flatMapGroupsWithState` with
  *    event-time timeout; sessions close when the watermark passes
  *    last-event + gap. Output equals the batch twin whenever each
  *    key's events arrive in event-time order across micro-batches
  *    (StreamSpec drives this). Late-but-unsealed stragglers MERGE
  *    into the key's open session with monotone bounds (a widening) —
  *    they never split or reorder it; a batch run over the same data
  *    may instead report them as separate sessions. This is the
  *    documented late-data policy, not an equivalence bug.
  */
object Sessionize {

  final case class Ev(user_id: Long, tus: Long, event_id: Long)
  /** Streaming event record — carries the watermarked event-time column
    * (`ets`) through to the stateful operator (the analyzer requires
    * the watermark attribute to survive projection). */
  final case class EvT(user_id: Long, tus: Long, event_id: Long,
      ets: java.sql.Timestamp)
  final case class Session(user_id: Long, session_idx: Long, n_events: Long,
      start_us: Long, end_us: Long)
  /** Open-session state: (sessionIdx, nEvents, startUs, lastUs). */
  final case class SessState(idx: Long, n: Long, start: Long, last: Long)

  val GapUs: Long = 30L * 60 * 1000 * 1000

  private def toEv(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), graft.model.Cellify.nsToUs(col("ts")).as("tus"),
        col("event_id"))
      .as[Ev]
  }

  /** Batch sessionizer: per-user sorted walk, one shuffle total. */
  def sessionize(events: DataFrame, gapUs: Long = GapUs): Dataset[Session] = {
    import events.sparkSession.implicits._
    toEv(events)
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"tus", $"event_id") { (uid: Long, it: Iterator[Ev]) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Session]
        var st: SessState = null
        for (e <- it) {
          if (st == null) st = SessState(1L, 1L, e.tus, e.tus)
          else if (e.tus - st.last > gapUs) {
            out += Session(uid, st.idx, st.n, st.start, st.last)
            st = SessState(st.idx + 1, 1L, e.tus, e.tus)
          } else st = st.copy(n = st.n + 1, last = e.tus)
        }
        if (st != null) out += Session(uid, st.idx, st.n, st.start, st.last)
        out.iterator
      }
  }

  /** Streaming sessionizer: event-time timeout closes a session once
    * the watermark passes its last event + gap. State per key is one
    * open session (bounded, no event buffering) — the at-scale shape:
    * state size is O(active users), not O(events). */
  def sessionizeStream(events: DataFrame, gapUs: Long = GapUs,
      watermark: String = "30 minutes",
      markerTtlUs: Long = 7L * 24 * 3600 * 1000 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    val evs = events
      .withColumn("ets", graft.model.Cellify.tsUtc(col("ts")))
      .withWatermark("ets", watermark)
      .select(col("user_id"), graft.model.Cellify.nsToUs(col("ts")).as("tus"),
        col("event_id"), col("ets"))
      .as[EvT]
    evs
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[EvT], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            if (st.n == 0L) {
              // a closed-session MARKER expired (no activity for
              // markerTtlUs): drop it so state stays O(ACTIVE users),
              // not O(users ever seen). A user returning after the TTL
              // restarts their session counter at 1 — the documented
              // trade for bounded state on churning key spaces.
              state.remove()
              Iterator.empty
            } else {
              // close the session but keep a closed-marker (n == 0) so
              // the per-user session counter survives: the next session
              // gets idx+1, matching the batch twin. The marker carries
              // its own expiry (last close + markerTtlUs), clamped
              // above the current watermark — Spark rejects timeout
              // timestamps at/below it (restart after long downtime,
              // backfills, or a TTL <= gap would otherwise crash).
              state.update(SessState(st.idx + 1, 0L, 0L, st.last))
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                st.last / 1000 + markerTtlUs / 1000))
              Iterator.single(Session(uid, st.idx, st.n, st.start, st.last))
            }
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var st = state.getOption.orNull
            for (e <- it.toSeq.sortBy(e => (e.tus, e.event_id))) {
              if (st == null || st.n == 0L) {
                st = SessState(if (st == null) 1L else st.idx, 1L, e.tus, e.tus)
              } else if (e.tus > st.last && e.tus - st.last > gapUs) {
                out += Session(uid, st.idx, st.n, st.start, st.last)
                st = SessState(st.idx + 1, 1L, e.tus, e.tus)
              } else {
                // in-order extension, or a late-but-unsealed event:
                // merge with monotone bounds (last never regresses, so
                // lateness cannot split an open session)
                st = st.copy(n = st.n + 1,
                  start = math.min(st.start, e.tus),
                  last = math.max(st.last, e.tus))
              }
            }
            if (st != null && st.n > 0L) {
              state.update(st)
              // same watermark clamp: a straggler batch can carry events
              // whose session expiry already lies below the watermark
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                st.last / 1000 + gapUs / 1000))
            }
            out.iterator
          }
      }
  }
}
