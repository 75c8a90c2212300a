package graft.admin

/** Deterministic token-bucket twin of the reference's RPC-throttle
  * limiter (hbase-server/.../quotas/RateLimiter.java:38 — canExecute /
  * consume / waitInterval over an `avail` balance), with the two refill
  * strategies as subclass behavior flags:
  *
  *  - FIXED (FixedIntervalRateLimiter.java): the balance refills to the
  *    FULL limit once a whole time unit has elapsed since the last
  *    refill — bursty at interval boundaries.
  *  - AVERAGE (AverageIntervalRateLimiter.java): the balance refills
  *    PROPORTIONALLY to elapsed time (delta·limit/timeUnit) — smooth.
  *
  * Time is injected by the caller (`nowMs`), never read from a wall
  * clock here, so behavior is fully deterministic and spec-drivable.
  * Not thread-safe on its own; callers synchronize (the reference's
  * methods are likewise synchronized at the call layer).
  */
final class RateLimiter(val limit: Long, val timeUnitMs: Long,
    val fixedInterval: Boolean) {
  require(limit > 0 && timeUnitMs > 0, "limit and timeUnit must be positive")

  private var avail = limit
  private var last = Long.MinValue

  def available: Long = avail

  private def refill(nowMs: Long): Unit = {
    if (last == Long.MinValue) { last = nowMs; return }
    val delta = nowMs - last
    if (delta <= 0) return
    val add =
      if (fixedInterval) { if (delta >= timeUnitMs) limit else 0L }
      else delta * limit / timeUnitMs
    if (add > 0) { avail = math.min(limit, avail + add); last = nowMs }
  }

  /** True iff `amount` units are available at `nowMs` (refills first). */
  def canExecute(nowMs: Long, amount: Long = 1): Boolean = {
    refill(nowMs)
    avail >= amount
  }

  /** Deduct `amount` (callers check canExecute first; the reference
    * likewise allows the balance to go negative on oversized grabs). */
  def consume(amount: Long = 1): Unit = avail -= amount

  /** Milliseconds until `amount` units could be available — 0 if
    * already executable, Long.MaxValue if `amount` exceeds the limit
    * (the bucket caps at `limit`; no wait can ever satisfy it). FIXED:
    * the remainder of the current interval; AVERAGE: the proportional
    * time for the missing units MINUS credit already accrued since the
    * last refill (un-credited elapsed time counts toward the next
    * token — without this the retry-after overstates by up to one
    * whole token period). */
  def waitInterval(nowMs: Long, amount: Long = 1): Long = {
    refill(nowMs)
    if (avail >= amount) 0L
    else if (amount > limit) Long.MaxValue
    else if (fixedInterval) {
      val base = if (last == Long.MinValue) nowMs else last
      math.max(0L, base + timeUnitMs - nowMs)
    } else {
      val missing = amount - avail
      val accrued = if (last == Long.MinValue) 0L else nowMs - last
      // ceil(missing·timeUnit/limit) − elapsed-but-uncredited time
      math.max(0L, (missing * timeUnitMs + limit - 1) / limit - accrued)
    }
  }
}
