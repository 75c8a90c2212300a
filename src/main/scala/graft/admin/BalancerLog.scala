package graft.admin

/** The balancer's named-queue observability rings — twins of
  * hbase-server's namequeues balancer services
  * (`namequeues/BalancerDecisionDetails.java`,
  * `BalancerRejectionDetails.java`,
  * `impl/BalancerDecisionQueueService.java:60-125`,
  * `impl/BalancerRejectionQueueService.java`): every balancer run
  * records WHAT it decided (cost before/after, steps, the region
  * plans) or WHY it refused to run (the rejection reason plus each
  * active cost function's cost×multiplier), into a bounded in-memory
  * ring an operator reads newest-first (`getBalancerDecisions` /
  * `getBalancerRejections`).
  *
  * Reference semantics twinned exactly:
  *   - ring capacity 250 (DEFAULT_BALANCER_DECISION_QUEUE_SIZE /
  *     DEFAULT_BALANCER_REJECTION_QUEUE_SIZE) — oldest evicted first
  *     (guava EvictingQueue);
  *   - a decision with more than 15 region plans splits into multiple
  *     ring entries of at most 15 plans each, all sharing the run's
  *     costs (REGION_PLANS_THRESHOLD_PER_BALANCER — Lists.partition
  *     in consumeEventFromDisruptor);
  *   - reads return newest-first, truncated to `limit`
  *     (getNamedQueueRecords' reverse + subList).
  *
  * The ring is master-driver state by construction (the reference's
  * lives inside HMaster): bounded at 250 entries, never serialized
  * into a Spark plan — reading it out as a DataFrame is a
  * ring-bounded `toDF`, the q121 slow-log pattern.
  */
final class BalancerLog(capacity: Int = 250) {
  import BalancerLog._
  require(capacity > 0, "ring capacity must be positive")

  private val decisionRing =
    new java.util.ArrayDeque[Decision](math.min(capacity, 1024))
  private val rejectionRing =
    new java.util.ArrayDeque[Rejection](math.min(capacity, 1024))
  private var seq = 0L

  private def push[T](ring: java.util.ArrayDeque[T], v: T): Unit =
    synchronized {
      if (ring.size >= capacity) ring.pollFirst() // evict oldest
      ring.addLast(v)
    }

  /** Record one balancer run's decision; plans chunk at
    * [[BalancerLog.PlansPerEntry]] into multiple entries (the
    * reference's disruptor-consume split). */
  def recordDecision(table: String, initTotalCost: Double,
      computedTotalCost: Double, computedSteps: Long,
      regionPlans: Seq[String]): Unit = synchronized {
    val chunks =
      if (regionPlans.size > PlansPerEntry)
        regionPlans.grouped(PlansPerEntry).toSeq
      else Seq(regionPlans)
    chunks.foreach { c =>
      seq += 1
      push(decisionRing, Decision(table, initTotalCost, computedTotalCost,
        computedSteps, c, seq))
    }
  }

  /** Record a refusal-to-balance with its reason and the active cost
    * functions' `name*cost*multiplier` info strings
    * (BalancerRejection.Builder.addCostFuncInfo's format). */
  def recordRejection(table: String, reason: String,
      costFuncInfo: Seq[String] = Nil): Unit = synchronized {
    seq += 1
    push(rejectionRing, Rejection(table, reason, costFuncInfo, seq))
  }

  /** Newest-first decisions, truncated to `limit`. */
  def decisions(limit: Int = Int.MaxValue): Seq[Decision] = synchronized {
    import scala.jdk.CollectionConverters._
    decisionRing.descendingIterator().asScala.take(math.max(limit, 0)).toSeq
  }

  /** Newest-first rejections, truncated to `limit`. */
  def rejections(limit: Int = Int.MaxValue): Seq[Rejection] = synchronized {
    import scala.jdk.CollectionConverters._
    rejectionRing.descendingIterator().asScala.take(math.max(limit, 0)).toSeq
  }

  def clear(): Unit = synchronized {
    decisionRing.clear(); rejectionRing.clear()
  }
}

object BalancerLog {
  /** REGION_PLANS_THRESHOLD_PER_BALANCER — plans per ring entry. */
  val PlansPerEntry = 15

  /** One ring entry of a balancer run's decision
    * (client/BalancerDecision.java's fields graft can source). */
  final case class Decision(table: String, initTotalCost: Double,
      computedTotalCost: Double, computedSteps: Long,
      regionPlans: Seq[String], seq: Long)

  /** One refusal-to-balance record (client/BalancerRejection.java). */
  final case class Rejection(table: String, reason: String,
      costFuncInfo: Seq[String], seq: Long)
}
