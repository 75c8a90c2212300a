package graft.stream

import org.apache.spark.sql.DataFrame

/** Replication peer management — the `Admin.addReplicationPeer` /
  * `removeReplicationPeer` / `enableReplicationPeer` surface
  * (hbase-client/.../client/Admin.java replication section;
  * ReplicationPeerConfig.java — per-peer table/CF scope maps;
  * ReplicationSourceManager starts one WAL source per ENABLED peer,
  * each filtered by NamespaceTableCfWALEntryFilter).
  *
  * A peer is (id, table → families scope, enabled). Scope semantics
  * follow ReplicationPeerConfig: an EMPTY table map replicates every
  * table; a table mapped to an empty family list replicates all its
  * families; otherwise only the named families. The registry is
  * driver-held configuration (the reference keeps it in ZooKeeper —
  * coordination state, not data; a durable catalog-table variant would
  * use GAdmin's swap-rename registry pattern).
  */
object ReplicationAdmin {

  final case class Peer(id: String, tableCfs: Map[String, Seq[String]],
      enabled: Boolean, bandwidth: Long = 0L)

  private val peers =
    new java.util.concurrent.ConcurrentHashMap[String, Peer]()

  /** ReplicationException twin on duplicate ids, as addReplicationPeer
    * throws. `bandwidth` is ReplicationPeerConfig.getBandwidth —
    * bytes per second the peer's shipper may push; <= 0 disables
    * throttling (ReplicationThrottler.java:36-41). */
  def addPeer(id: String, tableCfs: Map[String, Seq[String]] = Map.empty,
      enabled: Boolean = true, bandwidth: Long = 0L): Unit = {
    require(id.nonEmpty && !id.contains("-"),
      s"illegal peer id '$id' (the reference rejects '-' in peer ids)")
    val prev = peers.putIfAbsent(id, Peer(id, tableCfs, enabled, bandwidth))
    require(prev == null, s"peer $id already exists")
  }

  /** Update a peer's bandwidth (Admin.updateReplicationPeerConfig). */
  def setPeerBandwidth(id: String, bandwidth: Long): Unit = {
    val updated = peers.computeIfPresent(id,
      (_, p) => p.copy(bandwidth = bandwidth))
    require(updated != null, s"no such peer $id")
  }

  /** Admin.updateReplicationPeerConfig — in-place peer-config swap
    * (ReplicationPeerManager.updatePeerConfig:338-352): the new config
    * REPLACES scope and bandwidth while the peer's enabled state is
    * untouched (the reference carries desc.isEnabled forward; its
    * base+patch `configuration`-map merge covers free-form keys graft
    * does not model — bandwidth and scope are the whole config here).
    * The single computeIfPresent IS the atomic swap (the reference
    * commits through peerStorage then swaps the descriptor); a live
    * [[scopedSink]] observes the new scope at its next micro-batch. */
  def updatePeerConfig(id: String, tableCfs: Map[String, Seq[String]],
      bandwidth: Long = 0L): Unit = {
    val updated = peers.computeIfPresent(id,
      (_, p) => p.copy(tableCfs = tableCfs, bandwidth = bandwidth))
    require(updated != null, s"no such peer $id")
  }

  /** ReplicationPeerConfigUtil.appendTableCFsToReplicationPeerConfig
    * (:448-459, mergeTableCFs :513-537). Graft encodes "all families"
    * as an EMPTY list (the reference's null): appending all-families
    * to anything yields all-families; two explicit lists union. A peer
    * currently replicating EVERYTHING (empty map) adopts the appended
    * map outright — the reference's preTableCfs==null branch (which
    * NARROWS the scope to the named tables). */
  def appendPeerTableCfs(id: String,
      tableCfs: Map[String, Seq[String]]): Unit = {
    val updated = peers.computeIfPresent(id, { (_, p) =>
      val merged =
        if (p.tableCfs.isEmpty) tableCfs
        else tableCfs.foldLeft(p.tableCfs) { case (acc, (t, cfs)) =>
          acc.get(t) match {
            case Some(cur) if cur.nonEmpty && cfs.nonEmpty =>
              acc.updated(t, (cur ++ cfs).distinct.sorted)
            case Some(_) => acc.updated(t, Nil) // either side = all
            case None => acc.updated(t, cfs)
          }
        }
      p.copy(tableCfs = merged)
    })
    require(updated != null, s"no such peer $id")
  }

  /** ReplicationPeerConfigUtil.removeTableCFsFromReplicationPeerConfig
    * (:548-587) — the reference's four branches, each a hard error
    * when the removal does not exactly match what is configured. */
  def removePeerTableCfs(id: String,
      tableCfs: Map[String, Seq[String]]): Unit = {
    val p0 = peers.get(id)
    require(p0 != null, s"no such peer $id")
    require(p0.tableCfs.nonEmpty, s"Table-Cfs for peer $id is empty")
    val updated = peers.computeIfPresent(id, { (_, p) =>
      val pruned = tableCfs.foldLeft(p.tableCfs) { case (acc, (t, rm)) =>
        acc.get(t) match {
          case None =>
            throw new IllegalArgumentException(
              s"no table $t in table-cfs config of peer $id")
          case Some(cur) if cur.isEmpty && rm.isEmpty => acc - t
          case Some(cur) if cur.nonEmpty && rm.nonEmpty =>
            val left = cur.filterNot(rm.contains)
            if (left.isEmpty) acc - t else acc.updated(t, left)
          case Some(cur) if cur.isEmpty =>
            throw new IllegalArgumentException(
              s"cannot remove cfs of table $t which doesn't specify " +
                s"cfs in peer $id")
          case Some(_) =>
            throw new IllegalArgumentException(
              s"cannot remove table $t which has specified cfs in peer $id")
        }
      }
      p.copy(tableCfs = pruned)
    })
    require(updated != null, s"no such peer $id")
  }

  def removePeer(id: String): Unit = {
    val prev = peers.remove(id)
    require(prev != null, s"no such peer $id")
  }

  def enablePeer(id: String): Unit = setEnabled(id, on = true)
  def disablePeer(id: String): Unit = setEnabled(id, on = false)

  private def setEnabled(id: String, on: Boolean): Unit = {
    // atomic update: a plain get-then-put would lose a concurrent
    // enable/disable racing between the two steps
    val updated = peers.computeIfPresent(id,
      (_, p) => p.copy(enabled = on))
    require(updated != null, s"no such peer $id")
  }

  def listPeers(): Seq[Peer] = {
    import scala.jdk.CollectionConverters._
    peers.values.asScala.toSeq.sortBy(_.id)
  }

  /** The families of `table` a peer replicates: None = table out of
    * scope (or peer disabled); Some(Nil) = all families; Some(fams) =
    * those families (ReplicationPeerConfig.needToReplicate semantics). */
  private def scopeOf(p: Peer, table: String): Option[Seq[String]] =
    if (!p.enabled) None
    else if (p.tableCfs.isEmpty) Some(Nil)
    else p.tableCfs.get(table)

  def scopeFor(id: String, table: String): Option[Seq[String]] = {
    val p = peers.get(id)
    require(p != null, s"no such peer $id")
    scopeOf(p, table)
  }

  /** One scoped CDC stream per ENABLED peer replicating `table` — the
    * ReplicationSourceManager fan-out: each peer gets the WAL stream
    * through its own scope filter (WalStream.scoped; an all-families
    * scope passes the stream through unfiltered). Scopes derive from
    * the snapshot taken here, so a peer removed concurrently simply
    * keeps or misses the whole fan-out — never a crash mid-way. */
  def replicate(table: String, stream: DataFrame): Map[String, DataFrame] = {
    import scala.jdk.CollectionConverters._
    peers.values.asScala.toSeq.sortBy(_.id).flatMap { p =>
      scopeOf(p, table).map(fams => p.id -> WalStream.scoped(stream, fams))
    }.toMap
  }

  /** Deterministic micro-batch ADMISSION TRACE for one peer's serial
    * shipper — the ReplicationThrottler twin
    * (replication/regionserver/ReplicationThrottler.java:62-98 —
    * per-100ms-cycle push budget with multi-cycle amortization of
    * oversized pushes; bandwidth from ReplicationPeerConfig
    * .getBandwidth) composed from the existing deterministic
    * token bucket ([[graft.admin.RateLimiter]], AVERAGE refill = the
    * throttler's proportional budget, clock INJECTED so the trace is
    * spec-exact, never wall-clock).
    *
    * `batches` = (batchId, arrivalMs, sizeBytes) in arrival order (the
    * shipper is serial — ST3's ordering contract). Returns
    * (batchId, admitMs, sleptMs): each batch ships once the bucket
    * holds its size; a batch LARGER than one cycle's budget admits at
    * a full bucket and drives the balance negative, delaying
    * successors — exactly the reference's "sleep following cycles to
    * amortize" (:69-81). bandwidth <= 0 admits everything on arrival.
    */
  def admissionTrace(peerId: String,
      batches: Seq[(Long, Long, Long)],
      cycleMs: Long = 100L): Seq[(Long, Long, Long)] = {
    val p = peers.get(peerId)
    require(p != null, s"no such peer $peerId")
    // per-cycle budget, like the reference's `bandwidth (per cycle =
    // 100ms)` derived from bytes/sec
    val perCycle = p.bandwidth * cycleMs / 1000L
    if (p.bandwidth <= 0L) batches.map { case (id, at, _) => (id, at, 0L) }
    else {
      require(perCycle > 0, s"bandwidth too small for a $cycleMs ms cycle")
      val rl = new graft.admin.RateLimiter(perCycle, cycleMs,
        fixedInterval = false)
      var clock = Long.MinValue
      batches.map { case (id, at, size) =>
        clock = math.max(clock, at) // serial: wait out the predecessor
        val need = math.min(size, perCycle) // oversized: admit at full
        val wait = rl.waitInterval(clock, need)
        require(wait != Long.MaxValue)
        val admit = clock + wait
        rl.canExecute(admit, need) // refill at the admit instant
        rl.consume(size) // may go negative — amortizes into successors
        clock = admit
        (id, admit, admit - at)
      }
    }
  }

  /** LIVE per-peer shipper throttle — the stateful half of
    * [[admissionTrace]], holding the same token bucket across a
    * stream's micro-batches (ReplicationThrottler is a field of the
    * shipper, one per peer source — ReplicationSourceShipper.java
    * calls `throttler.getNextSleepInterval(size)` then sleeps before
    * every push). Clock and sleeper are injectable so StreamSpec can
    * pin the REAL sink's admissions against the deterministic trace;
    * production uses wall clock + Thread.sleep. `bandwidth <= 0`
    * admits everything immediately (ReplicationThrottler.java:36-41).
    * Serial by contract (one shipper per peer — ST3), synchronized
    * anyway so a misuse can't corrupt the bucket. */
  final class PeerThrottle(val bandwidth: Long, val cycleMs: Long = 100L,
      nowMs: () => Long = () => System.currentTimeMillis(),
      sleeper: Long => Unit = ms => Thread.sleep(ms)) {
    private val perCycle = bandwidth * cycleMs / 1000L
    private val rl =
      if (bandwidth <= 0L) None
      else {
        require(perCycle > 0, s"bandwidth too small for a $cycleMs ms cycle")
        Some(new graft.admin.RateLimiter(perCycle, cycleMs,
          fixedInterval = false))
      }
    private var clock = Long.MinValue
    /** (arrivalMs, admitMs, sizeBytes) per admitted batch, in ship
      * order — the live counterpart of [[admissionTrace]]'s rows. */
    val admissions = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)]

    /** Block (via the sleeper) until the bucket admits `sizeBytes`,
      * then consume them; returns the slept milliseconds. Oversized
      * batches admit at a full bucket and drive the balance negative,
      * amortizing into successors — exactly the trace's rule. */
    def admit(sizeBytes: Long): Long = synchronized {
      val at = nowMs()
      clock = math.max(clock, at)
      rl match {
        case None =>
          admissions += ((at, clock, sizeBytes)); clock - at
        case Some(r) =>
          val need = math.min(sizeBytes, perCycle)
          val wait = r.waitInterval(clock, need)
          require(wait != Long.MaxValue)
          if (wait > 0) sleeper(wait)
          val admitAt = clock + wait
          r.canExecute(admitAt, need)
          r.consume(sizeBytes)
          clock = admitAt
          admissions += ((at, admitAt, sizeBytes))
          admitAt - at
      }
    }
  }

  /** Wire size of one shipped micro-batch — the deterministic stand-in
    * for the reference's per-entry serialized size
    * (ReplicationSourceWALReader tracks entry batch size in bytes):
    * string coordinate/value bytes (UTF-8 octets, not characters —
    * length() would undercount multi-byte values and over-admit
    * against the peer's bandwidth) + 8 (ts) + 1 (type tag). */
  private def batchSizeBytes(batch: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    batch.agg(coalesce(sum(
        (octet_length(col("row")) + octet_length(col("family")) +
          octet_length(col("qualifier")) +
          coalesce(octet_length(col("value")), lit(0)) + lit(9))
          .cast("long")), lit(0L)))
      .head().getLong(0)
  }

  /** One peer's THROTTLED exactly-once sink: [[WalStream.applySink]]'s
    * idempotent per-batch apply with the peer's bandwidth enforced
    * before each push, mirroring ReplicationSourceShipper's
    * per-batch `throttler.getNextSleepInterval` + sleep + `addPushSize`
    * (ReplicationThrottler.java:62-98). The throttle is consulted on
    * the SHIPPED batch (markers included — they travel the wire; the
    * apply itself still drops them, ReplicationSink's isMetaEdit
    * guard). A peer with bandwidth <= 0 ships unthrottled and
    * byte-identically to plain applySink. `throttle` is injectable for
    * the spec; by default the peer's CURRENT bandwidth builds one
    * bucket held for the stream's lifetime (the reference rebuilds the
    * throttler on peer-config refresh — callers restart the sink on
    * updateReplicationPeerConfig the same way). */
  def shippedSink(peerId: String, cellStream: DataFrame,
      checkpointDir: String, outDir: String,
      seqCol: Option[String] = None,
      throttle: Option[PeerThrottle] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val p = peers.get(peerId)
    require(p != null, s"no such peer $peerId")
    val th = throttle.getOrElse(new PeerThrottle(p.bandwidth))
    cellStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        th.admit(batchSizeBytes(batch))
        WalStream.applyBatch(batch, seqCol)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
  }

  /** One peer's DYNAMICALLY scoped sink: unlike [[replicate]] (which
    * bakes the scope into the plan at construction — the reference's
    * source does the same until a peer-config refresh), this consults
    * the peer's CURRENT table scope at every micro-batch, so an
    * [[updatePeerConfig]] narrowing the scope mid-stream takes effect
    * on the NEXT batch without restarting the query — the
    * PeerConfigListener refresh path (ReplicationPeerImpl's config
    * listeners re-filter the source on ZK config change). A table that
    * leaves the scope entirely skips its batches; no in-scope entry is
    * ever dropped (the filter passes meta markers like
    * [[WalStream.scoped]]). A peer that is DISABLED (not out of scope)
    * fails the micro-batch instead: the streaming checkpoint must not
    * advance past entries the peer has not shipped — the reference
    * PAUSES shipping on disable but retains the WAL queue so
    * replication resumes losslessly on re-enable
    * (ReplicationSourceManager; a silent skip here would be permanent
    * loss). Re-enabling the peer and restarting the query replays from
    * the unadvanced checkpoint. */
  def scopedSink(peerId: String, table: String, cellStream: DataFrame,
      checkpointDir: String, outDir: String,
      seqCol: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(peers.get(peerId) != null, s"no such peer $peerId")
    cellStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val p = peers.get(peerId)
        require(p != null, s"peer $peerId was removed mid-stream")
        if (!p.enabled)
          throw new IllegalStateException(
            s"peer $peerId is disabled: failing batch $batchId so the " +
              "checkpoint does not advance; re-enable the peer and " +
              "restart the query to resume losslessly")
        scopeOf(p, table) match {
          case None => () // table genuinely out of the peer's scope now
          case Some(fams) =>
            WalStream.applyBatch(WalStream.scoped(batch, fams), seqCol)
              .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
      }
  }

  /** Test/lifecycle hook: drop every peer (a fresh cluster state). */
  def removeAllPeers(): Unit = peers.clear()
}
