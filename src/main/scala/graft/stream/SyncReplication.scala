package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.flow.PWalFiles

/** Synchronous replication (HBASE-19064) — the HA path the async
  * shipper (q79/q102) cannot give: while a peer is ACTIVE, every WAL
  * append is ALSO written to a REMOTE WAL on the standby cluster's
  * filesystem before the write acks (DualAsyncFSWAL), so when the
  * active cluster dies the standby holds, durably, the exact tail the
  * async shipper had not yet sent. Failover is then a peer-state
  * transition plus a bounded replay of the remote WALs
  * (`ReplicationSyncUp` / ReplaySyncReplicationWALCallable), not a
  * data-loss window.
  *
  * Reference: replication/regionserver/SyncReplicationPeerInfoProvider
  * .java, ReplaySyncReplicationWALCallable.java, master/replication/
  * TransitPeerSyncReplicationStateProcedure.java, ReplicationPeerManager
  * .java (the transition lattice), wal/DualAsyncFSWAL.java (the
  * two-stream append).
  *
  * Spark realization (SURVEY §2.8): the dual-write is ONE region-keyed
  * shuffle whose writer task encodes each region's PB log ONCE and
  * tees the bytes to the local and remote streams — the
  * DualAsyncFSWAL shape (same bytes, two filesystems), so the remote
  * leg costs IO, not a second encode or a second shuffle. graft's
  * remote-WAL layout is region-keyed (`<root>/<region>/<firstSeq
  * padded 19>.pwal`) rather than the reference's per-regionserver
  * grouping: replay on failover then prunes by region directory, and
  * the recovery twin (WalRecovery.replayRecoveredEdits) reads it
  * directly — no split step between failover and replay.
  */
object SyncReplication {

  /** SyncReplicationState (ReplicationPeerManager.java): NONE is a
    * plain async peer; the other three form the sync lattice. */
  sealed abstract class SyncState(val name: String)
  case object Active extends SyncState("ACTIVE")
  case object DowngradeActive extends SyncState("DOWNGRADE_ACTIVE")
  case object Standby extends SyncState("STANDBY")
  case object NoSync extends SyncState("NONE")

  /** The reference's exact allowed-transition lattice
    * (ReplicationPeerManager.java:112-117, checked by
    * preTransitPeerSyncReplicationState): STANDBY can never jump
    * straight to ACTIVE — the mandatory stop at DOWNGRADE_ACTIVE is
    * where the remote-WAL replay happens, and skipping it would serve
    * reads/writes from a standby that has not caught up. ACTIVE may
    * step down to either DOWNGRADE_ACTIVE (planned demotion, stays
    * writable) or straight to STANDBY (the other side was promoted —
    * this side must stop serving immediately). NONE transitions to
    * nothing (a peer without a remote WAL dir is not a sync peer). */
  val allowedTransitions: Map[SyncState, Set[SyncState]] = Map(
    Active -> Set(DowngradeActive, Standby),
    DowngradeActive -> Set(Active, Standby),
    Standby -> Set(DowngradeActive),
    NoSync -> Set.empty)

  /** A sync-replication peer: `remoteWalDir` is the directory ON THE
    * OTHER cluster's filesystem this side dual-writes into while
    * ACTIVE (and replays FROM while transiting STANDBY →
    * DOWNGRADE_ACTIVE). */
  final case class SyncPeer(id: String, remoteWalDir: String,
      state: SyncState)

  /** TransitPeerSyncReplicationStateProcedure twin: refuse any
    * transition outside the lattice. */
  def transit(peer: SyncPeer, to: SyncState): SyncPeer = {
    require(allowedTransitions(peer.state).contains(to),
      s"illegal sync-replication transition ${peer.state.name} -> " +
        s"${to.name} for peer ${peer.id}")
    peer.copy(state = to)
  }

  /** RejectRequestsFromClientStateChecker twin: a STANDBY cluster
    * rejects client mutations — its only writer is the remote-WAL
    * replay. */
  def checkWrite(peer: SyncPeer): Unit =
    require(peer.state != Standby,
      s"peer ${peer.id} is STANDBY: client writes are rejected " +
        "(RejectRequestsFromClientStateChecker)")

  /** Dual-write WALKey-denormalized entries (the
    * [[PWalFiles.importEntries]] frame: wal_region/wal_table/wal_seq/
    * write_time + cell columns) as per-region PB WAL files under BOTH
    * `localRoot` and `remoteRoot`: [[graft.flow.WalRecovery
    * .writeRegionLogs]] with two roots — one shuffle keyed by region,
    * each region's log encoded ONCE with the bytes teed to the two
    * filesystems (DualAsyncFSWAL), attempt-scoped temps and atomic
    * overwrite-rename commits on both legs. Only legal while the peer
    * is ACTIVE (DOWNGRADE_ACTIVE appends locally only; STANDBY rejects
    * writes outright). */
  def dualWrite(peer: SyncPeer, entries: DataFrame, localRoot: String): Unit = {
    require(peer.state == Active,
      s"peer ${peer.id} is ${peer.state.name}: remote-WAL dual-write " +
        "only happens while ACTIVE")
    graft.flow.WalRecovery.writeRegionLogs(entries.sparkSession, entries,
      Seq(localRoot, peer.remoteWalDir), identity)
  }

  /** ReplicationSyncUp / ReplaySyncReplicationWALCallable twin: on
    * failover the standby (now DOWNGRADE_ACTIVE) replays one region's
    * remote WAL, SKIPPING entries at or below `appliedMaxSeqId` — the
    * watermark the normal async shipper had already delivered before
    * the active cluster died. Returns the surviving cells with their
    * sequence ids; the caller merges them into the standby's store.
    * Refuses to run unless the peer has left STANDBY (the transition
    * to DOWNGRADE_ACTIVE is what authorizes the replay). */
  def syncUpReplay(spark: SparkSession, peer: SyncPeer, region: String,
      appliedMaxSeqId: Long): DataFrame = {
    require(peer.state == DowngradeActive,
      s"peer ${peer.id} is ${peer.state.name}: remote-WAL replay runs " +
        "in DOWNGRADE_ACTIVE (the STANDBY -> DA transition's catch-up)")
    PWalFiles.importEntries(spark, s"${peer.remoteWalDir}/$region",
        glob = "*.pwal")
      .filter(col("wal_seq") > appliedMaxSeqId)
      .select(col("wal_seq"), col("row"), col("family"), col("qualifier"),
        col("ts"), col("type"), col("value"))
  }
}
