package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.{HFileV3, PWal}
import graft.flow.{HFiles, PWalFiles, ShippedConf}

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
    * (ReplicationPeerManager.preTransitPeerSyncReplicationState):
    * STANDBY can never jump straight to ACTIVE — the mandatory stop at
    * DOWNGRADE_ACTIVE is where the remote-WAL replay happens, and
    * skipping it would serve reads/writes from a standby that has not
    * caught up. NONE transitions to nothing (a peer without a remote
    * WAL dir is not a sync peer). */
  val allowedTransitions: Map[SyncState, Set[SyncState]] = Map(
    Active -> Set(DowngradeActive),
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
    * `localRoot` and `remoteRoot`. One shuffle keyed by region; each
    * region's log encodes once and the bytes tee to the two streams.
    * Only legal while the peer is ACTIVE (DOWNGRADE_ACTIVE appends
    * locally only; STANDBY rejects writes outright). */
  def dualWrite(peer: SyncPeer, entries: DataFrame, localRoot: String): Unit = {
    require(peer.state == Active,
      s"peer ${peer.id} is ${peer.state.name}: remote-WAL dual-write " +
        "only happens while ACTIVE")
    val remoteRoot = peer.remoteWalDir
    val spark = entries.sparkSession
    val bconf = ShippedConf.broadcast(spark)
    entries
      .repartition(col("wal_region"))
      .sortWithinPartitions(col("wal_region"), col("wal_seq"),
        col("row"), col("family"), col("qualifier"), col("type"))
      .select("wal_region", "wal_table", "wal_seq", "write_time",
        "row", "family", "qualifier", "ts", "type", "value")
      .foreachPartition { (it: Iterator[Row]) =>
        val rows = it.buffered
        while (rows.hasNext) {
          val region = rows.head.getString(0)
          var firstSeq = -1L
          val entriesIt = new Iterator[PWal.WalEntry] {
            private var pending: Row =
              if (rows.hasNext && rows.head.getString(0) == region)
                rows.next()
              else null
            def hasNext: Boolean = pending != null
            def next(): PWal.WalEntry = {
              val seq = pending.getLong(2)
              if (firstSeq < 0) firstSeq = seq
              val table = pending.getString(1)
              val wt = pending.getLong(3)
              val cells = scala.collection.mutable.ArrayBuffer.empty[HFileV3.HCell]
              while (pending != null && pending.getLong(2) == seq) {
                cells += HFileV3.HCell(
                  pending.getString(4).getBytes("UTF-8"),
                  pending.getString(5).getBytes("UTF-8"),
                  pending.getString(6).getBytes("UTF-8"),
                  pending.getLong(7),
                  HFiles.typeToCode(pending.getString(8)),
                  Option(pending.getString(9)).getOrElse("").getBytes("UTF-8"))
                pending =
                  if (rows.hasNext && rows.head.getString(0) == region)
                    rows.next()
                  else null
              }
              PWal.WalEntry(region.getBytes("UTF-8"), table.getBytes("UTF-8"),
                seq, wt, cells.toIndexedSeq)
            }
          }
          val conf = bconf.value.conf
          val lfs = new Path(localRoot).getFileSystem(conf)
          val rfs = new Path(remoteRoot).getFileSystem(conf)
          val pid = TaskContext.getPartitionId()
          val ldir = new Path(s"$localRoot/$region")
          val rdir = new Path(s"$remoteRoot/$region")
          lfs.mkdirs(ldir); rfs.mkdirs(rdir)
          val ltmp = new Path(ldir, s".temp-$pid-$region")
          val rtmp = new Path(rdir, s".temp-$pid-$region")
          val lout = lfs.create(ltmp, true)
          val rout = rfs.create(rtmp, true)
          // DualAsyncFSWAL: ONE encode, the bytes fan out to both logs
          val tee = new java.io.OutputStream {
            def write(b: Int): Unit = { lout.write(b); rout.write(b) }
            override def write(b: Array[Byte], off: Int, len: Int): Unit = {
              lout.write(b, off, len); rout.write(b, off, len)
            }
          }
          val buffered = new java.io.BufferedOutputStream(tee)
          try { PWal.write(buffered, entriesIt); buffered.flush() }
          finally { lout.close(); rout.close() }
          require(firstSeq >= 0, s"empty WAL group for $region")
          commit(lfs, ltmp, new Path(ldir, f"$firstSeq%019d.pwal"), region)
          commit(rfs, rtmp, new Path(rdir, f"$firstSeq%019d.pwal"), region)
        }
      }
  }

  /** Idempotent task-retry-safe commit (same protocol as
    * WalRecovery.splitWal): every attempt writes identical bytes, so a
    * pre-existing destination is a completed earlier attempt. */
  private def commit(fs: org.apache.hadoop.fs.FileSystem, tmp: Path,
      dst: Path, region: String): Unit = {
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) {
      require(fs.exists(dst), s"could not commit WAL for $region")
      fs.delete(tmp, false)
    }
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
