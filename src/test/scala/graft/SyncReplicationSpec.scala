package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Fixtures
import graft.stream.SyncReplication
import graft.stream.SyncReplication._

/** Sync-replication mechanics beyond the q117 gate (HBASE-19064:
  * ReplicationPeerManager's transition lattice, DualAsyncFSWAL's
  * two-stream append, ReplicationSyncUp's replay authorization). */
class SyncReplicationSpec extends SparkSpec {

  private def entries = {
    val uid = col("row").cast("long")
    val w = Window.partitionBy(col("wal_region"))
      .orderBy(col("ts"), col("row"))
    Fixtures.cellsEventsV(spark, sf0001)
      .withColumn("wal_region",
        concat(lit("region-"), (uid % 2).cast("string")))
      .withColumn("wal_table", lit("events"))
      .withColumn("wal_seq", dense_rank().over(w).cast("long"))
      .withColumn("write_time", col("ts"))
      .withColumn("value", coalesce(col("value"), lit("")))
  }

  test("the transition lattice is exactly the reference's") {
    val all = Seq(Active, DowngradeActive, Standby, NoSync)
    val legal = Set[(SyncState, SyncState)](
      (Active, DowngradeActive), (Active, Standby),
      (DowngradeActive, Active),
      (DowngradeActive, Standby), (Standby, DowngradeActive))
    for (from <- all; to <- all) {
      val peer = SyncPeer("p", "/tmp/none", from)
      val ok = scala.util.Try(SyncReplication.transit(peer, to)).isSuccess
      assert(ok == legal((from, to)),
        s"${from.name} -> ${to.name}: expected legal=${legal((from, to))}")
    }
  }

  test("dual-write tees IDENTICAL bytes to both logs; only ACTIVE may dual-write") {
    val root = java.nio.file.Files.createTempDirectory("syncrep").toString
    val peer = SyncPeer("p1", s"$root/remote", Active)
    SyncReplication.dualWrite(peer, entries, s"$root/local")
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val locals = fs.globStatus(new Path(s"$root/local/*/*.pwal"))
      .map(_.getPath).sortBy(_.toString)
    assert(locals.length == 2, "one log per region")
    locals.foreach { lp =>
      val rp = new Path(lp.toString.replace("/local/", "/remote/"))
      assert(fs.exists(rp), s"remote twin missing for $lp")
      def bytes(p: Path) = {
        val len = fs.getFileStatus(p).getLen.toInt
        val b = new Array[Byte](len)
        val in = fs.open(p)
        try in.readFully(0, b) finally in.close()
        b
      }
      assert(java.util.Arrays.equals(bytes(lp), bytes(rp)),
        s"local and remote bytes diverge for ${lp.getName}")
    }
    // non-ACTIVE states refuse the remote leg
    for (st <- Seq(DowngradeActive, Standby, NoSync))
      assert(scala.util.Try(SyncReplication.dualWrite(
        peer.copy(state = st), entries, s"$root/l2")).isFailure,
        s"${st.name} must not dual-write")
  }

  test("syncUpReplay runs only in DOWNGRADE_ACTIVE and respects the watermark") {
    val root = java.nio.file.Files.createTempDirectory("syncup").toString
    val active = SyncPeer("p1", s"$root/remote", Active)
    SyncReplication.dualWrite(active, entries, s"$root/local")
    val da = active.copy(state = DowngradeActive)
    val n = entries.filter(col("wal_region") === "region-0").count()
    // watermark 0 = full replay; the max seq = nothing left to replay
    val maxSeq = entries.filter(col("wal_region") === "region-0")
      .agg(max("wal_seq")).collect()(0).getLong(0)
    assert(SyncReplication.syncUpReplay(spark, da, "region-0", 0L)
      .count() == n)
    assert(SyncReplication.syncUpReplay(spark, da, "region-0", maxSeq)
      .count() == 0)
    for (st <- Seq(Active, Standby, NoSync))
      assert(scala.util.Try(SyncReplication.syncUpReplay(
        spark, da.copy(state = st), "region-0", 0L).count()).isFailure,
        s"${st.name} must not replay")
  }
}
