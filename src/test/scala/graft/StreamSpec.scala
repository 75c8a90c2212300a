package graft

import org.apache.spark.sql.functions._

import graft.model.Fixtures
import graft.stream.WalStream

class StreamSpec extends SparkSpec {

  test("streaming tumbling window equals batch computation") {
    val stream = WalStream.source(spark, s"$sf0001/events.parquet", Fixtures.eventsSchema)
    val out = WalStream.runAvailableNow(
      WalStream.tumblingCounts(stream), "streamspec_tumble")
    val batch = Fixtures.events(spark, sf0001)
      .withColumn("ets", graft.model.Cellify.tsUtc(col("ts")))
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    assert(out.count() === batch.count())
    val diff = out.select("window.start", "event_type", "n")
      .exceptAll(batch.select("window.start", "event_type", "n"))
    assert(diff.isEmpty)
  }

  test("streaming session_window groups events by 30-min gaps") {
    val stream = WalStream.source(spark, s"$sf0001/events.parquet", Fixtures.eventsSchema)
    val sessions = WalStream.runAvailableNow(
      WalStream.sessionCounts(stream), "streamspec_sessions")
    // total events across sessions == total events
    val total = sessions.agg(sum("events")).head().getLong(0)
    assert(total === Fixtures.events(spark, sf0001).count())
    // session counts per user match the batch gaps-and-islands query
    val perUser = sessions.groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val batch = graft.SparkEntry.queries("q35_session_window")(spark, sf0001)
    val diff = perUser.exceptAll(batch).count()
    assert(diff === 0)
  }

  test("applySink is idempotent on replayed batches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("wal").toString
    val cells = Fixtures.cellsOrders(spark, sf0001).limit(100)
    cells.write.parquet(s"$tmp/log")
    val stream = WalStream.source(spark, s"$tmp/log", graft.model.CellSchema.schema)
    val q = WalStream.applySink(stream, s"$tmp/ckpt", s"$tmp/out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n1 = spark.read.parquet(s"$tmp/out").count()
    assert(n1 === 100)
  }
}
