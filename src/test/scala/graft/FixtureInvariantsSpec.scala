package graft

import org.apache.spark.sql.functions._

import graft.model.Fixtures

/** Invariants the declared queries LEAN ON but the driver's generator
  * owns — pinned here so a fixture regeneration that silently breaks
  * one fails loudly instead of skewing an oracle.
  */
class FixtureInvariantsSpec extends SparkSpec {

  test("events.event_id is globally unique, non-negative, below the nonce offset") {
    // q115's nonce idempotency uses nonce = event_id + 1 (first
    // attempt) and + 10^12 more (fresh resend): duplicate ids would
    // collapse distinct ops into one nonce, a negative id could land
    // on the NO_NONCE sentinel after the shift, and an id at/above the
    // offset would alias a resend
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val ids = Fixtures.events(spark, sf).select("event_id")
      val n = ids.count()
      assert(ids.distinct().count() == n, s"duplicate event_ids in $sf")
      assert(ids.filter(col("event_id") < 0 ||
        col("event_id") >= 999999999999L).count() == 0,
        s"event_id outside the nonce-safe range in $sf")
    }
  }

  test("documents carry non-null ids and text for the dedup family") {
    val docs = graft.model.Tables.load(
      spark, s"$sf0001/documents.parquet")
    assert(docs.filter(col("doc_id").isNull).count() == 0)
    val n = docs.count()
    assert(docs.select("doc_id").distinct().count() == n,
      "duplicate doc_ids")
  }
}
