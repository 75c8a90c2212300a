package graft

import org.apache.spark.sql.functions._

import graft.functions.{VisKernel, VisibilityFunctions}
import graft.read.Resolve

/** Visibility-labels grammar and enforcement
  * (security/visibility/ExpressionParser.java, VisibilityLabelFilter).
  */
class VisibilitySpec extends SparkSpec {
  import spark.implicits._

  private val auths = Set("public", "finance")

  test("leaf, AND, OR, NOT evaluate against the auth set") {
    assert(VisKernel.visible("public", auths))
    assert(!VisKernel.visible("secret", auths))
    assert(VisKernel.visible("public&finance", auths))
    assert(!VisKernel.visible("public&secret", auths))
    assert(VisKernel.visible("secret|finance", auths))
    assert(VisKernel.visible("!secret", auths))
    assert(!VisKernel.visible("!public", auths))
    assert(VisKernel.visible("!secret&finance", auths))
  }

  test("& and | have EQUAL precedence, left-associative (reference stack parser)") {
    // (public|secret)&internal = false — C precedence would give true
    assert(!VisKernel.visible("public|secret&internal", auths))
    // (secret&internal)|public = true — same under either precedence,
    // but pins left-assoc wrapping
    assert(VisKernel.visible("secret&internal|public", auths))
    // parens restore the C grouping
    assert(VisKernel.visible("public|(secret&internal)", auths))
  }

  test("quoted labels with escapes; untagged cells are visible") {
    assert(VisKernel.visible("\"top secret\"|public", auths))
    assert(VisKernel.visible("\"a\\\"b\"", Set("a\"b")))
    assert(VisKernel.visible("\"a\\\\b\"", Set("a\\b")))
    assert(VisKernel.visible(null, Set.empty))
    assert(VisKernel.visible("", Set.empty))
  }

  test("malformed expressions throw") {
    for (bad <- Seq("a&", "(a", "a)", "a b", "&a", "!", "\"unterminated"))
      assertThrows[IllegalArgumentException](VisKernel.parse(bad))
  }

  test("vis-scoped deletes mask only expression-matching puts (VisibilityScanDeleteTracker)") {
    // tracker isDeleted (VisibilityScanDeleteTracker.java:181): a
    // labeled DeleteColumn masks a put iff the expressions delete-match
    // (sorted-tag equality); empty matches only untagged
    val cells = Seq(
      ("r1", "d", "q", 1L, "Put", "vA", "a&b"),      // masked: 'b&a' marker delete-matches commuted AND
      ("r1", "d", "q", 2L, "Put", "vS", "secret"),   // survives: no 'secret' marker
      ("r1", "d", "q", 3L, "Put", "vU", null),       // masked by the UNTAGGED marker (ts 4 >= 3)
      ("r1", "d", "q", 4L, "DeleteColumn", null, "b&a"),
      ("r1", "d", "q", 4L, "DeleteColumn", null, null),
      ("r2", "d", "q", 1L, "Put", "vP", "public"),   // label-blind would mask; scoped must NOT
      ("r2", "d", "q", 2L, "DeleteColumn", null, "secret")
    ).toDF("row", "family", "qualifier", "ts", "type", "value", "vis")
    val out = Resolve.latest(cells, maxVersions = 5, visScope = Some("vis"))
      .select("row", "ts").as[(String, Long)].collect().toSet
    assert(out === Set(("r1", 2L), ("r2", 1L)))
    // the same store WITHOUT scoping masks label-blind (default tracker)
    val blind = Resolve.latest(cells, maxVersions = 5)
      .select("row", "ts").as[(String, Long)].collect().toSet
    assert(blind === Set.empty)
    // exact-version Delete scoping: ts AND expression must both match
    val v = Seq(
      ("r3", "d", "q", 5L, "Put", "x", "k"),
      ("r3", "d", "q", 5L, "Delete", null, "other")
    ).toDF("row", "family", "qualifier", "ts", "type", "value", "vis")
    assert(Resolve.latest(v, maxVersions = 1, visScope = Some("vis")).count() === 1)
  }

  test("vis-scoped masking adds no exchange to the resolve plan") {
    // backs the round-5 plan audit: the scoping is an extra derived
    // join key on the existing mask legs, not an extra exchange —
    // same Exchange count as the label-blind resolve on the same store
    val cells = graft.model.Fixtures.cellsEventsV(spark, sf0001)
      .withColumn("vis",
        when(col("ts") % 3 === 0, "public").when(col("ts") % 3 === 1, "a&b"))
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
    val blind = Resolve.latest(cells, maxVersions = 2)
    val scoped = Resolve.latest(cells, maxVersions = 2, visScope = Some("vis"))
    assert(exchanges(scoped) === exchanges(blind))
  }

  test("vis filter runs BEFORE the version gate: invisible newest frees its slot") {
    val cells = Seq(
      ("r1", "d", "q", 3L, "Put", "v3", "secret"),
      ("r1", "d", "q", 2L, "Put", "v2", "public"),
      ("r1", "d", "q", 1L, "Put", "v1", "public")
    ).toDF("row", "family", "qualifier", "ts", "type", "value", "vis")
    val out = Resolve.latest(cells, maxVersions = 2,
        cellFilter = Some(VisibilityFunctions.vis_match(col("vis"), auths)))
      .select("ts").as[Long].collect().sorted
    // ts=3 is invisible; the 2-version gate then admits ts=2 AND ts=1
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("label registry: addLabels/listLabels/setAuths/getAuths/clearAuths") {
    import graft.admin.VisibilityAdmin
    // idempotent start (shared warehouse across runs)
    val pre = VisibilityAdmin.listLabels(spark)
    if (pre.nonEmpty) {
      VisibilityAdmin.clearAuths(spark, "vuser", pre)
      VisibilityAdmin.clearAuths(spark, "vother", pre)
    }
    val fresh = Seq("vl_public", "vl_secret", "vl_fin")
      .filterNot(pre.contains)
    if (fresh.nonEmpty) VisibilityAdmin.addLabels(spark, fresh)

    // dictionary: listed, regex-filterable, duplicates rejected
    assert(Seq("vl_public", "vl_secret", "vl_fin")
      .forall(VisibilityAdmin.listLabels(spark).contains))
    assert(VisibilityAdmin.listLabels(spark, Some("vl_s.*")) ===
      Seq("vl_secret"))
    intercept[IllegalArgumentException](
      VisibilityAdmin.addLabels(spark, Seq("vl_public")))
    intercept[IllegalArgumentException](
      VisibilityAdmin.addLabels(spark, Seq("bad label")))

    // grants: cumulative, undefined labels rejected, clear revokes
    VisibilityAdmin.setAuths(spark, "vuser", Seq("vl_public"))
    VisibilityAdmin.setAuths(spark, "vuser", Seq("vl_secret"))
    assert(VisibilityAdmin.getAuths(spark, "vuser") ===
      Seq("vl_public", "vl_secret"))
    intercept[IllegalArgumentException](
      VisibilityAdmin.setAuths(spark, "vuser", Seq("vl_undefined")))
    VisibilityAdmin.clearAuths(spark, "vuser", Seq("vl_secret"))
    assert(VisibilityAdmin.getAuths(spark, "vuser") === Seq("vl_public"))

    // write-path gate: undefined labels in an expression throw
    VisibilityAdmin.checkExpression(spark, "vl_public&!vl_fin")
    VisibilityAdmin.checkExpression(spark, null)
    intercept[IllegalArgumentException](
      VisibilityAdmin.checkExpression(spark, "vl_public|vl_nope"))

    // registry-defaulted scan auths: supplied wins but is FILTERED to
    // grants; empty supplied falls back to the user's grants
    assert(VisibilityAdmin.effectiveAuths(spark, "vuser") ===
      Set("vl_public"))
    assert(VisibilityAdmin.effectiveAuths(spark, "vuser",
      Set("vl_public", "vl_secret")) === Set("vl_public"))
    assert(VisibilityAdmin.effectiveAuths(spark, "vother") === Set.empty)
  }

  test("strict vis_match rejects undefined labels; lenient never matches them") {
    val cells = Seq(
      ("r1", "ok", "vl_public"),
      ("r2", "ok", "vl_ghost")
    ).toDF("row", "value", "vis")
    val defined = Set("vl_public", "vl_secret")
    // lenient: the undefined label simply never matches
    assert(cells.filter(VisibilityFunctions.vis_match(col("vis"),
      Set("vl_public"))).count() === 1)
    // strict: the scan FAILS on the undefined label (wrapped in
    // SparkException when the task runs distributed; surfaced directly
    // when the local relation short-circuits)
    val e = intercept[Exception](
      cells.filter(VisibilityFunctions.vis_match_strict(col("vis"),
        Set("vl_public"), defined)).count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("vl_ghost")))
    // strict over only-defined expressions behaves like lenient
    assert(cells.filter(col("row") === "r1")
      .filter(VisibilityFunctions.vis_match_strict(col("vis"),
        Set("vl_public"), defined)).count() === 1)
  }
}
