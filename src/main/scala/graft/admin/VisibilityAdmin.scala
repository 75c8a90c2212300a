package graft.admin

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.functions.VisKernel

/** The visibility LABEL REGISTRY — graft's twin of the reference's
  * label service admin surface (hbase-client/.../security/visibility/
  * VisibilityClient.java: `addLabels`, `setAuths`, `getAuths`,
  * `clearAuths`, `listLabels`; backed there by the `hbase:labels`
  * system table, DefaultVisibilityLabelServiceImpl).
  *
  * graft's registry is one tiny catalog table (same crash-safe
  * swap-write pattern as the namespace/quota registries) holding two
  * row kinds: LABEL rows (the dictionary — the reference's label
  * ordinals) and AUTH rows (user → granted label). The registry is
  * config-sized and read driver-side; evaluation stays where it was
  * (VisKernel / the vis_match expression) — the registry only supplies
  * the defined-label set (strict mode) and per-user default auths.
  *
  * Without a registry the expression evaluator treats ANY label string
  * as legal (undefined labels simply never match) — the reference
  * instead rejects undefined labels at mutation time
  * (InvalidLabelException) and silently drops auths the user was never
  * granted (VisibilityLabelService.getAuths). Both behaviors become
  * available once labels are registered here.
  */
object VisibilityAdmin {

  private val Reg = "graft_vislabels"
  private val RegTmp = Reg + "_swap"

  // In-JVM snapshot cache, same model as GAdmin's quota cache (the
  // reference's VisibilityLabelsCache is likewise an in-memory mirror
  // of hbase:labels refreshed on change notification).
  @volatile private var cache: Option[Seq[(String, String, String)]] = None

  /** Drop the cached snapshot — call after another process changed the
    * label registry (the cache-refresh notification analogue). */
  def refreshCache(): Unit = cache = None

  /** (kind, subject, label): LABEL rows carry ("LABEL", label, "");
    * AUTH rows carry ("AUTH", user, label). */
  private def registry(spark: SparkSession): Seq[(String, String, String)] =
    cache.getOrElse {
      val t =
        if (spark.catalog.tableExists(Reg)) Some(Reg)
        else if (spark.catalog.tableExists(RegTmp)) Some(RegTmp)
        else None
      val rows = t.fold(Seq.empty[(String, String, String)])(
        spark.table(_).collect().toSeq
          .map(r => (r.getString(0), r.getString(1), r.getString(2))))
      cache = Some(rows)
      rows
    }

  private def write(spark: SparkSession,
      rows: Seq[(String, String, String)]): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $RegTmp")
    GAdmin.clearOrphan(spark, RegTmp)
    rows.toDF("kind", "subject", "label")
      .write.mode(SaveMode.Overwrite).saveAsTable(RegTmp)
    spark.sql(s"DROP TABLE IF EXISTS $Reg")
    GAdmin.clearOrphan(spark, Reg)
    spark.sql(s"ALTER TABLE $RegTmp RENAME TO $Reg")
    cache = Some(rows) // write-through for this JVM
  }

  /** Label charset — the reference rejects labels that collide with
    * expression syntax (VisibilityLabelsValidator.isValidLabel). */
  private def requireLegal(label: String): Unit =
    require(label.nonEmpty && !label.exists("&|!()\" ".contains(_)),
      s"invalid visibility label '$label' " +
        "(operators/quotes/spaces are reserved)")

  /** VisibilityClient.addLabels: register labels in the dictionary.
    * Re-adding an existing label is rejected like the reference's
    * LabelAlreadyExistsException. */
  def addLabels(spark: SparkSession, labels: Seq[String]): Unit = {
    labels.foreach(requireLegal)
    val existing = listLabels(spark).toSet
    val dup = labels.find(existing)
    require(dup.isEmpty, s"label '${dup.get}' already exists")
    require(labels.distinct.size == labels.size, "duplicate label in batch")
    write(spark, registry(spark) ++ labels.map(("LABEL", _, "")))
  }

  /** VisibilityClient.listLabels — optionally regex-filtered like the
    * reference's listLabels(conn, regex). */
  def listLabels(spark: SparkSession, regex: Option[String] = None)
      : Seq[String] = {
    val all = registry(spark).collect { case ("LABEL", l, _) => l }
    regex.fold(all)(r => all.filter(_.matches(r))).sorted
  }

  /** VisibilityClient.setAuths: grant labels to a user (cumulative,
    * like the reference). Every auth must be a defined label —
    * InvalidLabelException twin. */
  def setAuths(spark: SparkSession, user: String, auths: Seq[String]): Unit = {
    val defined = listLabels(spark).toSet
    val bad = auths.find(!defined(_))
    require(bad.isEmpty, s"cannot grant undefined label '${bad.get}'")
    val cur = registry(spark)
    val add = auths.filterNot(a => cur.contains(("AUTH", user, a)))
    if (add.nonEmpty) write(spark, cur ++ add.map(("AUTH", user, _)))
  }

  /** VisibilityClient.getAuths: the labels granted to the user. */
  def getAuths(spark: SparkSession, user: String): Seq[String] =
    registry(spark).collect { case ("AUTH", `user`, l) => l }.sorted

  /** VisibilityClient.clearAuths: revoke specific grants. */
  def clearAuths(spark: SparkSession, user: String,
      auths: Seq[String]): Unit =
    write(spark, registry(spark).filterNot {
      case ("AUTH", u, l) => u == user && auths.contains(l)
      case _              => false
    })

  /** The write-path gate (the reference's InvalidLabelException on
    * mutation): every leaf label in `expr` must be defined. Throws on
    * the first undefined label; no-op for null/empty (untagged). */
  def checkExpression(spark: SparkSession, expr: String): Unit =
    if (expr != null && expr.nonEmpty) {
      val defined = listLabels(spark).toSet
      val bad = VisKernel.labels(VisKernel.parse(expr)).find(!defined(_))
      require(bad.isEmpty,
        s"undefined visibility label '${bad.get}' in '$expr'")
    }

  /** Scan auths for a user, REGISTRY-DEFAULTED: the caller-supplied
    * set wins when non-empty (the reference's per-scan Authorizations
    * override), otherwise the user's registered grants apply — and
    * either way auths the user was never granted are DROPPED, the
    * VisibilityLabelService.getAuths filtering step. Callers with no
    * registry (no labels defined) keep the legacy caller-supplied
    * behavior unchanged. */
  def effectiveAuths(spark: SparkSession, user: String,
      supplied: Set[String] = Set.empty): Set[String] = {
    val defined = listLabels(spark).toSet
    if (defined.isEmpty) return supplied // registry unused: legacy mode
    val granted = getAuths(spark, user).toSet
    if (supplied.isEmpty) granted else supplied.intersect(granted)
  }
}
