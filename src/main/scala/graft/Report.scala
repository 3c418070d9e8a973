package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.query.{ReportQueries => RQ}

/** Reporting CLI mirroring the reference's `report.py` flag surface
  * (SURVEY.md §3.2: one named DataFrame query per ReportQueries method,
  * table/csv/json sinks = S13-S15).
  *
  * Usage:
  *   runMain graft.Report <rawDir> (--all-owners | --find-owner NAME |
  *     --owner NAME [--entity contacts|companies|deals|combined|summary] |
  *     --recent-forms [--days N] | --recent-email [--days N] |
  *     --recent-activity NAME [--days N] | --engagement-history EMAIL |
  *     --ownership [USER_EMAIL] | --schema | --rel-types |
  *     --lifecycle-stages | --industries | --funnel | --campaigns |
  *     --top-companies N | --no-company | --engaged | --combined)
  *     [--format table|csv|json] [--out PATH]
  */
object Report {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  /** CLI body against a caller-owned session (e2e-testable). */
  def run(spark: SparkSession, args: Array[String]): Unit = {
    val rawDir = args.headOption.getOrElse(sys.error("usage: Report <rawDir> <flag>"))
    val flags = args.drop(1).toSeq
    def flagValue(name: String): Option[String] =
      flags.sliding(2).collectFirst { case Seq(`name`, v) if !v.startsWith("--") => v }
    val format = flagValue("--format").getOrElse("table")
    val out = flagValue("--out")
    import graft.model.CrmSchema

    def read(name: String, schema: org.apache.spark.sql.types.StructType) =
      spark.read.schema(schema).json(s"$rawDir/$name.json")
    val g = Pipeline.transformAll(
      read("users", CrmSchema.users), read("contacts", CrmSchema.envelope),
      read("companies", CrmSchema.envelope), read("deals", CrmSchema.envelope),
      read("engagements", CrmSchema.envelope),
      read("email_events", CrmSchema.emailEvents),
      read("form_submissions", CrmSchema.formSubmissions))

    import graft.query.{OwnershipQueries => OQ}
    // F19: the reporting "now" is captured once per invocation, not per row.
    val asOf = org.apache.spark.sql.functions.lit(
      new java.sql.Timestamp(System.currentTimeMillis()))
    def days = flagValue("--days").map(_.toInt).getOrElse(30)

    val result: DataFrame = flags.headOption match {
      case Some("--all-owners") => RQ.allOwnersSummary(g)
      case Some("--find-owner") => RQ.findOwner(g, flagValue("--find-owner").get)
      case Some("--owner") =>
        val name = flagValue("--owner").get
        flagValue("--entity").getOrElse("summary") match {
          case "contacts" => RQ.contactsByOwner(g, name)
          case "companies" => RQ.companiesByOwner(g, name)
          case "deals" => RQ.dealsByOwner(g, name)
          case "combined" => RQ.combinedByOwner(g, name)
          case _ => RQ.ownerSummary(g, name)
        }
      case Some("--recent-forms") => RQ.recentFormSubmissions(g, asOf, days)
      case Some("--recent-email") => RQ.recentEmailActivity(g, asOf, days)
      case Some("--recent-activity") =>
        RQ.contactsWithRecentActivity(g, flagValue("--recent-activity").get, asOf, days)
      case Some("--engagement-history") =>
        RQ.contactEngagementHistory(g, flagValue("--engagement-history").get)
      case Some("--ownership") =>
        flagValue("--ownership") match {
          case Some(email) => OQ.userOwnership(g, email)
          case None => OQ.allOwnerships(g)
        }
      case Some("--schema") => graft.query.Introspect.tableSchemas(g)
      case Some("--rel-types") => graft.query.Introspect.relationshipTypes(g)
      case Some("--lifecycle-stages") => RQ.contactsByLifecycle(g)
      case Some("--industries") => RQ.companiesByIndustry(g)
      case Some("--funnel") => RQ.conversionFunnel(g)
      case Some("--campaigns") => RQ.campaignPerformance(g)
      case Some("--top-companies") =>
        RQ.topCompaniesByDealValue(g, flagValue("--top-companies").map(_.toInt).getOrElse(10))
      case Some("--no-company") => RQ.contactsWithoutCompany(g)
      case Some("--engaged") => RQ.engagedContacts(g)
      case Some("--combined") => RQ.combinedOwnerView(g)
      case other => sys.error(s"unknown or missing report flag: $other")
    }

    sink(result, format, out)
  }

  /** S13/S14/S15 sinks. The coalesce(1) is a REPORT-output choice (one
    * readable file); bulk data writes elsewhere keep their partitioning. */
  def sink(result: DataFrame, format: String, out: Option[String]): Unit =
    (format, out) match {
      case ("table", _) => result.show(100, truncate = false)
      case ("csv", Some(p)) =>
        result.coalesce(1).write.mode("overwrite").option("header", "true").csv(p)
        println(s"[report] csv written to $p")
      case ("json", Some(p)) =>
        result.coalesce(1).write.mode("overwrite").json(p)
        println(s"[report] json written to $p")
      case (f, None) => sys.error(s"--format $f requires --out PATH")
      case (f, _) => sys.error(s"unknown format $f")
    }
}
