package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.transform.{EdgeBuilder, GraphTransform => GT}
import graft.temporal.ScdLoader
import graft.query.GraphTables

/** End-to-end batch pipeline mirroring the reference's `main.py`
  * (SURVEY.md §3.1): read raw CRM JSON -> per-entity transforms -> edge
  * build + email resolution + validation -> SCD load against the state
  * directory -> verification counts.
  *
  * Usage: `runMain graft.Pipeline <rawDir> <stateDir>` where rawDir holds
  * contacts.json companies.json deals.json engagements.json users.json
  * email_events.json form_submissions.json (reference data/raw shapes,
  * FIXTURES.md §A).
  */
object Pipeline {

  /** Pure transform stage: raw frames -> node tables + resolved edge table. */
  def transformAll(
      usersRaw: DataFrame, contactsRaw: DataFrame, companiesRaw: DataFrame,
      dealsRaw: DataFrame, engagementsRaw: DataFrame, eventsRaw: DataFrame,
      formsRaw: DataFrame): GraphTables = {
    val users = GT.users(usersRaw)
    val contacts = GT.contacts(contactsRaw)
    val companies = GT.companies(companiesRaw)
    val deals = GT.deals(dealsRaw)
    val activities = GT.activities(engagementsRaw)
    val opens = GT.emailOpens(eventsRaw)
    val clicks = GT.emailClicks(eventsRaw)
    val forms = GT.formSubmissions(formsRaw)
    val campaigns = GT.emailCampaigns(
      eventsRaw.withColumn("campaign_id", col("emailCampaignId")))
    val pages = GT.webPages(clicks, forms, contacts)

    val edges = Seq(
      EdgeBuilder.worksAt(contactsRaw),
      EdgeBuilder.associatedWith(contactsRaw, dealsRaw),
      EdgeBuilder.belongsTo(dealsRaw),
      EdgeBuilder.ownedBy(contacts, "HUBSPOT_Contact"),
      EdgeBuilder.ownedBy(companies, "HUBSPOT_Company"),
      EdgeBuilder.ownedBy(deals, "HUBSPOT_Deal"),
      EdgeBuilder.activityEdges(engagementsRaw),
      EdgeBuilder.performed(opens, "HUBSPOT_EmailOpenEvent"),
      EdgeBuilder.performed(clicks, "HUBSPOT_EmailClickEvent"),
      EdgeBuilder.forCampaign(opens, "HUBSPOT_EmailOpenEvent"),
      EdgeBuilder.forCampaign(clicks, "HUBSPOT_EmailClickEvent"),
      EdgeBuilder.clickedUrl(clicks),
      EdgeBuilder.submittedBy(forms),
      EdgeBuilder.onPage(forms),
      EdgeBuilder.visited(contacts)
    ).reduce(_.unionByName(_))
    val resolved = EdgeBuilder.resolveEmailEdges(edges, contacts)

    GraphTables(users, contacts, companies, deals, activities, campaigns,
      pages, opens, clicks, forms, resolved)
  }

  private[graft] def fileExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Node-id table for J6 edge validation. */
  def nodeIds(g: GraphTables): DataFrame = Seq(
    g.users -> "HUBSPOT_User", g.contacts -> "HUBSPOT_Contact",
    g.companies -> "HUBSPOT_Company", g.deals -> "HUBSPOT_Deal",
    g.activities -> "HUBSPOT_Activity", g.campaigns -> "HUBSPOT_EmailCampaign",
    g.webPages -> "HUBSPOT_WebPage", g.opens -> "HUBSPOT_EmailOpenEvent",
    g.clicks -> "HUBSPOT_EmailClickEvent", g.forms -> "HUBSPOT_FormSubmission")
    .map { case (df, t) => df.select(lit(t).as("node_type"), col("hubspot_id")) }
    .reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val Array(rawDir, stateDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, rawDir, stateDir) finally spark.stop()
  }

  /** CLI body against a caller-owned session (e2e-testable). */
  def run(spark: SparkSession, rawDir: String, stateDir: String): Unit = {
    import graft.model.CrmSchema

    def read(name: String, schema: org.apache.spark.sql.types.StructType) =
      spark.read.schema(schema).json(s"$rawDir/$name.json")

    val g = transformAll(
      read("users", CrmSchema.users),
      read("contacts", CrmSchema.envelope),
      read("companies", CrmSchema.envelope),
      read("deals", CrmSchema.envelope),
      read("engagements", CrmSchema.envelope),
      read("email_events", CrmSchema.emailEvents),
      read("form_submissions", CrmSchema.formSubmissions))

    val validEdges = EdgeBuilder.validate(g.edges, nodeIds(g))
    val loadTs = current_timestamp()

    // SCD load per entity table against stateDir/current_<name>
    val tables = Map(
      "users" -> g.users, "contacts" -> g.contacts, "companies" -> g.companies,
      "deals" -> g.deals, "activities" -> g.activities)
    tables.foreach { case (name, nodes) =>
      val incoming = GT.withTemporal(nodes, loadTs)
      val curPath = s"$stateDir/current_$name"
      // First-load is decided by an explicit existence check, NOT by
      // catching the read failure: a transient FS error or corrupt footer
      // must fail loudly here, because treating it as "first load" would
      // make the SCD step mark every row as new — silent history
      // corruption (round-3 verdict #2).
      val current =
        if (fileExists(spark, curPath)) spark.read.parquet(curPath)
        else incoming.limit(0)
      val r = ScdLoader.applyScd(current, incoming, loadTs)
      r.current.write.mode("overwrite").parquet(s"$curPath.next")
      r.historyAppend.write.mode("append").parquet(s"$stateDir/history_$name")
      val fs = new org.apache.hadoop.fs.Path(curPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(curPath), true)
      fs.rename(new org.apache.hadoop.fs.Path(s"$curPath.next"),
        new org.apache.hadoop.fs.Path(curPath))
      println(s"[pipeline] $name loaded")
    }
    // Event tables are append-only (T5)
    validEdges.write.mode("overwrite").parquet(s"$stateDir/edges")

    // Verification counts (S17): one job per table family
    val counts = tables.map { case (n, df) => s"$n=${df.count()}" }.mkString(" ")
    println(s"[pipeline] nodes: $counts edges=${validEdges.count()}")
  }
}
