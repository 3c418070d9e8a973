package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The transformed CRM graph as a bundle of node tables + one edge table
  * (SURVEY.md §1.1). */
final case class GraphTables(
    users: DataFrame, contacts: DataFrame, companies: DataFrame,
    deals: DataFrame, activities: DataFrame, campaigns: DataFrame,
    webPages: DataFrame, opens: DataFrame, clicks: DataFrame,
    forms: DataFrame, edges: DataFrame)

/** One Scala function per reference report query
  * (SURVEY.md §3.2; reference reporting/queries.py:8-334 +
  * query_ownership.py:24-152). Cypher MATCH chains become equi-joins;
  * OPTIONAL MATCH becomes left join; EXISTS becomes semi-join; the
  * dimension sides (users, campaigns) are broadcast.
  */
object ReportQueries {

  private def ownerName: Column = concat_ws(" ", col("first_name"), col("last_name"))

  /** Owner lookup by name substring (P4; reporting/queries.py:20-21 etc.). */
  def findOwner(g: GraphTables, needle: String): DataFrame =
    g.users.filter(col("first_name").contains(needle) || col("last_name").contains(needle))
      .select(col("hubspot_id"), ownerName.as("owner_name"), col("email"), col("active"))
      .orderBy("hubspot_id")

  /** Per-owner entity counts + pipeline value — the A2 shape: three left
    * joins then DISTINCT counts (reporting/queries.py:122-141,
    * query_ownership.py:82-103). */
  def allOwnersSummary(g: GraphTables): DataFrame = {
    // users must be the PRESERVED side of the left joins (owners with zero
    // entities stay in the report), so it cannot be the broadcast build
    // side; the entity sides shuffle on owner_id instead (tiny key space).
    val u = g.users.select(col("hubspot_id").as("owner_key"),
      ownerName.as("owner_name"), col("email").as("owner_email"))
    u.join(g.contacts.select(col("hubspot_id").as("c_id"), col("owner_id").as("c_own")),
        col("c_own") === col("owner_key"), "left")
      .join(g.companies.select(col("hubspot_id").as("co_id"), col("owner_id").as("co_own")),
        col("co_own") === col("owner_key"), "left")
      .join(g.deals.select(col("hubspot_id").as("d_id"), col("owner_id").as("d_own"),
        col("amount")), col("d_own") === col("owner_key"), "left")
      .groupBy("owner_key", "owner_name", "owner_email")
      .agg(countDistinct("c_id").as("n_contacts"),
        countDistinct("co_id").as("n_companies"),
        countDistinct("d_id").as("n_deals"),
        round(coalesce(sum("amount"), lit(0.0)), 2).as("total_deal_value"))
      .orderBy(desc("n_contacts"), col("owner_key"))
  }

  /** A1 — contacts per lifecycle stage (reporting/queries.py:150-156). */
  def contactsByLifecycle(g: GraphTables): DataFrame =
    g.contacts.groupBy("lifecycle_stage").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("lifecycle_stage"))

  /** A1/P5 — companies per industry (reporting/queries.py:165-172). */
  def companiesByIndustry(g: GraphTables): DataFrame =
    g.companies.filter(col("industry").isNotNull)
      .groupBy("industry").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("industry"))

  /** A7 — lifecycle funnel with conversion rate (README.md:314-336). */
  def conversionFunnel(g: GraphTables): DataFrame = {
    val submits = g.edges.filter(col("rel_type") === "SUBMITTED_BY")
      .groupBy(col("dst_id").as("c_id")).agg(count(lit(1)).as("n_submissions"))
    g.contacts
      .join(submits, col("hubspot_id") === col("c_id"), "left")
      .groupBy("lifecycle_stage")
      .agg(count(lit(1)).as("n_contacts"),
        sum("total_email_opens").as("total_opens"),
        sum("total_email_clicks").as("total_clicks"),
        sum(coalesce(col("n_submissions"), lit(0L))).as("total_submissions"),
        round(sum(when(coalesce(col("n_submissions"), lit(0L)) > 0, 1).otherwise(0))
          * lit(100.0) / count(lit(1)), 4).as("conversion_pct"))
      .orderBy("lifecycle_stage")
  }

  /** A8 — per-campaign open/click rate (README.md:348-356, main.py:180-187). */
  def campaignPerformance(g: GraphTables): DataFrame = {
    val opens = g.opens.groupBy(col("campaign_id")).agg(count(lit(1)).as("n_opens"))
    val clicks = g.clicks.groupBy(col("campaign_id")).agg(count(lit(1)).as("n_clicks"))
    // campaigns is the preserved side of the left joins (campaigns with
    // zero opens stay in the report) — not broadcastable as build side
    g.campaigns.select(col("hubspot_id").as("campaign_id"), col("name"))
      .join(opens, Seq("campaign_id"), "left")
      .join(clicks, Seq("campaign_id"), "left")
      .withColumn("n_opens", coalesce(col("n_opens"), lit(0L)))
      .withColumn("n_clicks", coalesce(col("n_clicks"), lit(0L)))
      .withColumn("click_rate_pct",
        when(col("n_opens") > 0, round(col("n_clicks") * 100.0 / col("n_opens"), 4)))
      .orderBy(desc("n_opens"), col("campaign_id"))
  }

  /** A5/A6 — campaign engagement detail: first 10 opens (ordered collect
    * slice) + distinct clicked URLs (README.md:264-295). */
  def campaignEngagement(g: GraphTables, campaignId: String): DataFrame = {
    val o = g.opens.filter(col("campaign_id") === campaignId)
      .groupBy("campaign_id")
      .agg(min("timestamp").as("first_open"), max("timestamp").as("last_open"),
        slice(sort_array(collect_list(col("timestamp"))), 1, 10).as("first_10_opens"),
        count(lit(1)).as("n_opens"))
    val c = g.clicks.filter(col("campaign_id") === campaignId)
      .groupBy("campaign_id")
      .agg(sort_array(collect_set(col("clicked_url"))).as("clicked_urls"),
        count(lit(1)).as("n_clicks"))
    o.join(c, Seq("campaign_id"), "left")
  }

  /** O2 — top companies by associated deal value (README.md:341-346). */
  def topCompaniesByDealValue(g: GraphTables, k: Int): DataFrame =
    g.edges.filter(col("rel_type") === "BELONGS_TO")
      .select(col("src_id").as("deal_id"), col("dst_id").as("company_id"))
      .join(g.deals.select(col("hubspot_id").as("deal_id"), col("amount")), Seq("deal_id"))
      .groupBy("company_id")
      .agg(round(sum("amount"), 2).as("total_value"), count(lit(1)).as("n_deals"))
      .join(g.companies.select(col("hubspot_id").as("company_id"), col("name")),
        Seq("company_id"))
      .orderBy(desc("total_value"), col("company_id"))
      .limit(k)

  /** J5 — contacts with no company (README.md:376-381). */
  def contactsWithoutCompany(g: GraphTables): DataFrame =
    g.contacts.join(
        g.edges.filter(col("rel_type") === "WORKS_AT")
          .select(col("src_id").as("hubspot_id")),
        Seq("hubspot_id"), "left_anti")
      .select(col("hubspot_id"), col("email"), col("first_name"), col("last_name"))
      .orderBy("hubspot_id")

  /** J4 — contacts with any engagement: OR of three EXISTS = union of
    * semi-joins + distinct (README.md:299-312, DATA_MODEL.md:573-585). */
  def engagedContacts(g: GraphTables): DataFrame = {
    val byOpen = g.contacts.join(
      g.opens.select(col("recipient_email").as("email")), Seq("email"), "left_semi")
    val byClick = g.contacts.join(
      g.clicks.select(col("recipient_email").as("email")), Seq("email"), "left_semi")
    val byForm = g.contacts.join(
      g.forms.select(col("email")), Seq("email"), "left_semi")
    byOpen.unionByName(byClick).unionByName(byForm)
      .dropDuplicates("hubspot_id")
      .select(col("hubspot_id"), col("email"))
      .orderBy("hubspot_id")
  }

  /** U1 — combined contacts+companies per owner, aligned columns (the
    * reference Cypher is malformed; this implements the documented intent,
    * reporting/queries.py:298-334). */
  def combinedOwnerView(g: GraphTables): DataFrame = {
    val u = broadcast(g.users.select(col("hubspot_id").as("owner_key"),
      ownerName.as("owner_name"), col("email").as("owner_email")))
    val contacts = g.contacts.select(
      lit("contact").as("entity_type"), col("hubspot_id").as("identifier"),
      concat_ws(" ", col("first_name"), col("last_name")).as("name"),
      col("lifecycle_stage").as("status"), col("created_date"), col("owner_id"))
    val companies = g.companies.select(
      lit("company").as("entity_type"), col("hubspot_id").as("identifier"),
      col("name"), col("industry").as("status"), col("created_date"), col("owner_id"))
    contacts.unionByName(companies)
      .join(u, col("owner_id") === col("owner_key"), "left")
      .select(col("entity_type"), col("identifier"), col("name"), col("status"),
        col("created_date"), col("owner_name"), col("owner_email"))
      .orderBy("entity_type", "identifier")
  }

  /** J9 — clicks within 7 days before each form submission, per contact
    * (DATA_MODEL.md:597-609): equi on email + timestamp range. */
  def clicksBeforeSubmission(g: GraphTables): DataFrame = {
    val f = g.forms.select(col("hubspot_id").as("form_id"), col("email"),
      col("timestamp").as("form_ts"))
    val c = g.clicks.select(col("recipient_email").as("email"),
      col("timestamp").as("click_ts"), col("clicked_url"))
    f.join(c, Seq("email"), "left")
      .filter(col("click_ts").isNull ||
        (col("click_ts") < col("form_ts") &&
          col("click_ts") >= col("form_ts") - expr("INTERVAL 7 DAYS")))
      .groupBy("form_id", "email", "form_ts")
      .agg(count(col("click_ts")).as("n_prior_clicks"),
        sort_array(collect_set(col("clicked_url"))).as("urls"))
      .orderBy("form_id")
  }

  /** J8 — 2-hop chain contact → owner (→ SAME_AS person handled by
    * EntityMatcher output when present) (README.md:216-218, 530-533). */
  def contactOwnerChain(g: GraphTables): DataFrame =
    g.contacts.select(col("hubspot_id").as("contact_id"), col("email"),
        col("owner_id"))
      .join(broadcast(g.users.select(col("hubspot_id").as("owner_id"),
        ownerName.as("owner_name"), col("active").as("owner_active"))),
        Seq("owner_id"), "left")
      .orderBy("contact_id")
}
