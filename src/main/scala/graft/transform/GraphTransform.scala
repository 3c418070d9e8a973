package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Clean._

/** Per-entity column pipelines: raw CRM JSON records → typed node tables
  * (SURVEY.md §1.2; reference transformers/graph_transformer.py:32-630).
  *
  * Every reference per-row Python loop becomes one vectorized select; the
  * whole transform is narrow (no shuffle) except the explicit dedups.
  * Surrogate ids (reference F17, run-order counters) are replaced by
  * content-derived md5 ids so output is deterministic and distributable —
  * a documented deviation (graph_transformer.py:29, 393-395, 516-517).
  */
object GraphTransform {

  private def prop(name: String): Column = col("properties").getItem(name)

  /** The five SCD bookkeeping columns every node row carries
    * (graph_transformer.py:119-124). */
  def withTemporal(df: DataFrame, loadTs: Column): DataFrame =
    df.withColumn("valid_from", loadTs)
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
      .withColumn("is_deleted", lit(false))
      .withColumn("snapshot_hash", snapshotHash(df.columns))

  /** HUBSPOT_User (graph_transformer.py:69-92). */
  def users(raw: DataFrame): DataFrame =
    raw.select(
      col("id").as("hubspot_id"),
      cleanEmail(col("email")).as("email"),
      col("first_name"), col("last_name"),
      (!coalesce(col("archived"), lit(false))).as("active"),
      coalesce(col("archived"), lit(false)).as("archived"),
      parseHubspotTs(col("created_at")).as("created_date"),
      parseHubspotTs(col("updated_at")).as("last_modified"),
      col("user_id"),
      array_join(transform(col("teams"), t => t.getField("name")), ", ").as("teams"))

  /** HUBSPOT_Contact (graph_transformer.py:99-117). */
  def contacts(raw: DataFrame): DataFrame =
    raw.select(
      col("id").as("hubspot_id"),
      cleanEmail(prop("email")).as("email"),
      prop("firstname").as("first_name"),
      prop("lastname").as("last_name"),
      prop("jobtitle").as("job_title"),
      prop("lifecyclestage").as("lifecycle_stage"),
      parseHubspotTs(prop("createdate")).as("created_date"),
      parseHubspotTs(prop("lastmodifieddate")).as("last_modified"),
      prop("hubspot_owner_id").as("owner_id"),
      safeInt(prop("hs_email_open")).as("total_email_opens"),
      safeInt(prop("hs_email_click")).as("total_email_clicks"),
      safeInt(prop("hs_analytics_num_visits")).as("total_page_views"),
      prop("hs_analytics_source").as("source"),
      prop("hs_analytics_first_url").as("first_page_seen"),
      prop("country").as("country"), prop("city").as("city"), prop("state").as("state"))

  /** HUBSPOT_Company (graph_transformer.py:187-201). */
  def companies(raw: DataFrame): DataFrame =
    raw.select(
      col("id").as("hubspot_id"),
      prop("name").as("name"),
      cleanDomain(prop("domain")).as("domain"),
      prop("industry").as("industry"),
      safeInt(prop("numberofemployees")).as("employee_count"),
      safeDouble(prop("annualrevenue")).as("annual_revenue"),
      prop("description").as("description"),
      parseHubspotTs(prop("createdate")).as("created_date"),
      parseHubspotTs(prop("hs_lastmodifieddate")).as("last_modified"),
      prop("hubspot_owner_id").as("owner_id"),
      prop("country").as("country"), prop("city").as("city"), prop("state").as("state"))

  /** HUBSPOT_Deal (graph_transformer.py:229-241). */
  def deals(raw: DataFrame): DataFrame =
    raw.select(
      col("id").as("hubspot_id"),
      prop("dealname").as("name"),
      safeDouble(prop("amount")).as("amount"),
      prop("dealstage").as("stage"),
      prop("pipeline").as("pipeline"),
      parseHubspotTs(prop("closedate")).as("close_date"),
      parseHubspotTs(prop("createdate")).as("created_date"),
      parseHubspotTs(prop("hs_lastmodifieddate")).as("last_modified"),
      prop("hubspot_owner_id").as("owner_id"),
      parseBool(prop("hs_is_closed_won")).as("is_won"),
      safeDouble(prop("hs_forecast_probability")).as("probability"))

  /** HUBSPOT_Activity with type-dispatched detail columns
    * (graph_transformer.py:292-320): P3 — columns chosen by engagement type. */
  def activities(raw: DataFrame): DataFrame = {
    val t = prop("hs_engagement_type")
    raw.select(
      col("id").as("hubspot_id"),
      t.as("type"),
      parseHubspotTs(prop("hs_timestamp")).as("timestamp"),
      parseHubspotTs(prop("hs_createdate")).as("created_date"),
      when(t === "MEETING", prop("hs_meeting_title"))
        .when(t === "CALL", prop("hs_call_title"))
        .when(t === "TASK", prop("hs_task_subject"))
        .otherwise(lit(null)).as("details"),
      when(t === "MEETING", prop("hs_meeting_body"))
        .when(t === "CALL", prop("hs_call_body"))
        .when(t === "NOTE", substring(prop("hs_note_body"), 1, 200))
        .when(t === "TASK", prop("hs_task_body"))
        .otherwise(lit(null)).as("body"),
      when(t === "MEETING", parseHubspotTs(prop("hs_meeting_start_time")))
        .otherwise(lit(null).cast("timestamp")).as("start_time"),
      when(t === "MEETING", parseHubspotTs(prop("hs_meeting_end_time")))
        .otherwise(lit(null).cast("timestamp")).as("end_time"),
      when(t === "CALL", safeInt(prop("hs_call_duration")))
        .otherwise(lit(null).cast("long")).as("duration"),
      when(t === "TASK", prop("hs_task_status")).otherwise(lit(null)).as("status"))
  }

  private def openClickBase(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isin("OPEN", "CLICK") && col("recipient").isNotNull)
      .withColumn("ts", parseHubspotTs(col("created")))
      .withColumn("recipient_email", cleanEmail(col("recipient")))

  /** HUBSPOT_EmailOpenEvent (graph_transformer.py:399-408); id is
    * content-derived (deviation from the reference's counter ids). */
  def emailOpens(events: DataFrame): DataFrame =
    openClickBase(events).filter(col("event_type") === "OPEN")
      .select(
        concat(lit("email_open_"),
          md5(concat_ws("|", col("recipient_email"), col("emailCampaignId"),
            col("created")))).as("hubspot_id"),
        col("ts").as("timestamp"),
        col("emailCampaignId").as("campaign_id"),
        col("recipient_email"),
        col("deviceType").as("device_type"),
        col("location").getField("city").as("location"),
        coalesce(col("browser"), col("userAgent")).as("browser"))
      .dropDuplicates("hubspot_id")

  /** HUBSPOT_EmailClickEvent = open schema + clicked_url
    * (graph_transformer.py:432-442). */
  def emailClicks(events: DataFrame): DataFrame =
    openClickBase(events).filter(col("event_type") === "CLICK")
      .select(
        concat(lit("email_click_"),
          md5(concat_ws("|", col("recipient_email"), col("emailCampaignId"),
            col("created"), col("url")))).as("hubspot_id"),
        col("ts").as("timestamp"),
        col("emailCampaignId").as("campaign_id"),
        col("recipient_email"),
        col("deviceType").as("device_type"),
        col("location").getField("city").as("location"),
        coalesce(col("browser"), col("userAgent")).as("browser"),
        col("url").as("clicked_url"))
      .dropDuplicates("hubspot_id")

  /** HUBSPOT_EmailCampaign — first-seen dedup per campaign id
    * (A12; graph_transformer.py:377-386). */
  def emailCampaigns(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("campaign_id")
      .orderBy(col("ts").asc_nulls_last, col("name").asc_nulls_last)
    events.filter(col("emailCampaignId").isNotNull)
      .select(col("emailCampaignId").as("campaign_id"),
        col("emailCampaignName").as("name"), col("subject"),
        parseHubspotTs(col("created")).as("ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("campaign_id").as("hubspot_id"), col("name"), col("subject"),
        col("ts").as("sent_date"))
  }

  /** HUBSPOT_WebPage — URL nodes from click targets, form pages and first
    * pages seen, first-seen dedup (graph_transformer.py:477-493). */
  def webPages(clicks: DataFrame, forms: DataFrame, contactNodes: DataFrame): DataFrame = {
    val urls = clicks.select(col("clicked_url").as("url"), lit(null).cast("string").as("title"))
      .unionByName(forms.select(col("page_url").as("url"), col("page_title").as("title")))
      .unionByName(contactNodes.select(col("first_page_seen").as("url"),
        lit(null).cast("string").as("title")))
      .filter(col("url").isNotNull)
    urls.groupBy("url")
      .agg(min("title").as("title"))
      .select(col("url").as("hubspot_id"), col("url"),
        urlDomain(col("url")).as("domain"), urlPath(col("url")).as("path"), col("title"))
  }

  /** HUBSPOT_FormSubmission — email extracted from the values array when
    * missing; rows without any email are dropped (P10/F10;
    * form_submissions.py:178-231, graph_transformer.py:530-540). */
  def formSubmissions(raw: DataFrame): DataFrame =
    raw
      .withColumn("resolved_email",
        coalesce(cleanEmail(col("email")), emailFromValues(col("values"))))
      .filter(col("resolved_email").isNotNull)
      .select(
        concat(lit("form_submission_"),
          md5(concat_ws("|", col("form_guid"), col("submitted_at"),
            col("resolved_email")))).as("hubspot_id"),
        parseHubspotTs(col("submitted_at")).as("timestamp"),
        parseHubspotTs(col("submitted_at")).as("created_date"),
        col("form_guid"), col("form_name"), col("page_url"), col("page_title"),
        col("ip_address"),
        col("resolved_email").as("email"))
      .dropDuplicates("hubspot_id")
}
