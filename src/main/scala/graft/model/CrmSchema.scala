package graft.model

import org.apache.spark.sql.types._

/** Explicit read/interchange schemas for the CRM data model
  * (SURVEY.md §1; reference extractors/base_extractor.py:189-199,
  * extractors/users.py:48-62, extractors/email_events.py:42-50,
  * extractors/form_submissions.py:181-192).
  *
  * All property values arrive as strings or null — lenient casting is
  * part of the spec (graph_transformer.py:595-630).
  */
object CrmSchema {

  /** A1 — CRM record envelope (contacts / companies / deals / engagements). */
  val envelope: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("properties", MapType(StringType, StringType)),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("associations",
      MapType(StringType, ArrayType(StructType(Seq(StructField("id", StringType))))))
  ))

  /** A2 — users/owners (flat, no envelope). */
  val users: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("email", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("archived", BooleanType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("user_id", StringType),
    StructField("teams", ArrayType(StructType(Seq(
      StructField("id", StringType), StructField("name", StringType)))))
  ))

  /** A3 — email events (legacy flat shape; `created` is epoch-millis number
    * OR ISO string across fixtures — both must parse). */
  val emailEvents: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("recipient", StringType),
    StructField("created", StringType),
    StructField("emailCampaignId", StringType),
    StructField("emailCampaignName", StringType),
    StructField("subject", StringType),
    StructField("url", StringType),
    StructField("deviceType", StringType),
    StructField("location", StructType(Seq(
      StructField("city", StringType), StructField("state", StringType),
      StructField("country", StringType)))),
    StructField("browser", StringType),
    StructField("userAgent", StringType)
  ))

  /** A4 — form submissions (extractor-normalized). */
  val formSubmissions: StructType = StructType(Seq(
    StructField("form_guid", StringType),
    StructField("form_name", StringType),
    StructField("submitted_at", StringType),
    StructField("page_url", StringType),
    StructField("page_title", StringType),
    StructField("ip_address", StringType),
    StructField("email", StringType),
    StructField("values", ArrayType(StructType(Seq(
      StructField("name", StringType), StructField("value", StringType))))),
    StructField("contact_id", StringType)
  ))

  /** The single edge table (SURVEY.md §1.1/§1.4) — GraphFrames-style
    * edge-list convention: one DataFrame for all 15 edge types. */
  val edges: StructType = StructType(Seq(
    StructField("rel_type", StringType),
    StructField("src_type", StringType),
    StructField("src_id", StringType),
    StructField("src_email", StringType),
    StructField("dst_type", StringType),
    StructField("dst_id", StringType),
    StructField("props", MapType(StringType, StringType))
  ))

  /** Node-type labels (graph_transformer.py:13-25). */
  val NodeTypes: Seq[String] = Seq(
    "HUBSPOT_Contact", "HUBSPOT_Company", "HUBSPOT_Deal", "HUBSPOT_Activity",
    "HUBSPOT_EmailCampaign", "HUBSPOT_WebPage", "HUBSPOT_User",
    "HUBSPOT_EmailOpenEvent", "HUBSPOT_EmailClickEvent",
    "HUBSPOT_FormSubmission", "HUBSPOT_PageVisit")

  /** Immutable (append-only) event edge types, excluded from CDC diffing
    * (config/settings.py:76-86). */
  val ImmutableEdgeTypes: Set[String] =
    Set("PERFORMED", "SUBMITTED_BY", "ON_PAGE", "FOR_CAMPAIGN", "CLICKED_URL", "VISITED")
}
