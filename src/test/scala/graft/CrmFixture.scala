package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.CrmSchema

/** In-memory reproduction of the reference's minimal synthetic dataset
  * (FIXTURES.md §A; reference scripts/create_test_data.py:16-306:
  * 2 users, 3 contacts, 2 companies, 2 deals, 3 engagements,
  * 3 email events, 2 form submissions → ~15-20 relationships). */
object CrmFixture {

  private def readJson(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      rows: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(rows.toDS)
  }

  def usersRaw(spark: SparkSession): DataFrame = readJson(spark, CrmSchema.users, Seq(
    """{"id":"user_1","email":"john.doe@example.com","first_name":"John","last_name":"Doe",
       "archived":false,"created_at":"2024-01-01T10:00:00Z","updated_at":"2024-01-01T10:00:00Z",
       "user_id":"100","teams":[{"id":"1","name":"Sales"}]}""".replaceAll("\n\\s*", ""),
    """{"id":"user_2","email":"jane.roe@example.com","first_name":"Jane","last_name":"Roe",
       "archived":true,"created_at":"2024-01-02T10:00:00Z","updated_at":"2024-01-03T10:00:00Z",
       "user_id":"101","teams":[{"id":"1","name":"Sales"},{"id":"2","name":"CS"}]}"""
      .replaceAll("\n\\s*", "")))

  def contactsRaw(spark: SparkSession): DataFrame = readJson(spark, CrmSchema.envelope, Seq(
    """{"id":"c1","properties":{"email":" Alice@Company1.com ","firstname":"Alice","lastname":"A",
       "jobtitle":"CTO","lifecyclestage":"customer","createdate":"1704067200000",
       "lastmodifieddate":"2024-06-01T00:00:00Z","hubspot_owner_id":"user_1",
       "associatedcompanyid":"co1","hs_email_open":"5","hs_email_click":"2",
       "hs_analytics_num_visits":"7","hs_analytics_source":"ORGANIC",
       "hs_analytics_first_url":"https://www.company1.com/home","country":"US","city":"NY"},
       "associations":{"deals":[{"id":"d1"}]}}""".replaceAll("\n\\s*", ""),
    """{"id":"c2","properties":{"email":"bob@company2.com","firstname":"Bob","lastname":"B",
       "lifecyclestage":"lead","createdate":"2024-02-01T00:00:00Z","hubspot_owner_id":"user_2",
       "hs_email_open":"not_a_number"},"associations":{}}""".replaceAll("\n\\s*", ""),
    """{"id":"c3","properties":{"email":null,"firstname":"Carol","lastname":"C",
       "lifecyclestage":"lead"},"associations":{}}""".replaceAll("\n\\s*", "")))

  /** Second contact snapshot for SCD scenarios: c1 promoted (jobtitle
    * CTO -> CEO), c2 unchanged, c3 missing (-> soft delete). */
  def contactsRawV2(spark: SparkSession): DataFrame = readJson(spark, CrmSchema.envelope, Seq(
    """{"id":"c1","properties":{"email":" Alice@Company1.com ","firstname":"Alice","lastname":"A",
       "jobtitle":"CEO","lifecyclestage":"customer","createdate":"1704067200000",
       "lastmodifieddate":"2024-06-01T00:00:00Z","hubspot_owner_id":"user_1",
       "associatedcompanyid":"co1","hs_email_open":"5","hs_email_click":"2",
       "hs_analytics_num_visits":"7","hs_analytics_source":"ORGANIC",
       "hs_analytics_first_url":"https://www.company1.com/home","country":"US","city":"NY"},
       "associations":{"deals":[{"id":"d1"}]}}""".replaceAll("\n\\s*", ""),
    """{"id":"c2","properties":{"email":"bob@company2.com","firstname":"Bob","lastname":"B",
       "lifecyclestage":"lead","createdate":"2024-02-01T00:00:00Z","hubspot_owner_id":"user_2",
       "hs_email_open":"not_a_number"},"associations":{}}""".replaceAll("\n\\s*", "")))

  def companiesRaw(spark: SparkSession): DataFrame = readJson(spark, CrmSchema.envelope, Seq(
    """{"id":"co1","properties":{"name":"Company One","domain":"WWW.Company1.com",
       "industry":"Tech","numberofemployees":"50","annualrevenue":"1000000.5",
       "createdate":"1704067200000","hubspot_owner_id":"user_1"}}""".replaceAll("\n\\s*", ""),
    """{"id":"co2","properties":{"name":"Company Two","domain":"company2.com",
       "industry":"Retail","numberofemployees":"bad","annualrevenue":null}}"""
      .replaceAll("\n\\s*", "")))

  def dealsRaw(spark: SparkSession): DataFrame = readJson(spark, CrmSchema.envelope, Seq(
    """{"id":"d1","properties":{"dealname":"Big Deal","amount":"50000","dealstage":"closedwon",
       "pipeline":"default","closedate":"1718131200000","createdate":"1704067200000",
       "hs_is_closed_won":"true","hubspot_owner_id":"user_1",
       "hs_forecast_probability":"0.9"},
       "associations":{"contacts":[{"id":"c1"},{"id":"c2"}],"companies":[{"id":"co1"}]}}"""
      .replaceAll("\n\\s*", ""),
    """{"id":"d2","properties":{"dealname":"Small Deal","amount":"1000.5",
       "dealstage":"qualification","hs_is_closed_won":"false"},
       "associations":{"companies":[{"id":"co2"}]}}""".replaceAll("\n\\s*", "")))

  /** Second deal snapshot for relationship-CDC scenarios: identical to
    * [[dealsRaw]] except d1 lost its company association (-> exactly one
    * removed BELONGS_TO edge, nothing added). */
  def dealsRawV2(spark: SparkSession): DataFrame = readJson(spark, CrmSchema.envelope, Seq(
    """{"id":"d1","properties":{"dealname":"Big Deal","amount":"50000","dealstage":"closedwon",
       "pipeline":"default","closedate":"1718131200000","createdate":"1704067200000",
       "hs_is_closed_won":"true","hubspot_owner_id":"user_1",
       "hs_forecast_probability":"0.9"},
       "associations":{"contacts":[{"id":"c1"},{"id":"c2"}]}}"""
      .replaceAll("\n\\s*", ""),
    """{"id":"d2","properties":{"dealname":"Small Deal","amount":"1000.5",
       "dealstage":"qualification","hs_is_closed_won":"false"},
       "associations":{"companies":[{"id":"co2"}]}}""".replaceAll("\n\\s*", "")))

  def engagementsRaw(spark: SparkSession): DataFrame = readJson(spark, CrmSchema.envelope, Seq(
    """{"id":"e1","properties":{"hs_engagement_type":"MEETING","hs_timestamp":"1718131200000",
       "hs_meeting_title":"Kickoff","hs_meeting_body":"notes",
       "hs_meeting_start_time":"1718131200000","hs_meeting_end_time":"1718134800000"},
       "associations":{"contacts":[{"id":"c1"}],"deals":[{"id":"d1"}]}}"""
      .replaceAll("\n\\s*", ""),
    """{"id":"e2","properties":{"hs_engagement_type":"CALL","hs_timestamp":"1718217600000",
       "hs_call_title":"Follow-up","hs_call_duration":"600"},
       "associations":{"companies":[{"id":"co1"}]}}""".replaceAll("\n\\s*", ""),
    """{"id":"e3","properties":{"hs_engagement_type":"NOTE","hs_timestamp":"1718304000000",
       "hs_note_body":"a note"},"associations":{}}""".replaceAll("\n\\s*", "")))

  def emailEventsRaw(spark: SparkSession): DataFrame = readJson(spark, CrmSchema.emailEvents, Seq(
    """{"event_type":"OPEN","recipient":"alice@company1.com","created":"1718131200000",
       "emailCampaignId":"999","emailCampaignName":"Spring","subject":"Hello",
       "deviceType":"COMPUTER","location":{"city":"Chicago"}}""".replaceAll("\n\\s*", ""),
    """{"event_type":"CLICK","recipient":"alice@company1.com","created":"2024-06-12T10:00:00Z",
       "emailCampaignId":"999","emailCampaignName":"Spring","subject":"Hello",
       "url":"https://www.company1.com/pricing","deviceType":"MOBILE",
       "location":{"city":"NY"}}""".replaceAll("\n\\s*", ""),
    """{"event_type":"SENT","recipient":"bob@company2.com","created":"1718131200000",
       "emailCampaignId":"999"}""".replaceAll("\n\\s*", ""),
    """{"event_type":"OPEN","recipient":null,"created":"1718131200000",
       "emailCampaignId":"998"}""".replaceAll("\n\\s*", "")))

  def formsRaw(spark: SparkSession): DataFrame = readJson(spark, CrmSchema.formSubmissions, Seq(
    """{"form_guid":"g-1","form_name":"Contact Us","submitted_at":"1705312800000",
       "page_url":"https://company1.com/contact","page_title":"Contact",
       "ip_address":"1.2.3.4","email":"alice@company1.com",
       "values":[{"name":"email","value":"alice@company1.com"}]}""".replaceAll("\n\\s*", ""),
    """{"form_guid":"g-2","form_name":"Download","submitted_at":"1705399200000",
       "page_url":"https://company2.com/dl","email":null,
       "values":[{"name":"firstname","value":"Bob"},{"name":"E-Mail","value":"BOB@company2.com"}]}"""
      .replaceAll("\n\\s*", ""),
    """{"form_guid":"g-3","form_name":"NoEmail","submitted_at":"1705485600000",
       "page_url":"https://x.com/p","email":null,"values":[{"name":"q","value":"hi"}]}"""
      .replaceAll("\n\\s*", "")))
}
