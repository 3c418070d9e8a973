package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.query.{EntityMatcher, ReportQueries => RQ}

/** Report-query layer behavior over the full transformed fixture graph
  * (reference reporting/queries.py + query_ownership.py semantics). */
class QuerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val g = Pipeline.transformAll(
    CrmFixture.usersRaw(spark), CrmFixture.contactsRaw(spark),
    CrmFixture.companiesRaw(spark), CrmFixture.dealsRaw(spark),
    CrmFixture.engagementsRaw(spark), CrmFixture.emailEventsRaw(spark),
    CrmFixture.formsRaw(spark))

  test("pipeline builds all 15 edge types with resolved email edges") {
    val types = g.edges.select("rel_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("WORKS_AT", "ASSOCIATED_WITH", "BELONGS_TO", "OWNED_BY",
      "INVOLVES", "RELATED_TO", "PERFORMED", "FOR_CAMPAIGN", "CLICKED_URL",
      "SUBMITTED_BY", "ON_PAGE", "VISITED"))
    // every PERFORMED edge ended up with a resolved contact id
    assert(g.edges.filter(col("rel_type") === "PERFORMED" && col("src_id").isNull)
      .count() == 0)
  }

  test("findOwner: substring match") {
    val got = RQ.findOwner(g, "Doe").collect()
    assert(got.length == 1 && got(0).getString(1) == "John Doe")
  }

  test("allOwnersSummary: distinct counts + deal value, zero-entity owners kept") {
    val rows = RQ.allOwnersSummary(g).collect()
      .map(r => r.getString(0) -> r).toMap
    val u1 = rows("user_1")
    assert(u1.getLong(u1.fieldIndex("n_contacts")) == 1)   // c1
    assert(u1.getLong(u1.fieldIndex("n_companies")) == 1)  // co1
    assert(u1.getLong(u1.fieldIndex("n_deals")) == 1)      // d1
    assert(u1.getDouble(u1.fieldIndex("total_deal_value")) == 50000.0)
    val u2 = rows("user_2")
    assert(u2.getLong(u2.fieldIndex("n_deals")) == 0)      // left-join keeps owner
  }

  test("contactsWithoutCompany: anti-join") {
    val got = RQ.contactsWithoutCompany(g).collect().map(_.getString(0)).toSet
    assert(got == Set("c2", "c3")) // only c1 WORKS_AT a company
  }

  test("engagedContacts: OR of three semi-joins") {
    val got = RQ.engagedContacts(g).collect().map(_.getString(0)).toSet
    assert(got == Set("c1", "c2")) // alice via events+form, bob via form values
  }

  test("topCompaniesByDealValue ranks by BELONGS_TO deal sums") {
    val got = RQ.topCompaniesByDealValue(g, 5).collect()
    assert(got(0).getString(got(0).fieldIndex("company_id")) == "co1") // 50000 > 1000.5
    assert(got(0).getDouble(got(0).fieldIndex("total_value")) == 50000.0)
  }

  test("campaignPerformance: open/click counts + rate") {
    val rows = RQ.campaignPerformance(g).collect()
    val c999 = rows.find(_.getString(0) == "999").get
    assert(c999.getLong(c999.fieldIndex("n_opens")) == 1)
    assert(c999.getLong(c999.fieldIndex("n_clicks")) == 1)
    assert(c999.getDouble(c999.fieldIndex("click_rate_pct")) == 100.0)
  }

  test("combinedOwnerView aligns contacts and companies") {
    val rows = RQ.combinedOwnerView(g).collect()
    assert(rows.count(_.getString(0) == "contact") == 3)
    assert(rows.count(_.getString(0) == "company") == 2)
    val c1 = rows.find(r => r.getString(1) == "c1").get
    assert(c1.getString(c1.fieldIndex("owner_name")) == "John Doe")
  }

  test("conversionFunnel counts submissions per stage") {
    val rows = RQ.conversionFunnel(g).collect().map(r => r.getString(0) -> r).toMap
    val cust = rows("customer") // alice
    assert(cust.getLong(cust.fieldIndex("n_contacts")) == 1)
    assert(cust.getLong(cust.fieldIndex("total_opens")) == 5)
    assert(cust.getDouble(cust.fieldIndex("conversion_pct")) == 100.0)
  }

  test("clicksBeforeSubmission: J9 range join per contact email") {
    // alice's click (2024-06-12) is NOT within 7d before her form (2024-01-15)
    val rows = RQ.clicksBeforeSubmission(g).collect()
    assert(rows.forall(r => r.getLong(r.fieldIndex("n_prior_clicks")) == 0))
  }

  test("entity matcher: linkedin first, email fallback, unmatched reported") {
    val users = Seq(
      ("u1", "a@x.com", "linkedin.com/in/alice"),
      ("u2", "b@x.com", null),
      ("u3", "nobody@x.com", null)
    ).toDF("hubspot_id", "email", "linkedin_url")
    val persons = Seq(
      ("p1", "other@y.com", "linkedin.com/in/alice"),
      ("p2", "b@x.com", "linkedin.com/in/bob")
    ).toDF("person_id", "email", "linkedin_url")
    val m = EntityMatcher.matchUsers(users, persons).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(m("u1") == ("p1", "linkedin_url"))
    assert(m("u2") == ("p2", "email"))
    assert(m("u3") == (null, "unmatched"))
    assert(EntityMatcher.sameAsEdges(
      EntityMatcher.matchUsers(users, persons)).count() == 2)
  }
}
