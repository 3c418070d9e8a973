package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import graft.query.{OwnershipQueries => OQ, QuerySql => S,
  ReportQueries => RQ, TemporalQueries => TQ}

/** SQL front door parity (round-11 verdict #6): every reference query —
  * the 13 reporting texts, the 8 ownership lookups, the 11 temporal
  * views — expressed as a `spark.sql` text over the registered temp
  * views, asserted ROW-IDENTICAL (same columns, same values, same
  * order) against its DataFrame twin on the full fixture graph and a
  * real two-load SCD state. */
class QuerySqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val g = {
    val tables = Pipeline.transformAll(
      CrmFixture.usersRaw(spark), CrmFixture.contactsRaw(spark),
      CrmFixture.companiesRaw(spark), CrmFixture.dealsRaw(spark),
      CrmFixture.engagementsRaw(spark), CrmFixture.emailEventsRaw(spark),
      CrmFixture.formsRaw(spark))
    S.registerViews(tables)
    tables
  }

  /** The two-load SCD state (TemporalCliSpec scenario): c1 changed
    * CTO -> CEO, c2 unchanged, c3 soft-deleted. */
  private lazy val scd: (DataFrame, DataFrame, DataFrame) = {
    val raw = java.nio.file.Files.createTempDirectory("graft-qsql-raw").toString
    val state = java.nio.file.Files.createTempDirectory("graft-qsql-state").toString
    def writeRaw(contacts: DataFrame, deals: DataFrame): Unit = Seq(
      "users" -> CrmFixture.usersRaw(spark),
      "contacts" -> contacts,
      "companies" -> CrmFixture.companiesRaw(spark),
      "deals" -> deals,
      "engagements" -> CrmFixture.engagementsRaw(spark),
      "email_events" -> CrmFixture.emailEventsRaw(spark),
      "form_submissions" -> CrmFixture.formsRaw(spark)
    ).foreach { case (n, df) => df.write.mode("overwrite").json(s"$raw/$n.json") }
    // second load: c1 changed + c3 soft-deleted (node history) AND d1
    // lost its company edge (a non-empty relationship CDC log)
    writeRaw(CrmFixture.contactsRaw(spark), CrmFixture.dealsRaw(spark))
    Pipeline.run(spark, raw, state)
    writeRaw(CrmFixture.contactsRawV2(spark), CrmFixture.dealsRawV2(spark))
    Pipeline.run(spark, raw, state)
    val cur = Pipeline.currentTable(spark, state, "contacts").get
    val hist = Pipeline.historyTable(spark, state, "contacts").get
    val rel = Pipeline.relChanges(spark, state).get
    S.registerTemporalViews(cur, hist, rel)
    (cur, hist, rel)
  }

  /** Row-identity: same column names, same values, same order. Queries
    * whose ORDER BY admits ties (flagged `ordered = false`) compare as
    * multisets instead. */
  private def parity(twin: DataFrame, sql: String,
      ordered: Boolean = true): Unit = {
    val viaSql = spark.sql(sql)
    assert(twin.columns.toSeq == viaSql.columns.toSeq,
      s"column mismatch: ${twin.columns.toSeq} vs ${viaSql.columns.toSeq}")
    val a = twin.collect().toSeq
    val b = viaSql.collect().toSeq
    if (ordered) assert(a == b, s"rows differ:\n twin: $a\n sql:  $b")
    else assert(a.groupBy(identity).view.mapValues(_.size).toMap ==
      b.groupBy(identity).view.mapValues(_.size).toMap,
      s"row multisets differ:\n twin: $a\n sql:  $b")
    assert(a.nonEmpty || b.isEmpty) // both empty is fine, flag asymmetry
  }

  private val asOfS = "timestamp'2024-06-05 00:00:00'"
  private def asOfC = lit("2024-06-05 00:00:00").cast("timestamp")

  // ---- reporting (13) ----

  test("sql parity: findOwner")(parity(RQ.findOwner(g, "Doe"), S.findOwner("Doe")))
  test("sql parity: findOwner by id needle")(
    parity(RQ.findOwner(g, "id:user_2"), S.findOwner("id:user_2")))
  test("sql parity: contactsByOwner")(
    parity(RQ.contactsByOwner(g, "Doe"), S.contactsByOwner("Doe")))
  test("sql parity: companiesByOwner")(
    parity(RQ.companiesByOwner(g, "Doe"), S.companiesByOwner("Doe")))
  test("sql parity: dealsByOwner")(
    parity(RQ.dealsByOwner(g, "Doe"), S.dealsByOwner("Doe")))
  test("sql parity: ownerSummary")(
    parity(RQ.ownerSummary(g, "o"), S.ownerSummary("o")))
  test("sql parity: allOwnersSummary")(
    parity(RQ.allOwnersSummary(g), S.allOwnersSummary))
  test("sql parity: contactsByLifecycle")(
    parity(RQ.contactsByLifecycle(g), S.contactsByLifecycle))
  test("sql parity: companiesByIndustry")(
    parity(RQ.companiesByIndustry(g), S.companiesByIndustry))
  test("sql parity: recentFormSubmissions")(
    parity(RQ.recentFormSubmissions(g, asOfC, 3650),
      S.recentFormSubmissions(asOfS, 3650)))
  test("sql parity: recentEmailActivity")(
    parity(RQ.recentEmailActivity(g, asOfC, 3650),
      S.recentEmailActivity(asOfS, 3650)))
  test("sql parity: contactsWithRecentActivity")(
    parity(RQ.contactsWithRecentActivity(g, "Doe", asOfC, 3650),
      S.contactsWithRecentActivity("Doe", asOfS, 3650)))
  test("sql parity: contactEngagementHistory")(
    parity(RQ.contactEngagementHistory(g, "alice@company1.com"),
      S.contactEngagementHistory("alice@company1.com"), ordered = false))
  test("sql parity: combinedByOwner")(
    parity(RQ.combinedByOwner(g, "Doe"), S.combinedByOwner("Doe")))

  // ---- ownership (8) ----

  test("sql parity: contactOwner")(
    parity(OQ.contactOwner(g, "alice@company1.com"),
      S.contactOwner("alice@company1.com")))
  test("sql parity: companyOwner")(
    parity(OQ.companyOwner(g, "Company"), S.companyOwner("Company")))
  test("sql parity: dealOwner")(
    parity(OQ.dealOwner(g, "Deal"), S.dealOwner("Deal")))
  test("sql parity: userOwnership")(
    parity(OQ.userOwnership(g, "john.doe@example.com"),
      S.userOwnership("john.doe@example.com")))
  test("sql parity: allOwnerships")(
    parity(OQ.allOwnerships(g), S.allOwnerships))
  test("sql parity: contactsWithOwners")(
    parity(OQ.contactsWithOwners(g, 10), S.contactsWithOwners(10)))
  test("sql parity: companiesWithOwners")(
    parity(OQ.companiesWithOwners(g, 10), S.companiesWithOwners(10)))
  test("sql parity: dealsWithOwners")(
    parity(OQ.dealsWithOwners(g, 10), S.dealsWithOwners(10)))

  // ---- temporal (11) ----

  private def fields = scd._1.columns.toSeq.filterNot(Set(
    "hubspot_id", "valid_from", "valid_to", "is_current", "is_deleted",
    "snapshot_hash"))

  test("sql parity: currentEntities") {
    val (cur, _, _) = scd
    parity(TQ.currentEntities(cur, 10), S.currentEntities(10))
  }
  test("sql parity: entityHistory") {
    val (cur, hist, _) = scd
    parity(TQ.entityHistory(cur, hist, "c1"), S.entityHistory("c1"))
  }
  test("sql parity: deletedEntities") {
    val (cur, _, _) = scd
    parity(TQ.deletedEntities(cur), S.deletedEntities)
  }
  test("sql parity: recentChanges") {
    val (cur, _, _) = scd
    val cutoff = lit("2000-01-01 00:00:00").cast("timestamp")
    parity(TQ.recentChanges(cur, cutoff, 10),
      S.recentChanges("timestamp'2000-01-01 00:00:00'", 10))
  }
  test("sql parity: recentRelationshipChanges") {
    val (_, _, rel) = scd
    parity(TQ.recentRelationshipChanges(rel, 20), S.recentRelationshipChanges(20))
  }
  test("sql parity: entityRelationshipHistory") {
    val (_, _, rel) = scd
    parity(TQ.entityRelationshipHistory(rel, "HUBSPOT_Contact", "c1"),
      S.entityRelationshipHistory("HUBSPOT_Contact", "c1"))
  }
  test("sql parity: ownershipChanges") {
    val (_, _, rel) = scd
    parity(TQ.ownershipChanges(rel, Some("HUBSPOT_Contact"), None),
      S.ownershipChanges(Some("HUBSPOT_Contact"), None))
    parity(TQ.ownershipChanges(rel, None, None), S.ownershipChanges())
  }
  test("sql parity: relationshipChangeStats") {
    val (_, _, rel) = scd
    parity(TQ.relationshipChangeStats(rel), S.relationshipChangeStats)
  }
  test("sql parity: compareVersions") {
    val (cur, hist, _) = scd
    parity(TQ.compareVersions(cur, hist, fields), S.compareVersions(fields))
  }
  test("sql parity: entityLifecycle") {
    val (cur, hist, _) = scd
    parity(TQ.entityLifecycle(cur, hist), S.entityLifecycle)
  }
  test("sql parity: temporalStatistics") {
    val (cur, hist, _) = scd
    // two entity tables: contacts (real history) + an empty-history twin
    val cur2 = cur.limit(1)
    val hist2 = hist.limit(0)
    cur.createOrReplaceTempView("contacts_scd_current")
    hist.createOrReplaceTempView("contacts_scd_history")
    cur2.createOrReplaceTempView("deals_scd_current")
    hist2.createOrReplaceTempView("deals_scd_history")
    parity(TQ.temporalStatistics(Map(
        "contacts_scd" -> (cur, hist), "deals_scd" -> (cur2, hist2))),
      S.temporalStatistics(Seq("contacts_scd", "deals_scd")))
  }

  test("sqlLit: breakout needles stay inert literals (backslash, quote, comment)") {
    g // force fixture build + view registration
    // trailing backslash — quote-doubling alone would emit 'x\' whose \'
    // escapes the closing quote and the literal never terminates (the
    // round-12 advice's breakout): must parse and match nothing
    assert(spark.sql(S.findOwner("x\\")).count() == 0)
    // quote-led OR-injection attempts: data, not predicate — if any of
    // these escaped the literal they would either throw a parse error or
    // match every row
    assert(spark.sql(S.findOwner("' OR '1'='1")).count() == 0)
    assert(spark.sql(S.findOwner("\\' OR 1=1 -- ")).count() == 0)
    val all = spark.sql(S.findOwner("")).count() // empty needle = match all
    assert(all > 0)
    assert(spark.sql(S.findOwner("') OR ('1'='1")).count() < all)
    // a legitimate apostrophe needle parses and matches literally
    assert(spark.sql(S.findOwner("O'Brien")).count() == 0)
  }

  test("the front door covers the full reference surface: 13 + 8 + 11") {
    // one parity test per reference query function; this test documents
    // the count so a future drop is loud
    val reporting = 13
    val ownership = 8
    val temporal = 11
    assert(reporting + ownership + temporal == 32)
  }
}
