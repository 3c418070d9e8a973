package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** The Report CLI's temporal flag surface (reference
  * query_temporal.py:328-420) driven end-to-end over a real Pipeline state
  * directory, plus the non-interactive owner disambiguation contract
  * (reference report.py:39-87 prompts; we list candidates + exit 2).
  *
  * One two-load SCD scenario is shared by every flag: load the full
  * fixture, then a second snapshot where c1 changed (CTO -> CEO), c2 is
  * unchanged and c3 is missing (-> soft delete).
  */
class TemporalCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dirs: (String, String) = {
    val raw = java.nio.file.Files.createTempDirectory("graft-tcli-raw").toString
    val state = java.nio.file.Files.createTempDirectory("graft-tcli-state").toString
    def writeRaw(contacts: org.apache.spark.sql.DataFrame): Unit = Seq(
      "users" -> CrmFixture.usersRaw(spark),
      "contacts" -> contacts,
      "companies" -> CrmFixture.companiesRaw(spark),
      "deals" -> CrmFixture.dealsRaw(spark),
      "engagements" -> CrmFixture.engagementsRaw(spark),
      "email_events" -> CrmFixture.emailEventsRaw(spark),
      "form_submissions" -> CrmFixture.formsRaw(spark)
    ).foreach { case (n, df) => df.write.mode("overwrite").json(s"$raw/$n.json") }
    writeRaw(CrmFixture.contactsRaw(spark))
    Pipeline.run(spark, raw, state)
    writeRaw(CrmFixture.contactsRawV2(spark))
    Pipeline.run(spark, raw, state)
    (raw, state)
  }

  private def runToCsv(flags: String*): org.apache.spark.sql.DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-tcli-out").toString
    val code = Report.run(spark,
      (dirs._2 +: flags).toArray ++ Array("--format", "csv", "--out", s"$out/r"))
    assert(code == 0)
    spark.read.option("header", "true").csv(s"$out/r")
  }

  test("--history ID returns the full version chain, newest first") {
    val h = runToCsv("--history", "c1")
    assert(h.count() == 2) // current CEO row + superseded CTO row
    val titles = h.orderBy(col("valid_from").desc).collect()
      .map(_.getAs[String]("job_title")).toSeq
    assert(titles == Seq("CEO", "CTO"))
  }

  test("--deleted lists soft-deleted entities only") {
    val d = runToCsv("--deleted")
    assert(d.collect().map(_.getAs[String]("hubspot_id")).toSeq == Seq("c3"))
  }

  test("--recent-changes N returns rows loaded inside the window") {
    assert(runToCsv("--recent-changes", "24").count() == 3) // whole current table
    // other tables selectable
    assert(runToCsv("--recent-changes", "24", "--table", "users").count() == 2)
  }

  test("--compare-versions diffs business fields of current vs previous") {
    val diff = runToCsv("--compare-versions", "c1")
    val rows = diff.collect().map(r => (r.getAs[String]("field"),
      r.getAs[String]("old_value"), r.getAs[String]("new_value")))
    assert(rows.toSeq == Seq(("job_title", "CTO", "CEO")))
    // no bookkeeping column ever appears as a diffed field
    val all = runToCsv("--compare-versions")
    assert(all.filter(col("field").isin("valid_from", "valid_to", "is_current",
      "is_deleted", "snapshot_hash")).count() == 0)
  }

  test("--temporal-stats rolls up current/deleted/history per entity table") {
    val s = runToCsv("--temporal-stats")
    assert(s.count() == 5)
    val contacts = s.filter(col("entity_type") === "contacts").collect()(0)
    assert(contacts.getAs[String]("n_rows") == "3")
    assert(contacts.getAs[String]("n_deleted") == "1")
    // c1 superseded + c3 terminal snapshot
    assert(contacts.getAs[String]("n_history") == "2")
    assert(s.filter(col("entity_type") === "users")
      .collect()(0).getAs[String]("n_history") == "0")
  }

  test("--rel-history surfaces the relationship CDC log for one entity") {
    // dedicated state dir: second load drops d1's company association,
    // so the CDC log holds exactly one removed BELONGS_TO row
    val raw = java.nio.file.Files.createTempDirectory("graft-tcli-rel-raw").toString
    val state = java.nio.file.Files.createTempDirectory("graft-tcli-rel-st").toString
    def writeRaw(deals: org.apache.spark.sql.DataFrame): Unit = Seq(
      "users" -> CrmFixture.usersRaw(spark),
      "contacts" -> CrmFixture.contactsRaw(spark),
      "companies" -> CrmFixture.companiesRaw(spark),
      "deals" -> deals,
      "engagements" -> CrmFixture.engagementsRaw(spark),
      "email_events" -> CrmFixture.emailEventsRaw(spark),
      "form_submissions" -> CrmFixture.formsRaw(spark)
    ).foreach { case (n, df) => df.write.mode("overwrite").json(s"$raw/$n.json") }
    writeRaw(CrmFixture.dealsRaw(spark))
    Pipeline.run(spark, raw, state)
    writeRaw(CrmFixture.dealsRawV2(spark))
    Pipeline.run(spark, raw, state)

    val out = java.nio.file.Files.createTempDirectory("graft-tcli-rel-out").toString
    assert(Report.run(spark, Array(state, "--rel-history", "HUBSPOT_Deal:d1",
      "--format", "csv", "--out", s"$out/r")) == 0)
    val rows = spark.read.option("header", "true").csv(s"$out/r").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("change_type") == "removed")
    assert(rows(0).getAs[String]("relationship_type") == "BELONGS_TO")
    assert(rows(0).getAs[String]("to_entity_id") == "co1")
    // no ownership edges changed in this scenario
    assert(graft.query.TemporalQueries.ownershipChanges(
      Pipeline.relChanges(spark, state).get).count() == 0)
    // the CLI path for --ownership-changes runs clean on the same log
    assert(Report.run(spark, Array(state, "--ownership-changes",
      "--format", "csv", "--out", s"$out/oc")) == 0)
    // --rel-changes pages newest-first with a limit
    assert(Report.run(spark, Array(state, "--rel-changes", "10",
      "--format", "csv", "--out", s"$out/rc")) == 0)
    val rc = spark.read.option("header", "true").csv(s"$out/rc").collect()
    assert(rc.length == 1 && rc(0).getAs[String]("change_type") == "removed")
  }

  test("graph flags answer the Cypher-shaped questions over edge state") {
    // --graph-rank: a probability ranking over the entity graph
    val rank = runToCsv("--graph-rank")
    assert(rank.count() > 0)
    val ranks = rank.collect().map(_.getAs[String]("rank").toDouble)
    assert(math.abs(ranks.sum - 1.0) < 1e-3) // 6dp-rounded mass sums to ~1
    assert(ranks.sorted.reverse.toSeq == ranks.toSeq) // highest first
    // --graph-rank --from: personalized to c1 — mass still sums to ~1
    // and the unreachable-from-c1 part of the graph ranks 0
    val ppr = runToCsv("--graph-rank", "--from", "HUBSPOT_Contact:c1")
    val pprRanks = ppr.collect().map(r =>
      (r.getAs[String]("entity_type"), r.getAs[String]("entity_id"))
        -> r.getAs[String]("rank").toDouble).toMap
    assert(math.abs(pprRanks.values.sum - 1.0) < 1e-3)
    assert(pprRanks(("HUBSPOT_Contact", "c1")) > 0.0)
    // --graph-communities: u1 owns c1, c1 works at co1 -> same community
    val com = runToCsv("--graph-communities")
    def communityOf(t: String, id: String): String = com
      .filter(col("entity_type") === t && col("entity_id") === id)
      .collect()(0).getAs[String]("community_id")
    assert(communityOf("HUBSPOT_Contact", "c1") == communityOf("HUBSPOT_Company", "co1"))
    // --graph-neighbors: c1's 1-hop ring contains its company, not itself
    // at distance > 0; hop column within the bound
    val nb = runToCsv("--graph-neighbors", "HUBSPOT_Contact:c1", "--hops", "2")
    val byId = nb.collect()
      .map(r => (r.getAs[String]("entity_type"), r.getAs[String]("entity_id"))
        -> r.getAs[String]("hops").toInt).toMap
    assert(byId(("HUBSPOT_Contact", "c1")) == 0)
    assert(byId(("HUBSPOT_Company", "co1")) == 1)
    assert(byId.values.forall(_ <= 2))
    // rel-type scoping restricts the graph: a WORKS_AT-only graph has
    // exactly contact and company nodes
    val scoped = runToCsv("--graph-communities", "WORKS_AT")
    val types = scoped.collect().map(_.getAs[String]("entity_type")).toSet
    assert(types == Set("HUBSPOT_Contact", "HUBSPOT_Company"))
    // --graph-shortest FROM TO: c1 and its company are directly related,
    // so the narrowed answer is one row at inverse-volume distance <= 1
    val sp = runToCsv("--graph-shortest", "HUBSPOT_Contact:c1",
      "HUBSPOT_Company:co1")
    val spRows = sp.collect()
    assert(spRows.length == 1)
    assert(spRows(0).getAs[String]("entity_id") == "co1")
    val dCo = spRows(0).getAs[String]("distance").toDouble
    assert(dCo > 0.0 && dCo <= 1.0)
    // unnarrowed: source at distance 0, co1 at the same distance as above
    val spAll = runToCsv("--graph-shortest", "HUBSPOT_Contact:c1")
    val spMap = spAll.collect().map(r => (r.getAs[String]("entity_type"),
      r.getAs[String]("entity_id")) -> r.getAs[String]("distance").toDouble).toMap
    assert(spMap(("HUBSPOT_Contact", "c1")) == 0.0)
    assert(spMap(("HUBSPOT_Company", "co1")) == dCo)
    // --graph-triangles: deal d1 closes a triangle with its contact c1
    // and company co1, so all three report cohesion >= 1
    val tri = runToCsv("--graph-triangles")
    val triMap = tri.collect().map(r => (r.getAs[String]("entity_type"),
      r.getAs[String]("entity_id")) -> r.getAs[String]("n_triangles").toLong).toMap
    assert(Seq(("HUBSPOT_Contact", "c1"), ("HUBSPOT_Deal", "d1"),
      ("HUBSPOT_Company", "co1")).forall(k => triMap.getOrElse(k, 0L) >= 1L))
  }

  test("--graph-suggest ranks non-adjacent entity pairs by shared neighbors") {
    // Adamic-Adar link prediction over the pipeline edge state (the
    // Cypher `MATCH (a)--(n)--(b) WHERE NOT (a)--(b)` recommendation).
    val all = runToCsv("--graph-suggest")
    assert(all.count() > 0)
    val scores = all.collect().map(_.getAs[String]("adamic_adar").toDouble)
    assert(scores.sorted.reverse.toSeq == scores.toSeq) // best first
    // narrowed to c2: its only neighbors are user_2 (OWNED_BY) and the
    // shared deal d1 (ASSOCIATED_WITH)
    val forC2 = runToCsv("--graph-suggest", "HUBSPOT_Contact:c2").collect()
      .map(r => Set((r.getAs[String]("a_type"), r.getAs[String]("a_id")),
        (r.getAs[String]("b_type"), r.getAs[String]("b_id"))))
    assert(forC2.nonEmpty)
    // every suggested pair involves the selected entity
    assert(forC2.forall(_.contains(("HUBSPOT_Contact", "c2"))))
    // c1 shares deal d1 with c2 but has no direct edge -> suggested
    assert(forC2.exists(_.contains(("HUBSPOT_Contact", "c1"))))
    // pairs that ARE edges never appear: c2 is directly related to d1
    assert(!forC2.exists(_.contains(("HUBSPOT_Deal", "d1"))))
  }

  test("--owner with an ambiguous needle lists candidates and exits 2") {
    // 'example' hits both fixture users via email
    val code = Report.run(spark, Array(dirs._1, "--owner", "example"))
    assert(code == Report.ExitAmbiguousOwner)
    // a unique needle still runs the report and exits 0
    val out = java.nio.file.Files.createTempDirectory("graft-tcli-own").toString
    val ok = Report.run(spark, Array(dirs._1, "--owner", "Doe",
      "--entity", "contacts", "--format", "csv", "--out", s"$out/r"))
    assert(ok == 0)
    assert(spark.read.option("header", "true").csv(s"$out/r").count() == 1)
  }

  test("--owner --pick N resolves an ambiguous needle to the Nth candidate") {
    // 'example' is ambiguous (both fixture users); pick 1 = user_1
    // (candidates are ordered by hubspot_id, as --find-owner prints
    // them), so the run proceeds exactly as an unambiguous John run
    val out = java.nio.file.Files.createTempDirectory("graft-tcli-pick").toString
    val code = Report.run(spark, Array(dirs._1, "--owner", "example",
      "--pick", "1", "--entity", "contacts",
      "--format", "csv", "--out", s"$out/r"))
    assert(code == 0)
    val rows = spark.read.option("header", "true").csv(s"$out/r").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("owner_email") == "john.doe@example.com")
    // a pick beyond the candidate list is an explicit error, not a
    // silent empty report
    val bad = intercept[RuntimeException] {
      Report.run(spark, Array(dirs._1, "--owner", "example",
        "--pick", "9", "--entity", "contacts",
        "--format", "csv", "--out", s"$out/r2"))
    }
    assert(bad.getMessage.contains("out of range"))
  }
}
