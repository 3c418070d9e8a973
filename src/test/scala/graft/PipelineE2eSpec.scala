package graft

import org.scalatest.funsuite.AnyFunSuite

/** Full batch pipeline end-to-end (the reference's main.py path): raw CRM
  * JSON -> transforms -> edge build/validation -> SCD state load ->
  * verification counts. The reference's #1 invariant is idempotence
  * (docs/TESTING_QUICK_REFERENCE.md:17-35): a second run over the same
  * snapshot must leave current state unchanged and write NO history. */
class PipelineE2eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("two runs over the same raw snapshot: stable current, empty history") {
    val raw = java.nio.file.Files.createTempDirectory("graft-raw").toString
    val state = java.nio.file.Files.createTempDirectory("graft-state").toString
    Seq(
      "users" -> CrmFixture.usersRaw(spark),
      "contacts" -> CrmFixture.contactsRaw(spark),
      "companies" -> CrmFixture.companiesRaw(spark),
      "deals" -> CrmFixture.dealsRaw(spark),
      "engagements" -> CrmFixture.engagementsRaw(spark),
      "email_events" -> CrmFixture.emailEventsRaw(spark),
      "form_submissions" -> CrmFixture.formsRaw(spark)
    ).foreach { case (n, df) => df.write.mode("overwrite").json(s"$raw/$n.json") }

    Pipeline.run(spark, raw, state)
    val cur1 = spark.read.parquet(s"$state/current_contacts")
    assert(cur1.count() == 3)
    assert(spark.read.parquet(s"$state/edges").count() > 0)

    Pipeline.run(spark, raw, state) // identical snapshot again
    val cur2 = spark.read.parquet(s"$state/current_contacts")
    assert(cur2.count() == 3)
    val histRows =
      Pipeline.historyTable(spark, state, "contacts").map(_.count()).getOrElse(0L)
    assert(histRows == 0L, "idempotent reload must not write history")
    // soft-delete flags untouched on reload
    import org.apache.spark.sql.functions.col
    assert(cur2.filter(col("is_deleted")).count() == 0)
  }

  test("relationship CDC: removed association yields one change row, reload zero") {
    import org.apache.spark.sql.functions.col
    val raw = java.nio.file.Files.createTempDirectory("graft-raw4a").toString
    val raw2 = java.nio.file.Files.createTempDirectory("graft-raw4b").toString
    val state = java.nio.file.Files.createTempDirectory("graft-state4").toString
    def fixtures(deals: org.apache.spark.sql.DataFrame) = Seq(
      "users" -> CrmFixture.usersRaw(spark),
      "contacts" -> CrmFixture.contactsRaw(spark),
      "companies" -> CrmFixture.companiesRaw(spark),
      "deals" -> deals,
      "engagements" -> CrmFixture.engagementsRaw(spark),
      "email_events" -> CrmFixture.emailEventsRaw(spark),
      "form_submissions" -> CrmFixture.formsRaw(spark))
    fixtures(CrmFixture.dealsRaw(spark))
      .foreach { case (n, df) => df.write.mode("overwrite").json(s"$raw/$n.json") }
    fixtures(CrmFixture.dealsRawV2(spark)) // d1 lost its co1 association
      .foreach { case (n, df) => df.write.mode("overwrite").json(s"$raw2/$n.json") }

    Pipeline.run(spark, raw, state)
    assert(Pipeline.relChanges(spark, state).isEmpty,
      "first load has no previous edge set to diff")
    val edges1 = spark.read.parquet(s"$state/edges").count()

    Pipeline.run(spark, raw2, state)
    val ch = Pipeline.relChanges(spark, state).getOrElse(fail("no relchanges"))
    val rows = ch.collect()
    assert(rows.length == 1, s"expected exactly one change row, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[String]("change_type") == "removed")
    assert(r.getAs[String]("relationship_type") == "BELONGS_TO")
    assert(r.getAs[String]("from_entity_id") == "d1")
    assert(r.getAs[String]("to_entity_id") == "co1")
    val edges2 = spark.read.parquet(s"$state/edges")
    assert(edges2.filter(col("rel_type") === "BELONGS_TO" &&
      col("src_id") === "d1").count() == 0, "removed edge must leave current set")
    assert(edges2.count() == edges1 - 1,
      "one edge removed, immutable events MERGEd not duplicated")

    Pipeline.run(spark, raw2, state) // identical snapshot: CDC idempotence
    assert(Pipeline.relChanges(spark, state).get.count() == 1,
      "idempotent reload must append zero relationship changes")
    assert(spark.read.parquet(s"$state/edges").count() == edges1 - 1)
  }

  test("SCD merge over reloaded bucketed state plans with no Exchange") {
    val raw = java.nio.file.Files.createTempDirectory("graft-raw3").toString
    val state = java.nio.file.Files.createTempDirectory("graft-state3").toString
    Seq(
      "users" -> CrmFixture.usersRaw(spark),
      "contacts" -> CrmFixture.contactsRaw(spark),
      "companies" -> CrmFixture.companiesRaw(spark),
      "deals" -> CrmFixture.dealsRaw(spark),
      "engagements" -> CrmFixture.engagementsRaw(spark),
      "email_events" -> CrmFixture.emailEventsRaw(spark),
      "form_submissions" -> CrmFixture.formsRaw(spark)
    ).foreach { case (n, df) => df.write.mode("overwrite").json(s"$raw/$n.json") }
    Pipeline.run(spark, raw, state)

    // Rebuild the production merge exactly as Pipeline.run plans it on the
    // NEXT load: bucketed current table vs bucketed staged snapshot. The
    // single-join applyScd must read both sides bucket-for-bucket — zero
    // Exchange anywhere in the new-current plan.
    val ns = Pipeline.stateTableNs(state)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1") // deterministic SMJ, as at scale
      val cur = spark.table(s"${ns}_current_contacts")
      val staged = spark.table(s"${ns}_stage_contacts")
      val r = graft.temporal.ScdLoader.applyScd(cur, staged,
        org.apache.spark.sql.functions.lit(new java.sql.Timestamp(0L)))
      val plan = r.current.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed SCD merge must not shuffle, got plan:\n$plan")
      assert(r.current.count() == 3)
    } finally spark.conf.set(key, prev)
  }

  test("corrupt current state fails loudly instead of resetting to first-load") {
    val raw = java.nio.file.Files.createTempDirectory("graft-raw2").toString
    val state = java.nio.file.Files.createTempDirectory("graft-state2").toString
    Seq(
      "users" -> CrmFixture.usersRaw(spark),
      "contacts" -> CrmFixture.contactsRaw(spark),
      "companies" -> CrmFixture.companiesRaw(spark),
      "deals" -> CrmFixture.dealsRaw(spark),
      "engagements" -> CrmFixture.engagementsRaw(spark),
      "email_events" -> CrmFixture.emailEventsRaw(spark),
      "form_submissions" -> CrmFixture.formsRaw(spark)
    ).foreach { case (n, df) => df.write.mode("overwrite").json(s"$raw/$n.json") }
    Pipeline.run(spark, raw, state)

    // Corrupt every current_* parquet footer. A rerun must throw (not
    // silently treat the table as a first load) and must leave the state
    // directory exactly as it found it — no history rows appended.
    val stateDir = new java.io.File(state)
    val curDirs = stateDir.listFiles().filter(_.getName.startsWith("current_"))
    assert(curDirs.nonEmpty)
    for (d <- curDirs; f <- d.listFiles() if f.getName.endsWith(".parquet"))
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](16)(0x42))
    intercept[Exception] { Pipeline.run(spark, raw, state) }
    val histRows =
      Pipeline.historyTable(spark, state, "contacts").map(_.count()).getOrElse(0L)
    assert(histRows == 0L, "failed run must not append history")
    // the corrupted state is still there for an operator to inspect/restore
    assert(curDirs.forall(_.exists()))
  }
}
