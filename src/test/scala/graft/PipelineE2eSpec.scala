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
    val histPath = new org.apache.hadoop.fs.Path(s"$state/history_contacts")
    val fs = histPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val histRows =
      if (fs.exists(histPath)) spark.read.parquet(s"$state/history_contacts").count() else 0L
    assert(histRows == 0L, "idempotent reload must not write history")
    // soft-delete flags untouched on reload
    import org.apache.spark.sql.functions.col
    assert(cur2.filter(col("is_deleted")).count() == 0)
  }
}
