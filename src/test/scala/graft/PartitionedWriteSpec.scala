package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Date-partitioned event layout (SCALE.md §3 knob: "event tables should
  * be written date-partitioned ... in a real deployment"): prove the
  * write shape AND that a date predicate prunes partitions at planning
  * time — the scan must touch only the matching directory. */
class PartitionedWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("events written partitionBy(event_date) prune on a date predicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val ev = graft.catalog.Q.t(spark, "/root/testdata/sf0.001", "events")
      .withColumn("event_date", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("event_date").parquet(s"$dir/events")

    val back = spark.read.parquet(s"$dir/events")
    val day = back.select(max("event_date")).collect()(0).getDate(0)
    val pruned = back.filter(col("event_date") === lit(day))

    // row parity with the unpartitioned filter
    val want = ev.filter(col("event_date") === lit(day)).count()
    assert(pruned.count() == want && want > 0)

    // the physical scan carries the partition filter and reads only the
    // matching partition's files
    val scans = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty))
    val totalDays = back.select(countDistinct("event_date")).collect()(0).getLong(0)
    assert(totalDays > 1) // pruning is meaningful
    assert(scans.map(_.relation.location.listFiles(scans.head.partitionFilters, Nil)
      .map(_.files.length).sum).sum < ev.count())
  }

  test("Pipeline writes event node tables date-partitioned; ts-range prunes") {
    // Round-9 verdict #7: the PRODUCT write path (not just an ad-hoc
    // write) must exercise planning-time partition pruning. Pipeline.run
    // lands the immutable event node tables (opens / clicks / form
    // submissions) under events_* with partitionBy(event_date); the
    // fixture's two form submissions fall on different days, so a
    // one-day predicate must select strictly fewer partitions than the
    // table holds — and a reload must append nothing (idempotence).
    val raw = java.nio.file.Files.createTempDirectory("graft-rawpw").toString
    val state = java.nio.file.Files.createTempDirectory("graft-statepw").toString
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

    val forms = spark.read.parquet(s"$state/events_form_submissions")
    val days = forms.select(countDistinct("event_date")).collect()(0).getLong(0)
    assert(days > 1, "fixture must span multiple event dates")
    // directory layout IS the partitioning
    val root = new java.io.File(s"$state/events_form_submissions")
    assert(root.listFiles().exists(_.getName.startsWith("event_date=")))

    val day = forms.select(max("event_date")).collect()(0).getDate(0)
    val pruned = forms.filter(col("event_date") === lit(day))
    val scans = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty))
    val selected = scans.map(_.relation.location
      .listFiles(scans.head.partitionFilters, Nil).length).sum
    val total = scans.map(_.relation.location.listFiles(Nil, Nil).length).sum
    assert(selected < total,
      s"date predicate selected $selected of $total partitions - no pruning")
    assert(pruned.count() > 0)

    // a ts-range predicate on the timestamp column prunes too when
    // rewritten onto the partition column - the report-side discipline
    val ranged = forms.filter(col("event_date") >= lit(day))
    val rs = ranged.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    assert(rs.forall(_.partitionFilters.nonEmpty))

    // idempotent reload: same snapshot appends zero event rows
    val before = forms.count()
    Pipeline.run(spark, raw, state)
    assert(spark.read.parquet(s"$state/events_form_submissions").count() == before,
      "reload of the same snapshot must not append event rows")
  }
}
