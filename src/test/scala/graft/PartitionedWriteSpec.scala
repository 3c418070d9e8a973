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
}
