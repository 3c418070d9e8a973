package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning evidence harness (the RUNTIME analog of
  * PartitionScale's static pruning wave): the fact table is
  * date-partitioned `events` and the query joins it to a small dim of
  * dates carrying a campaign flag — the fact side has NO static
  * predicate on the partition column, so only Spark's DPP (the dim
  * filter's values injected into the fact scan's partition filters at
  * runtime, via the broadcast exchange) can prune. The harness runs
  * the identical query with DPP ON and OFF and reports each scan's
  * own numFiles/filesSize — ON must read the 3 campaign days'
  * partitions, OFF scans all of them — plus row parity. At 100 TB
  * "join to a filtered calendar dim" is THE shape of warehouse fact
  * queries; DPP is what keeps them from full scans without hand-
  * written date predicates.
  *
  * Prints ONE JSON line. Args: sfDir. Run at sf0.1 and /tmp/sf1.
  */
object DppScale {

  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      allScans(q.plan)
    case other => other.children.flatMap(allScans)
  }

  private def run(name: String, df: DataFrame): String = {
    val t0 = System.nanoTime()
    val row = df.collect()(0)
    val wall = (System.nanoTime() - t0) / 1e9
    val scans = allScans(df.queryExecution.executedPlan)
    val files = scans.map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    val bytes = scans.map(_.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum
    f""""$name": {"wall_sec": $wall%.3f, "rows": ${row.getLong(0)}, "users": ${row.getLong(1)}, "num_files": $files, "files_bytes": $bytes}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val factDir = s"$base/events"; val dimDir = s"$base/dim_date"

    val ev = graft.catalog.Q.t(spark, sfDir, "events")
    ev.withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").parquet(factDir)

    // calendar dim: every date, 3 of them flagged as campaign days.
    // NOTE the flag is a STRING equality, not a bare boolean column:
    // Spark's PartitionPruning rule only injects DPP when the dim
    // filter isLikelySelective — a comparison/IN/LIKE — and a naked
    // boolean attribute (`filter(col("is_campaign"))`) is NOT on that
    // list, so the boolean-flag formulation silently scans everything.
    ev.select(to_date(col("ts")).as("event_date")).distinct()
      .withColumn("day_kind",
        when(dayofmonth(col("event_date")).isin(5, 15, 25), lit("campaign"))
          .otherwise(lit("normal")))
      .coalesce(1).write.parquet(dimDir)

    def query(): DataFrame =
      spark.read.parquet(factDir)
        .join(spark.read.parquet(dimDir)
          .filter(col("day_kind") === "campaign"), Seq("event_date"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"))

    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    val off = run("dpp_off", query())
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    val on = run("dpp_on", query())

    println(s"""{"metric": "dynamic_partition_pruning", "sf_dir": "$sfDir", $off, $on}""")
    spark.stop()
  }
}
