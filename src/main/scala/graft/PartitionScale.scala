package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruning evidence harness (round-10 verdict #5): the
  * `Pipeline` event sink writes `partitionBy(event_date)` and
  * PartitionedWriteSpec proves pruning on a fixture, but the bench
  * queries all read the driver's FLAT events.parquet — so until this
  * harness there was no at-scale measurement of what the partitioned
  * layout actually buys. This main:
  *
  *  1. writes a date-partitioned copy of `events` (the exact
  *     `Pipeline.run` layout: `event_date = to_date(ts)`),
  *  2. runs the `p7_time_range` aggregation and the `w5_sessionize`
  *     gaps-and-islands query over a 10-of-30-day window against BOTH
  *     layouts (the partitioned reads carry the `event_date` range
  *     predicate next to the `ts` one — the standard discipline: the
  *     partition column predicate is what the planner can prune on),
  *  3. prints ONE JSON line with, per case, the wall time and the
  *     file-scan totals Spark's own scan node reports (numFiles /
  *     filesSize — post-pruning, so partitioned-vs-flat is directly
  *     `selectedPartitions < total` evidence).
  *
  * Args: sfDir [partitionedCopyDir]. Run at sf0.1 and /tmp/sf1 for the
  * SCALE.md table.
  */
object PartitionScale {

  private case class CaseStats(name: String, wallSec: Double, rows: Long,
      numFiles: Long, filesBytes: Long)

  /** All v1 file scans under `p`, recursing through AQE's stage
    * boundaries (QueryStageExec exposes no children to `collect`). */
  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      allScans(q.plan)
    case other => other.children.flatMap(allScans)
  }

  /** Execute `df` fully and read the file-scan totals off its own
    * executed plan (AQE-final), summed across scan nodes. */
  private def run(name: String, df: DataFrame): CaseStats = {
    val t0 = System.nanoTime()
    val n = df.count()
    val wall = (System.nanoTime() - t0) / 1e9
    // count() wraps df in an aggregate but shares the cached plan only
    // if we re-derive it; execute the frame itself for scan metrics.
    val t1 = System.nanoTime()
    val local = df.collect().length
    val wallCollect = (System.nanoTime() - t1) / 1e9
    val scans = allScans(df.queryExecution.executedPlan)
    val files = scans.map(s => s.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    val bytes = scans.map(s => s.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum
    CaseStats(name, math.min(wall, wallCollect), math.max(n, local.toLong), files, bytes)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val partDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-events-part")
        .toString + "/events"
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

    // 1. the Pipeline layout: one directory per event_date
    val ev = graft.catalog.Q.t(spark, sfDir, "events")
    ev.withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(partDir)
    val totalPartitions = spark.read.parquet(partDir)
      .select("event_date").distinct().count()

    val lo = "2024-01-10 00:00:00"
    val hi = "2024-01-20 00:00:00"
    def tsRange(df: DataFrame) =
      df.filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
    def datedRange(df: DataFrame) = // partition predicate alongside ts
      tsRange(df).filter(col("event_date") >= lit("2024-01-10") &&
        col("event_date") < lit("2024-01-20"))

    def p7(df: DataFrame) = df
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
    def w5(df: DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      df.select(col("user_id"), col("ts"))
        .withColumn("gap_us",
          expr("unix_micros(ts)") - lag(expr("unix_micros(ts)"), 1).over(w))
        .withColumn("new_sess",
          when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_no", sum("new_sess").over(w))
        .groupBy("user_id", "session_no")
        .agg(count(lit(1)).as("n_events"))
    }

    val flat = () => tsRange(graft.catalog.Q.t(spark, sfDir, "events"))
    val part = () => datedRange(spark.read.parquet(partDir))

    // warm page cache + codegen so flat-vs-partitioned is layout, not IO
    p7(flat()).count(); p7(part()).count()

    val cases = Seq(
      run("p7_flat", p7(flat())),
      run("p7_partitioned", p7(part())),
      run("w5_flat", w5(flat())),
      run("w5_partitioned", w5(part())))

    val json = cases.map { c =>
      f"""    "${c.name}": {"wall_sec": ${c.wallSec}%.3f, "rows": ${c.rows}, "num_files": ${c.numFiles}, "files_bytes": ${c.filesBytes}}"""
    }.mkString(",\n")
    val selected = spark.read.parquet(partDir)
      .filter(col("event_date") >= lit("2024-01-10") &&
        col("event_date") < lit("2024-01-20"))
      .select("event_date").distinct().count()
    println(
      s"""{"metric": "partition_prune", "sf_dir": "$sfDir",
         |  "total_partitions": $totalPartitions, "selected_partitions": $selected,
         |  "cases": {
         |$json
         |  }}""".stripMargin.replaceAll("\n", " "))
    spark.stop()
  }
}
