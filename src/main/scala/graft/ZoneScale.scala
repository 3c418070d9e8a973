package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map pruning evidence harness (round-12 tier #3): ZoneMapSpec
  * proves file-skipping on a fixture; this main measures what the
  * sidecar buys AT SCALE, the `files-skipped` table the SCALE.md
  * evidence convention asks for. It:
  *
  *  1. writes a ts-range-clustered copy of `events` (64 files — the
  *     layout a time-ordered ingest or a `compactPartitionedPath` pass
  *     leaves behind),
  *  2. builds the `_zonemap` sidecar on `ts` in one distributed pass,
  *  3. runs a 10-day window aggregate and a 1-hour point lookup
  *     against (a) the full scan + filter and (b) the pruned file list
  *     + the same filter,
  *  4. prints ONE JSON line: wall, rows, planner-reported numFiles /
  *     filesSize per case, plus the sidecar's own selected/total —
  *     `files_selected < files_total` is the pruning evidence, row
  *     parity between the a/b cases the correctness evidence.
  *
  * Args: sfDir [clusteredCopyDir]. Run at sf0.1 and /tmp/sf1.
  */
object ZoneScale {

  private case class CaseStats(name: String, wallSec: Double, rows: Long,
      numFiles: Long, filesBytes: Long)

  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      allScans(q.plan)
    case other => other.children.flatMap(allScans)
  }

  private def run(name: String, df: DataFrame): CaseStats = {
    val t0 = System.nanoTime()
    val n = df.count()
    val wall = (System.nanoTime() - t0) / 1e9
    df.collect()
    val scans = allScans(df.queryExecution.executedPlan)
    val files = scans.map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    val bytes = scans.map(_.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum
    CaseStats(name, wall, n, files, bytes)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dataDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-zonescale")
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
    import graft.sources.ZoneMap

    graft.catalog.Q.t(spark, sfDir, "events")
      .repartitionByRange(64, col("ts"))
      .write.mode("overwrite").parquet(dataDir)
    val t0 = System.nanoTime()
    ZoneMap.build(spark, dataDir, Seq("ts"))
    val buildSec = (System.nanoTime() - t0) / 1e9

    def agg(df: DataFrame, lo: String, hi: String) = df
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))

    def pruned(lo: String, hi: String): (DataFrame, ZoneMap.Pruned) = {
      val pr = ZoneMap.prune(spark, dataDir, "ts",
        Some(lit(lo).cast("timestamp")), Some(lit(hi).cast("timestamp")))
      (agg(pr.df, lo, hi), pr)
    }

    val winLo = "2024-01-10 00:00:00"; val winHi = "2024-01-20 00:00:00"
    val ptLo = "2024-01-15 12:00:00"; val ptHi = "2024-01-15 13:00:00"

    // warm cache/codegen so full-vs-pruned measures planning+IO, not JIT
    agg(spark.read.parquet(dataDir), winLo, winHi).count()

    val (winDf, winPr) = pruned(winLo, winHi)
    val (ptDf, ptPr) = pruned(ptLo, ptHi)
    val cases = Seq(
      run("window_full", agg(spark.read.parquet(dataDir), winLo, winHi)),
      run("window_pruned", winDf),
      run("point_full", agg(spark.read.parquet(dataDir), ptLo, ptHi)),
      run("point_pruned", ptDf))

    val json = cases.map { c =>
      f"""    "${c.name}": {"wall_sec": ${c.wallSec}%.3f, "rows": ${c.rows}, "num_files": ${c.numFiles}, "files_bytes": ${c.filesBytes}}"""
    }.mkString(",\n")
    println(
      s"""{"metric": "zonemap_prune", "sf_dir": "$sfDir", "build_sec": ${f"$buildSec%.3f"},
         |  "window": {"files_total": ${winPr.filesTotal}, "files_selected": ${winPr.filesSelected}},
         |  "point": {"files_total": ${ptPr.filesTotal}, "files_selected": ${ptPr.filesSelected}},
         |  "cases": {
         |$json
         |  }}""".stripMargin.replaceAll("\n", " "))
    spark.stop()
  }
}
