package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning evidence harness — the
  * UNPARTITIONED complement of [[DppScale]]: when the selective dim
  * predicate sits on a key the fact layout knows nothing about (no
  * partitions to prune, no zone-map locality), the only way to avoid
  * shuffling the whole fact side into the join is Spark's
  * InjectRuntimeFilter — the creation side's keys become a Bloom
  * filter applied as `bloom_filter_might_contain` ABOVE the fact scan,
  * so non-joining rows die before the exchange instead of after it.
  *
  * The harness runs `lineitem JOIN part WHERE p_size = 1` (shuffle
  * join forced — broadcast would hide the effect the filter exists
  * for) with the filter ON and OFF and reports per-run shuffle
  * records/bytes written plus row parity: ON must shuffle roughly the
  * join's selectivity, OFF shuffles all of lineitem. Thresholds are
  * lowered to sandbox scale (the app-side scan is MBs, not the 10 GB
  * default) — production keeps the defaults and triggers on real
  * sizes. At 100 TB this is the difference between exchanging 100 TB
  * and exchanging the 2% that survives the dim predicate.
  *
  * Prints ONE JSON line. Args: sfDir. Run at sf0.1 and /tmp/sf1.
  */
object BloomScale {

  private def shuffles(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] =
    p match {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        s +: s.children.flatMap(shuffles)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        shuffles(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        shuffles(q.plan)
      case other => other.children.flatMap(shuffles)
    }

  private def run(name: String, df: DataFrame): String = {
    val t0 = System.nanoTime()
    val row = df.collect()(0)
    val wall = (System.nanoTime() - t0) / 1e9
    val ex = shuffles(df.queryExecution.executedPlan)
    def m(k: String) = ex.flatMap(_.metrics.get(k).map(_.value)).sum
    val recs = m("shuffleRecordsWritten")
    val bytes = m("shuffleBytesWritten")
    val bloomed = df.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("bloom")
    f""""$name": {"wall_sec": $wall%.3f, "rows": ${row.getLong(0)}, "qty_e2": ${row.getLong(1)}, "shuffle_records": $recs, "shuffle_bytes": $bytes, "bloom_injected": $bloomed}"""
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
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.optimizer.runtime.bloomFilter" +
        ".applicationSideScanSizeThreshold", "1")
      .config("spark.sql.optimizer.runtime.bloomFilter" +
        ".creationSideThreshold", "100MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def query(): DataFrame =
      graft.catalog.Q.t(spark, sfDir, "lineitem")
        .select("l_partkey", "l_quantity")
        .join(graft.catalog.Q.t(spark, sfDir, "part")
            .filter(col("p_size") === 1).select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)"))
            .as("qty_e2"))

    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val off = run("bloom_off", query())
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    val on = run("bloom_on", query())

    println(s"""{"metric": "runtime_bloom_filter", "sf_dir": "$sfDir", $off, $on}""")
    spark.stop()
  }
}
