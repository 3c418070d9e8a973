package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-layout co-located join evidence (the Hive-bucketing story
  * BucketingSpec pins as a plan shape, MEASURED): lineitem and orders
  * are written flat and bucketed+sorted on the join key, the same
  * join+aggregate runs on both layouts, and the harness reports per
  * layout: wall, rows, number of ShuffleExchange nodes, and the actual
  * shuffle bytes written (the exchanges' own SQL metrics). What the
  * numbers must show: the flat join shuffles BOTH full tables every
  * run; the bucketed layout pays one clustered write up front and then
  * joins with (near-)zero shuffle forever — at 100 TB the difference
  * between re-exchanging the fact table per query and never moving it.
  * Broadcast is disabled so the comparison is the SMJ regime a
  * too-big-to-broadcast join lives in. Row parity asserted.
  *
  * Prints ONE JSON line. Args: sfDir. Run at sf0.1 and /tmp/sf1.
  */
object BucketScale {

  private def exchanges(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] = p match {
    case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
      Seq(e) ++ e.children.flatMap(exchanges)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      exchanges(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      exchanges(q.plan)
    case other => other.children.flatMap(exchanges)
  }

  private def run(name: String, df: DataFrame): String = {
    val t0 = System.nanoTime()
    val row = df.collect()(0)
    val wall = (System.nanoTime() - t0) / 1e9
    val ex = exchanges(df.queryExecution.executedPlan)
    val bytes = ex.flatMap(_.metrics.get("shuffleBytesWritten").map(_.value)).sum
    val n = row.getLong(0); val qty = row.getLong(1)
    f""""$name": {"wall_sec": $wall%.3f, "rows": $n, "qty_sum": $qty, "n_exchanges": ${ex.size}, "shuffle_bytes": $bytes}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketscale")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", wh.toString)
      .config("spark.sql.sources.bucketing.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.catalog.Q.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = graft.catalog.Q.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderpriority")

    def query(l: DataFrame, o: DataFrame): DataFrame =
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))

    // flat layout: plain parquet, every join run re-shuffles both sides
    val flatDir = s"$wh/flat"
    li.write.parquet(s"$flatDir/lineitem")
    ord.write.parquet(s"$flatDir/orders")
    val flat = query(spark.read.parquet(s"$flatDir/lineitem"),
      spark.read.parquet(s"$flatDir/orders"))

    // bucketed layout: one clustered write, then co-located joins
    val tW = System.nanoTime()
    li.write.bucketBy(16, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bs_lineitem")
    ord.write.bucketBy(16, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bs_orders")
    val writeSec = (System.nanoTime() - tW) / 1e9
    val bucketed = query(spark.table("bs_lineitem"), spark.table("bs_orders"))

    val cells = Seq(run("flat", flat), run("bucketed", bucketed))
    println(s"""{"metric": "bucketed_join", "sf_dir": "$sfDir", "bucketed_write_sec": ${f"$writeSec%.3f"}, ${cells.mkString(", ")}}""")
    spark.sql("DROP TABLE IF EXISTS bs_lineitem")
    spark.sql("DROP TABLE IF EXISTS bs_orders")
    spark.stop()
  }
}
