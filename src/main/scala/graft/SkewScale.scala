package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AQE skew-join evidence on a planted-skew corpus (round-10 verdict
  * #8's ranked list): every catalog join is engineered key-uniform, so
  * the repo had no MEASUREMENT of what AQE's skew-join split buys when
  * a hot key appears — the single most common production failure mode
  * of a 100 TB shuffle join. This main plants the failure: 30% of
  * lineitem rows remap their order FK onto ONE hot key, then the
  * fact-dim sort-merge join (broadcast disabled — the dim side is
  * deliberately too big for the demo to cheat) runs twice in one
  * session, `spark.sql.adaptive.skewJoin.enabled` false then true.
  *
  * Skew thresholds are set to sandbox scale (8 MB advisory/threshold,
  * factor 2 — the RuntimeFilterSpec convention: the MECHANISM is what
  * is being proven; production keeps the 256 MB defaults and the same
  * plan kicks in at 256 MB-sized hot partitions).
  *
  * Evidence captured per mode: wall seconds, the MAX single task
  * duration in the run (the straggler the skew split exists to kill,
  * via listener), and whether the final plan carries the
  * `skew=true` SMJ marker. Run at sf0.1 and /tmp/sf1; SCALE.md §2g
  * records the table.
  *
  * Usage: runMain graft.SkewScale <sfDir>
  */
object SkewScale {

  private final class MaxTaskListener extends SparkListener {
    val maxMs = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val d = t.taskInfo.duration
      var cur = maxMs.get()
      while (d > cur && !maxMs.compareAndSet(cur, d)) cur = maxMs.get()
    }
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
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Planted skew: ~60% of fact rows share one hot FK; the rest stay
    // unique-ish. The dim side keeps one row per key (a real FK join —
    // output rows = fact rows, so the only thing that changes between
    // modes is WHERE the hot partition's work runs).
    val hot = 7L
    def fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
      .withColumn("fk",
        when(col("l_orderkey") % 10 < 6, lit(hot)).otherwise(col("l_orderkey")))
    def dim = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))

    def query: DataFrame = fact.join(dim, col("fk") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))

    def run(skewOn: Boolean): (Double, Long, Boolean, Long) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      val listener = new MaxTaskListener
      spark.sparkContext.addSparkListener(listener)
      val df = query
      val t0 = System.nanoTime()
      val n = df.collect()(0).getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      val skewMarker = df.queryExecution.executedPlan.toString.contains("skew=true")
      (wall, listener.maxMs.get(), skewMarker, n)
    }

    query.collect() // warm: parquet footers, codegen, page cache
    val (wOff, mOff, sOff, nOff) = run(skewOn = false)
    val (wOn, mOn, sOn, nOn) = run(skewOn = true)
    require(nOff == nOn, s"row count must not depend on the plan: $nOff vs $nOn")
    println(
      f"""{"metric": "skew_join", "sf_dir": "$sfDir", "rows_joined": $nOff, """ +
      f""""off": {"wall_sec": $wOff%.2f, "max_task_ms": $mOff, "skew_marker": $sOff}, """ +
      f""""on": {"wall_sec": $wOn%.2f, "max_task_ms": $mOn, "skew_marker": $sOn}}""")
    spark.stop()
  }
}
