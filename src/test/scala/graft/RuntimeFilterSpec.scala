package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime (Bloom) filter injection — the Catalyst feature that turns a
  * selective dimension predicate into a pushed probe on the FACT scan:
  * at 100 TB the fact side of `lineitem JOIN part WHERE p_size = 1`
  * should never shuffle rows whose partkey cannot survive the join.
  * Spark injects `bloom_filter_might_contain(...)` on the application
  * side when the creation side is selective; this spec pins that the
  * engine's query shapes actually trigger it (thresholds lowered to
  * sandbox scale — production leaves the defaults) and that the
  * filtered plan is row-identical to the unfiltered one. */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private def withConfs[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim predicate injects a bloom runtime filter into the fact side") {
    def q() = graft.catalog.Q.t(spark, dir, "lineitem")
      .select("l_partkey", "l_quantity")
      .join(graft.catalog.Q.t(spark, dir, "part")
          .filter(col("p_size") === 1).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))

    val plain = q().collect()(0)
    val (filtered, plan) = withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // sandbox scale: the app-side scan is MBs, not the 10GB default
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the shuffle join shape the filter exists for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = q()
      (df.collect()(0), df.queryExecution.optimizedPlan.toString)
    }
    assert(plan.toLowerCase.contains("bloom"),
      s"no runtime bloom filter injected; optimized plan:\n$plan")
    assert(filtered.getLong(0) == plain.getLong(0) && filtered.getLong(0) > 0)
    assert(math.abs(filtered.getDouble(1) - plain.getDouble(1)) < 1e-6)
  }
}
