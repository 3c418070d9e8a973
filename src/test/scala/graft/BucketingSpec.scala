package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The bucketed-join path SCALE.md claims for the 100 TB SCD merge:
  * current and incoming snapshots written bucketed+sorted on the merge key
  * join WITHOUT any Exchange in the plan — the shuffle disappears because
  * both sides already share the required hash partitioning. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of two tables bucketed on the key plans no Exchange") {
    // (warehouse.dir is a static conf; managed tables land in
    // ./spark-warehouse and are deleted by the DROP TABLEs below)
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

    val o = graft.catalog.Q.t(spark, "/root/testdata/sf0.001", "orders")
    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("cur_orders")
    o.withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("inc_orders")

    val joined = spark.table("cur_orders").groupBy("o_custkey").count()
      .join(spark.table("inc_orders").groupBy("o_custkey").count()
        .withColumnRenamed("count", "count2"), Seq("o_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle, got plan:\n$plan")
    assert(joined.count() > 0)

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS cur_orders")
    spark.sql("DROP TABLE IF EXISTS inc_orders")
  }

  test("as-of join over tables bucketed on the key plans no Exchange") {
    // The custom AsOfJoinExec declares the same ClusteredDistribution as
    // SortMergeJoin, so pre-bucketed event/quote tables must satisfy it
    // without any shuffle — the layout a 100 TB as-of deployment uses.
    // (The within-bucket Sort may remain; only the Exchange must go.)
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val ev = graft.catalog.Q.t(spark, "/root/testdata/sf0.001", "events")
    ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
      .write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id", "ts")
      .saveAsTable("asof_purchases")
    ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
      .write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id", "ts")
      .saveAsTable("asof_clicks")

    val joined = graft.plans.AsOf.join(
      spark.table("asof_purchases"), spark.table("asof_clicks"), "user_id", "ts")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec expected, got plan:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed as-of join must not shuffle, got plan:\n$plan")
    assert(joined.count() > 0)

    spark.sql("DROP TABLE IF EXISTS asof_purchases")
    spark.sql("DROP TABLE IF EXISTS asof_clicks")
  }
}
