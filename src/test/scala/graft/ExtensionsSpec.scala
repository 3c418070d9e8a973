package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, SHUFFLE_MERGE}
import graft.plans.{GraftExtensions, SelfJoinMergeHint}

/** GraftExtensions: the SelfJoinMergeHint optimizer rule and the injected
  * function builders (SURVEY.md §7.3 mechanism (c)). The rule is applied
  * directly to optimized plans here; session-level activation is
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A miniature near-dup shape: expensive (aggregated) subtree,
    * self-joined on the group key with different aliases per side. */
  private def selfJoin = {
    val base = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("s"))
    val l = base.select(col("k"), col("s").as("s_l"))
    val r = base.select(col("k"), col("s").as("s_r"))
    l.join(r, Seq("k"))
  }

  test("rule pins both sides of an expensive self-join to SHUFFLE_MERGE") {
    val optimized = selfJoin.queryExecution.optimizedPlan
    val rewritten = SelfJoinMergeHint(optimized)
    val hints = rewritten.collect { case j: Join => j.hint }
    assert(hints.nonEmpty)
    assert(hints.forall { case JoinHint(lh, rh) =>
      lh.exists(_.strategy.contains(SHUFFLE_MERGE)) &&
        rh.exists(_.strategy.contains(SHUFFLE_MERGE))
    })
    // idempotent: a hinted join is left untouched on re-application
    assert(SelfJoinMergeHint(rewritten) == rewritten)
  }

  test("rule leaves non-self joins and cheap self-joins alone") {
    // different subtrees -> no hint
    val a = Seq(("a", 1)).toDF("k", "v").groupBy("k").agg(sum("v").as("s"))
    val b = Seq(("a", 9)).toDF("k", "w")
    val mixed = a.join(b, Seq("k")).queryExecution.optimizedPlan
    assert(SelfJoinMergeHint(mixed).collect { case j: Join => j.hint }
      .forall(_ == JoinHint(None, None)))
    // self-join over a plain scan (no aggregate/window) -> no hint
    val scan = Seq(("a", 1)).toDF("k", "v")
    val cheap = scan.select(col("k"), col("v").as("l"))
      .join(scan.select(col("k"), col("v").as("r")), Seq("k"))
      .queryExecution.optimizedPlan
    assert(SelfJoinMergeHint(cheap).collect { case j: Join => j.hint }
      .forall(_ == JoinHint(None, None)))
  }

  test("injected function builders resolve char_ngrams and simhash_agg") {
    // the bundle applies cleanly to a fresh extensions object (the
    // session-level path can't be exercised here: a default session
    // already exists and getOrCreate will not re-run extensions)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // builders registered per-session resolve and evaluate through SQL
    graft.functions.CharNGrams.register(spark)
    graft.functions.SimHashAgg.register(spark)
    val out = spark.sql(
      "SELECT simhash_agg(md5(t)) AS sig, size(char_ngrams('abcdef', 3)) AS n " +
        "FROM VALUES ('x'), ('y') AS v(t)").collect()(0)
    assert(out.getLong(0) >= 0L && out.getInt(1) == 4)
  }
}
