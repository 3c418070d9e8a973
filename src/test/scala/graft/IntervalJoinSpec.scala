package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IntervalJoin

/** The binning decomposition must be INVISIBLE semantically: same pair
  * set as the naive quadratic join (on seeded random fixtures, across
  * bucket widths smaller/comparable/larger than the intervals), exactly
  * one output row per pair (canonical-bucket attribution), and the plan
  * it buys must actually be an equi join, not a nested loop.
  */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Seeded random inclusive intervals in [0, span); len < maxLen. */
  private def randomIntervals(seed: Long, n: Int, span: Long, maxLen: Long)
      : Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val s = rnd.between(0L, span)
      (i.toLong, s, s + rnd.between(0L, maxLen))
    }
  }

  test("binned overlap join == naive quadratic join, one row per pair") {
    for (seed <- Seq(7L, 21L, 99L)) {
      val l = randomIntervals(seed, 80, 10000, 500).toDF("l_id", "ls", "le")
      val r = randomIntervals(seed + 1, 60, 10000, 800).toDF("r_id", "rs", "re")
      val naive = IntervalJoin.overlapJoinNaive(l, r, "ls", "le", "rs", "re")
        .select("l_id", "r_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(naive.nonEmpty, s"fixture seed=$seed produced no overlaps")
      for (bucket <- Seq(64L, 500L, 4096L)) {
        val rows = IntervalJoin.overlapJoin(l, r,
            "l_id", "ls", "le", "r_id", "rs", "re", bucket)
          .select("l_id", "r_id").collect()
          .map(x => (x.getLong(0), x.getLong(1)))
        assert(rows.toSet == naive, s"seed=$seed bucket=$bucket pair set diverged")
        assert(rows.length == naive.size,
          s"seed=$seed bucket=$bucket duplicate pair rows (canonical bucket broken)")
      }
    }
  }

  test("the binned plan is an equi join on the bucket id, not a nested loop") {
    val l = randomIntervals(5L, 200, 100000, 900).toDF("l_id", "ls", "le")
    val r = randomIntervals(6L, 200, 100000, 900).toDF("r_id", "rs", "re")
    val plan = IntervalJoin.overlapJoin(l, r,
        "l_id", "ls", "le", "r_id", "rs", "re", bucket = 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"),
      s"expected an equi join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binning failed to remove the nested loop:\n$plan")
  }
}
