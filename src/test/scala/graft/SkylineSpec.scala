package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skyline

/** 2-D skyline window algebra against a brute-force dominance twin:
  * the Pareto set is unique, so they must agree row-for-row. */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sky(rows: Seq[(Long, String, Double, Double)])
      : Set[Long] =
    Skyline.pareto2d(rows.toDF("id", "g", "x", "y"),
        col("g"), col("x"), col("y"))
      .select("id").as[Long].collect().toSet

  private def brute(rows: Seq[(Long, String, Double, Double)])
      : Set[Long] =
    rows.filter { r =>
      !rows.exists(s => s._2 == r._2 && s._3 <= r._3 && s._4 <= r._4 &&
        (s._3 < r._3 || s._4 < r._4))
    }.map(_._1).toSet

  test("hand-checked frontier: staircase survives, interior dies") {
    val rows = Seq((1L, "a", 1.0, 9.0), (2L, "a", 3.0, 5.0),
      (3L, "a", 7.0, 2.0), (4L, "a", 4.0, 6.0), (5L, "a", 8.0, 8.0))
    assert(sky(rows) == Set(1L, 2L, 3L)) // 4 dominated by 2, 5 by all
    assert(sky(rows) == brute(rows))
  }

  test("matches brute force on a pseudo-random grid, multiple groups") {
    var x = 99L
    def nxt(): Long = { x = (x * 1103515245L + 12345L) % (1L << 31); x }
    val rows = (1L to 400L).map(i =>
      (i, "g" + nxt() % 3, (nxt() % 40).toDouble, (nxt() % 40).toDouble))
    assert(sky(rows) == brute(rows))
  }

  test("duplicate points are mutually non-dominating: both stay") {
    val rows = Seq((1L, "a", 2.0, 2.0), (2L, "a", 2.0, 2.0),
      (3L, "a", 3.0, 3.0))
    assert(sky(rows) == Set(1L, 2L))
  }

  test("same-x column: only the min y survives") {
    val rows = Seq((1L, "a", 2.0, 5.0), (2L, "a", 2.0, 3.0),
      (3L, "a", 1.0, 9.0))
    assert(sky(rows) == Set(2L, 3L))
  }

  test("a single all-best point dominates everything") {
    val rows = Seq((1L, "a", 0.0, 0.0), (2L, "a", 1.0, 5.0),
      (3L, "a", 5.0, 1.0))
    assert(sky(rows) == Set(1L))
  }

  test("maximize via negation agrees with brute force on negated dims") {
    val rows = (1L to 60L).map(i =>
      (i, "m", (i % 7).toDouble, -((i % 11).toDouble)))
    assert(sky(rows) == brute(rows))
  }
}
