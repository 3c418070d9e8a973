package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.temporal.Rollup

/** Incremental rollup maintenance (graft.temporal.Rollup): the fold
  * algebra equals the direct aggregate under ANY batch split/order,
  * and the AtomicSwap-backed refresh path accumulates identically. */
class RollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("k")
  private val vals = Seq("v")

  private def rows(n: Seq[(String, Double)]) = n.toDF("k", "v")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("k", "n", "sum_v_e4", "min_v", "max_v")
      .orderBy("k").collect().map(_.toString).toSeq

  test("merge of any split equals the direct one-pass aggregate") {
    val all = rows(Seq(("a", 1.5), ("a", 2.25), ("b", 10.0),
      ("b", 0.0001), ("c", 7.77)))
    val direct = Rollup.aggState(all, keys, vals)
    // split 1|4, 3|2, and a three-way fold in both orders
    val splits = Seq(1, 3).map(i => (all.limit(i), all.except(all.limit(i))))
    splits.foreach { case (x, y) =>
      val folded = Rollup.merge(
        Rollup.aggState(x, keys, vals), Rollup.aggState(y, keys, vals),
        keys, vals)
      assert(canon(folded) == canon(direct))
    }
    val parts = Seq(rows(Seq(("a", 1.5))), rows(Seq(("a", 2.25), ("b", 10.0))),
      rows(Seq(("b", 0.0001), ("c", 7.77)))).map(Rollup.aggState(_, keys, vals))
    val leftFold = parts.reduceLeft(Rollup.merge(_, _, keys, vals))
    val rightFold = parts.reduceRight(Rollup.merge(_, _, keys, vals))
    assert(canon(leftFold) == canon(direct) && canon(rightFold) == canon(direct))
  }

  test("refreshPath: batches accumulate through the swap to the direct aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup").toString
    val path = s"$dir/mv"
    val b1 = rows(Seq(("a", 1.0), ("b", 2.0)))
    val b2 = rows(Seq(("a", 3.0), ("c", 4.0)))
    val b3 = rows(Seq(("b", 5.0)))
    assert(Rollup.refreshPath(spark, path, b1, keys, vals) == 2)
    assert(Rollup.refreshPath(spark, path, b2, keys, vals) == 3)
    assert(Rollup.refreshPath(spark, path, b3, keys, vals) == 3)
    val direct = Rollup.aggState(b1.unionByName(b2).unionByName(b3), keys, vals)
    assert(canon(spark.read.parquet(path)) == canon(direct))
  }
}
