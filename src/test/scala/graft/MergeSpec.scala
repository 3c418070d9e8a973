package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.temporal.Merge

/** Delta-style MERGE INTO semantics (graft.temporal.Merge): the four
  * row classes of one statement (update / delete / insert / keep), the
  * delete-of-absent-key no-op, last-writer-wins versioned dedup, and
  * the AtomicSwap-backed path variant including bootstrap. */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def target: DataFrame = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("id", "name", "bal")

  private def state(df: DataFrame): Seq[(Long, String, Double)] =
    df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

  test("one MERGE: update + delete + insert + keep") {
    val source = Seq(
      (2L, "b2", 22.0, "U"), // matched update
      (3L, "c", 30.0, "D"),  // matched delete
      (5L, "e", 50.0, "U"))  // unmatched insert
      .toDF("id", "name", "bal", "op")
    val out = Merge.mergeInto(target, source, Seq("id"),
      deleteExpr = Some("op = 'D'"))
    assert(state(out) == Seq((1L, "a", 10.0), (2L, "b2", 22.0),
      (4L, "d", 40.0), (5L, "e", 50.0)))
  }

  test("delete of an absent key is a no-op; insertUnmatched=false drops source-only rows") {
    val source = Seq((9L, "x", 0.0, "D"), (8L, "y", 80.0, "U"))
      .toDF("id", "name", "bal", "op")
    val out = Merge.mergeInto(target, source, Seq("id"),
      deleteExpr = Some("op = 'D'"), insertUnmatched = false)
    assert(state(out) == state(target))
  }

  test("versioned CDC feed: last writer wins per key, delete beats earlier updates") {
    val feed = Seq(
      (2L, "b_v1", 21.0, "U", 1L),
      (2L, "b_v2", 22.0, "U", 2L), // winner for key 2
      (3L, "c_v1", 31.0, "U", 1L),
      (3L, "c", 30.0, "D", 2L),    // delete wins for key 3
      (5L, "e_v1", 51.0, "U", 1L),
      (5L, "e_v2", 52.0, "U", 2L)) // insert at latest version
      .toDF("id", "name", "bal", "op", "v")
    val out = Merge.mergeInto(target, feed, Seq("id"),
      deleteExpr = Some("op = 'D'"), versionCol = Some("v"))
    assert(state(out) == Seq((1L, "a", 10.0), (2L, "b_v2", 22.0),
      (4L, "d", 40.0), (5L, "e_v2", 52.0)))
  }

  test("mergeIntoPath: bootstrap creates the table, later merges mutate it through the swap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge").toString
    val path = s"$dir/state"
    // bootstrap: absent table = empty target in the source's shape
    // minus the version column (op flag projected away by the caller
    // shaping the first batch, per the scaladoc)
    val first = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "bal")
    val (b0, a0) = Merge.mergeIntoPath(spark, path, first, Seq("id"))
    assert(b0 == 0 && a0 == 2)
    val second = Seq((2L, "b2", 22.0, "U"), (3L, "c", 30.0, "U"),
      (1L, "a", 10.0, "D")).toDF("id", "name", "bal", "op")
    val (b1, a1) = Merge.mergeIntoPath(spark, path, second, Seq("id"),
      deleteExpr = Some("op = 'D'"))
    assert(b1 == 2 && a1 == 2)
    // op was not a target column, so it is dropped from the state
    val st = spark.read.parquet(path)
    assert(st.columns.sorted.toSeq == Seq("bal", "id", "name"))
    assert(state(st.select("id", "name", "bal")) ==
      Seq((2L, "b2", 22.0), (3L, "c", 30.0)))
  }

  test("merge plan is one full-outer shuffle join on the key (no second pass)") {
    val source = Seq((2L, "b2", 22.0, "U")).toDF("id", "name", "bal", "op")
    val out = Merge.mergeInto(target, source, Seq("id"),
      deleteExpr = Some("op = 'U' AND false"))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("FullOuter"), plan)
    val joins = "Join ".r.findAllIn(plan).length
    assert(joins == 1, s"expected exactly one join, plan:\n$plan")
  }
}
