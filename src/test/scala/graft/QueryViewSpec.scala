package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.temporal.QueryView

/** Aggregate-over-join IVM: the higher-order delta rule must converge
  * to the from-scratch aggregate after inserts, deletes, both-side
  * updates (cross term), group birth/death, and batch splits. */
class QueryViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val jk = Seq("k")
  private val gk = Seq("g")
  private val vc = Seq("v")

  // A rows: (k join key, v value); B rows: (k, g group)
  private def A(rows: (Long, Double)*): DataFrame = rows.toDF("k", "v")
  private def B(rows: (Long, String)*): DataFrame = rows.toDF("k", "g")
  private def dA(rows: (Long, Double, Long)*): DataFrame =
    rows.toDF("k", "v", "_mult")
  private def dB(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("k", "g", "_mult")

  private def direct(a: DataFrame, b: DataFrame): Map[String, (Long, Long)] =
    a.join(b, jk).groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(v * 10000 + 0.5) AS BIGINT)")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def stateMap(s: DataFrame): Map[String, (Long, Long)] =
    s.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("init equals the direct aggregate") {
    val a = A((1L, 1.5), (1L, 2.0), (2L, 10.0))
    val b = B((1L, "x"), (2L, "y"))
    assert(stateMap(QueryView.init(a, b, jk, gk, vc)) == direct(a, b))
  }

  test("one refresh with inserts, deletes and a group rebrand converges") {
    val a0 = A((1L, 1.0), (2L, 2.0), (3L, 3.0), (3L, 4.0))
    val b0 = B((1L, "x"), (2L, "x"), (3L, "y"))
    val s0 = QueryView.init(a0, b0, jk, gk, vc)
    // delete A(2, 2.0); insert A(1, 9.0); rebrand key 3: y -> z
    val da = dA((2L, 2.0, -1L), (1L, 9.0, 1L))
    val db = dB((3L, "y", -1L), (3L, "z", 1L))
    val s1 = QueryView.applyDeltas(s0, a0, b0, da, db, jk, gk, vc)
    val aF = A((1L, 1.0), (3L, 3.0), (3L, 4.0), (1L, 9.0))
    val bF = B((1L, "x"), (2L, "x"), (3L, "z"))
    assert(stateMap(s1) == direct(aF, bF))
    // the rebrand kills group y entirely — it must VANISH, not zero out
    assert(!stateMap(s1).contains("y"))
  }

  test("cross term: an insert meets its partner's same-batch rebrand") {
    val a0 = A((1L, 1.0))
    val b0 = B((2L, "auto"))
    val s0 = QueryView.init(a0, b0, jk, gk, vc) // empty: no shared key
    assert(stateMap(s0).isEmpty)
    // A gains key 2 in the SAME refresh that rebrands B's key 2
    val da = dA((2L, 5.0, 1L))
    val db = dB((2L, "auto", -1L), (2L, "auto2", 1L))
    val s1 = QueryView.applyDeltas(s0, a0, b0, da, db, jk, gk, vc)
    assert(stateMap(s1) == Map("auto2" -> (1L, 50000L)))
  }

  test("two sequential refreshes equal one combined refresh") {
    val a0 = A((1L, 1.0), (2L, 2.0))
    val b0 = B((1L, "x"), (2L, "y"))
    val s0 = QueryView.init(a0, b0, jk, gk, vc)
    val da1 = dA((1L, 3.0, 1L))
    val da2 = dA((2L, 2.0, -1L))
    // path 1: sequential (state must track the evolving A side)
    val s1 = QueryView.applyDeltas(s0, a0, b0, da1,
      dB(), jk, gk, vc)
    val a1 = A((1L, 1.0), (2L, 2.0), (1L, 3.0))
    val s2 = QueryView.applyDeltas(s1, a1, b0, da2, dB(), jk, gk, vc)
    // path 2: combined
    val s2b = QueryView.applyDeltas(s0, a0, b0,
      da1.unionByName(da2), dB(), jk, gk, vc)
    assert(stateMap(s2) == stateMap(s2b))
    assert(stateMap(s2) ==
      direct(A((1L, 1.0), (1L, 3.0)), b0))
  }

  test("fan-out multiplicities: duplicate join keys multiply not add") {
    // two B rows share key 1 in the same group: each A row of key 1
    // contributes TWICE (bag semantics) — and a delete removes both
    val a0 = A((1L, 1.0))
    val b0 = B((1L, "x"), (1L, "x"))
    val s0 = QueryView.init(a0, b0, jk, gk, vc)
    assert(stateMap(s0) == Map("x" -> (2L, 20000L)))
    val s1 = QueryView.applyDeltas(s0, a0, b0,
      dA((1L, 1.0, -1L)), dB(), jk, gk, vc)
    assert(stateMap(s1).isEmpty)
  }
}
