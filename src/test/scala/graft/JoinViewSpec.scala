package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.temporal.JoinView

/** The counting-IVM contract: init equals the plain join; insert,
  * delete, and simultaneous both-side deltas (including the ΔA⋈ΔB
  * cross term) each converge to the from-scratch join of the updated
  * states; bag multiplicities track duplicate counts; untouched rows
  * pass through the refresh unchanged. */
class JoinViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viewRows(v: DataFrame): Set[(Long, String, String, Long)] =
    v.select("k", "a", "b", "_mult").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet

  private def recompute(a: DataFrame, b: DataFrame): Set[(Long, String, String, Long)] =
    viewRows(JoinView.init(a, b, Seq("k")))

  private val a0 = Seq((1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("k", "a")
  private val b0 = Seq((1L, "b1"), (2L, "b2"), (4L, "b4")).toDF("k", "b")
  private def emptyA = Seq.empty[(Long, String, Long)].toDF("k", "a", "_mult")
  private def emptyB = Seq.empty[(Long, String, Long)].toDF("k", "b", "_mult")

  test("init is the plain join with multiplicity 1") {
    val v = JoinView.init(a0, b0, Seq("k"))
    assert(viewRows(v) == Set((1L, "a1", "b1", 1L), (2L, "a2", "b2", 1L)))
  }

  test("insert-only delta converges to the recomputed join") {
    val v0 = JoinView.init(a0, b0, Seq("k"))
    val dA = Seq((4L, "a4", 1L), (2L, "a2x", 1L)).toDF("k", "a", "_mult")
    val v1 = JoinView.applyDeltas(v0, a0, b0, dA, emptyB, Seq("k"))
    val aNew = a0.unionByName(Seq((4L, "a4"), (2L, "a2x")).toDF("k", "a"))
    assert(viewRows(v1) == recompute(aNew, b0))
  }

  test("delete via negative multiplicity removes exactly the joined rows") {
    val v0 = JoinView.init(a0, b0, Seq("k"))
    val dA = Seq((2L, "a2", -1L)).toDF("k", "a", "_mult")
    val v1 = JoinView.applyDeltas(v0, a0, b0, dA, emptyB, Seq("k"))
    assert(viewRows(v1) == Set((1L, "a1", "b1", 1L)))
  }

  test("simultaneous both-side deltas need the cross term and get it") {
    // insert A-row k=5 AND B-row k=5 in the SAME refresh: only the
    // ΔA⋈ΔB term can produce the (5,a5,b5) view row
    val v0 = JoinView.init(a0, b0, Seq("k"))
    val dA = Seq((5L, "a5", 1L)).toDF("k", "a", "_mult")
    val dB = Seq((5L, "b5", 1L), (2L, "b2", -1L), (2L, "b2x", 1L))
      .toDF("k", "b", "_mult")
    val v1 = JoinView.applyDeltas(v0, a0, b0, dA, dB, Seq("k"))
    val aNew = a0.unionByName(Seq((5L, "a5")).toDF("k", "a"))
    val bNew = Seq((1L, "b1"), (2L, "b2x"), (4L, "b4"), (5L, "b5")).toDF("k", "b")
    assert(viewRows(v1) == recompute(aNew, bNew))
  }

  test("bag semantics: duplicate rows multiply and sum multiplicities") {
    val aDup = Seq((1L, "a1"), (1L, "a1")).toDF("k", "a") // mult 2
    val v0 = JoinView.init(aDup, b0, Seq("k"))
    assert(viewRows(v0) == Set((1L, "a1", "b1", 2L)))
    // deleting ONE copy leaves one
    val dA = Seq((1L, "a1", -1L)).toDF("k", "a", "_mult")
    val v1 = JoinView.applyDeltas(v0, aDup, b0, dA, emptyB, Seq("k"))
    assert(viewRows(v1) == Set((1L, "a1", "b1", 1L)))
  }

  test("untouched keys pass through the refresh byte-identically") {
    val v0 = JoinView.init(a0, b0, Seq("k"))
    val dA = Seq((3L, "a3x", 1L)).toDF("k", "a", "_mult") // k=3 has no B match
    val v1 = JoinView.applyDeltas(v0, a0, b0, dA, emptyB, Seq("k"))
    assert(viewRows(v1) == viewRows(v0), "a no-match delta changes nothing")
  }
}
