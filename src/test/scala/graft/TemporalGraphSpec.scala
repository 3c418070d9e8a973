package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TemporalGraph

/** Time-respecting earliest arrival: the property static reachability
  * cannot see, pinned on hand-built temporal graphs. */
class TemporalGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def arrOf(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
      t0: Long = 0L, cap: Int = 64): Map[Long, Long] =
    TemporalGraph.earliestArrival(edges.toDF("u", "v", "t"),
        sources.toDF("node"), t0, cap)
      .as[(Long, Long)].collect().toMap

  test("a time-decreasing path does not exist; increasing one does") {
    // 1 -(t5)-> 2 -(t3)-> 3 : 3 unreachable through t3 < 5
    // 1 -(t5)-> 2 -(t7)-> 3 : reachable at 7
    assert(arrOf(Seq((1L, 2L, 5L), (2L, 3L, 3L)), Seq(1L)) ==
      Map(1L -> 0L, 2L -> 5L))
    assert(arrOf(Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 3L, 7L)),
      Seq(1L)) == Map(1L -> 0L, 2L -> 5L, 3L -> 7L))
  }

  test("earliest arrival is the min over time-respecting paths") {
    // two routes to 4: via 2 arrives 9, via 3 arrives 6
    val e = Seq((1L, 2L, 1L), (2L, 4L, 9L), (1L, 3L, 2L), (3L, 4L, 6L))
    assert(arrOf(e, Seq(1L))(4L) == 6L)
  }

  test("edges strictly before the start time are unusable") {
    val e = Seq((1L, 2L, 3L), (1L, 2L, 8L))
    assert(arrOf(e, Seq(1L), t0 = 5L) == Map(1L -> 5L, 2L -> 8L))
  }

  test("multiple sources wave-merge by min") {
    val e = Seq((1L, 3L, 10L), (2L, 3L, 4L), (3L, 4L, 12L))
    assert(arrOf(e, Seq(1L, 2L)) ==
      Map(1L -> 0L, 2L -> 0L, 3L -> 4L, 4L -> 12L))
  }

  test("an earlier arrival reopens edges a later one could not use") {
    // 5 arrives at 3 via t2; edge 3->6 at t3 usable only because
    // arrival is 2, not the alternative 9
    val e = Seq((1L, 3L, 2L), (2L, 3L, 9L), (3L, 6L, 3L))
    assert(arrOf(e, Seq(1L, 2L))(6L) == 3L)
  }

  test("a cycle terminates: relaxation is monotone") {
    val e = Seq((1L, 2L, 1L), (2L, 1L, 2L), (2L, 3L, 5L))
    assert(arrOf(e, Seq(1L)) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 5L))
  }

  test("round cap fails loudly") {
    val chain = (1L to 20L).map(i => (i, i + 1, i)).toSeq
    val ex = intercept[IllegalArgumentException] {
      arrOf(chain, Seq(1L), cap = 2)
    }
    assert(ex.getMessage.contains("not stable"))
  }
}
