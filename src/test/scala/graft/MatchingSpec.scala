package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Matching

/** Locally-dominant greedy matching (operators/Matching) — exact
  * equality with the sequential sort-and-take greedy (the theorem the
  * operator rides on), matching validity, and the 1/2 guarantee
  * against a brute-force optimum on small graphs. */
class MatchingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def localGreedy(
      edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val norm = edges.collect { case (a, b, w) if a != b =>
      (math.min(a, b), math.max(a, b), w) }
      .groupBy(e => (e._1, e._2)).map(_._2.maxBy(_._3)).toSeq
    val taken = scala.collection.mutable.Set.empty[Long]
    val out = Set.newBuilder[(Long, Long, Long)]
    norm.sortBy { case (u, v, w) => (-w, u, v) }.foreach { case (u, v, w) =>
      if (!taken(u) && !taken(v)) { taken += u; taken += v; out += ((u, v, w)) }
    }
    out.result()
  }

  private def sparkGreedy(
      edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    Matching.greedy(edges.toDF("u", "v", "w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("equals the sequential greedy on random weighted graphs") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 4) {
      val edges = (1 to 200).map(_ => (rnd.nextInt(30).toLong,
        rnd.nextInt(30).toLong, rnd.nextInt(1000).toLong + 1))
      assert(sparkGreedy(edges) == localGreedy(edges), s"trial $trial")
    }
  }

  test("output is a valid matching (no shared endpoints)") {
    val rnd = new scala.util.Random(29)
    val edges = (1 to 150).map(_ => (rnd.nextInt(25).toLong,
      rnd.nextInt(25).toLong, rnd.nextInt(100).toLong + 1))
    val m = sparkGreedy(edges)
    val nodes = m.toSeq.flatMap { case (u, v, _) => Seq(u, v) }
    assert(nodes.distinct.size == nodes.size)
  }

  test("1/2-approximation vs brute-force maximum on a small graph") {
    val rnd = new scala.util.Random(5)
    val edges = (for (a <- 1L to 8L; b <- (a + 1) to 8L) yield
      (a, b, rnd.nextInt(50).toLong + 1)).toSeq
    def best(rem: Seq[(Long, Long, Long)], used: Set[Long]): Long = rem match {
      case Nil => 0L
      case e +: rest =>
        val skip = best(rest, used)
        if (!used(e._1) && !used(e._2))
          math.max(skip, e._3 + best(rest, used + e._1 + e._2))
        else skip
    }
    val opt = best(edges, Set.empty)
    val got = sparkGreedy(edges).toSeq.map(_._3).sum
    assert(got * 2 >= opt, s"greedy $got vs optimum $opt")
  }

  test("a chain where greedy is forced: middle edge wins, sides lose") {
    // path 1-2-3-4 with middle weight highest: greedy takes (2,3) only
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 9L), (3L, 4L, 5L))
    assert(sparkGreedy(edges) == Set((2L, 3L, 9L)))
  }
}
