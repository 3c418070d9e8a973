package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Boruvka

/** Boruvka MSF against an in-JVM Kruskal twin: under the (w, a, b)
  * total order the MSF is unique, so the two must agree edge-for-edge
  * on any graph. */
class BoruvkaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def msfOf(edges: Seq[(Long, Long, Long)],
      maxRounds: Int = 16): Set[(Long, Long, Long, Long)] =
    Boruvka.minimumSpanningForest(
        edges.toDF("src", "dst", "w"), maxRounds = maxRounds)
      .as[(Long, Long, Long, Long)].collect().toSet

  /** Reference Kruskal with union-find, same canonicalization and
    * (w, a, b) total order; labels trees by minimum member. */
  private def kruskal(edges: Seq[(Long, Long, Long)])
      : Set[(Long, Long, Long, Long)] = {
    val canon = edges.map { case (s, d, w) =>
      (math.min(s, d), math.max(s, d), w) }
      .filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2))
      .map { case ((a, b), es) => (a, b, es.map(_._3).min) }.toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val chosen = canon.sortBy(e => (e._3, e._1, e._2)).flatMap {
      case (a, b, w) =>
        val (ra, rb) = (find(a), find(b))
        if (ra == rb) None
        else { parent(ra) = rb; Some((a, b, w)) }
    }
    val treeMin = chosen.flatMap(e => Seq(e._1, e._2)).distinct
      .groupBy(find).map { case (_, ns) => find(ns.head) -> ns.min }
    chosen.map(e => (e._1, e._2, e._3, treeMin(find(e._1)))).toSet
  }

  test("hand-checked triangle + pendant: heaviest cycle edge excluded") {
    // 1-2 (w1), 2-3 (w2), 1-3 (w9, excluded), 3-4 (w5)
    val e = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 9L), (3L, 4L, 5L))
    assert(msfOf(e) == Set((1L, 2L, 1L, 1L), (2L, 3L, 2L, 1L),
      (3L, 4L, 5L, 1L)))
  }

  test("matches Kruskal on a pseudo-random multi-component graph") {
    // deterministic LCG over 60 nodes in 3 forced id bands
    var x = 12345L
    def nxt(): Long = { x = (x * 1103515245L + 12345L) % (1L << 31); x }
    val e = (1 to 300).map { _ =>
      val band = nxt() % 3
      val u = band * 1000 + nxt() % 20
      val v = band * 1000 + nxt() % 20
      (u, v, nxt() % 50)
    }.filter(t => t._1 != t._2)
    val got = msfOf(e)
    assert(got == kruskal(e))
    assert(got.map(_._4).size == 3) // one tree per id band
  }

  test("equal weights resolve by the (w, a, b) total order") {
    // square with ALL weights equal: MSF = the 3 lexicographically
    // first edges
    val e = Seq((1L, 2L, 7L), (2L, 3L, 7L), (3L, 4L, 7L), (4L, 1L, 7L))
    val got = msfOf(e)
    assert(got == kruskal(e))
    assert(got == Set((1L, 2L, 7L, 1L), (1L, 4L, 7L, 1L),
      (2L, 3L, 7L, 1L)))
  }

  test("multi-edges collapse to lightest; self-loops drop") {
    val e = Seq((1L, 2L, 9L), (2L, 1L, 3L), (1L, 2L, 5L), (2L, 2L, 1L))
    assert(msfOf(e) == Set((1L, 2L, 3L, 1L)))
  }

  test("disconnected forest labels each tree by its minimum member") {
    val e = Seq((10L, 11L, 1L), (11L, 12L, 2L), (20L, 21L, 3L))
    assert(msfOf(e) == Set((10L, 11L, 1L, 10L), (11L, 12L, 2L, 10L),
      (20L, 21L, 3L, 20L)))
  }

  test("chain graph (worst hook depth) still flattens within bounds") {
    val e = (1L to 40L).map(i => (i, i + 1, 100L - i)).toSeq
    assert(msfOf(e) == kruskal(e))
  }

  test("round cap overruns loudly instead of truncating") {
    val e = (1L to 40L).map(i => (i, i + 1, 100L - i)).toSeq
    val ex = intercept[IllegalArgumentException] { msfOf(e, maxRounds = 1) }
    assert(ex.getMessage.contains("not closed"))
  }
}
