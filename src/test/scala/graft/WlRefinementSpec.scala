package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WlRefinement

/** 1-WL color refinement: structural distinguishability and its known
  * blind spots, pinned on hand-built graphs. */
class WlRefinementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def colorsOf(edges: Seq[(Long, Long)], rounds: Int)
      : Map[Long, String] =
    WlRefinement.colors(edges.toDF("src", "dst"), rounds)
      .as[(Long, String)].collect().toMap

  test("round 0 colors by degree") {
    val c = colorsOf(Seq((1L, 2L), (2L, 3L)), 0)
    assert(c(1L) == "1" && c(3L) == "1" && c(2L) == "2")
  }

  test("symmetric positions share a color; asymmetric split") {
    // path 1-2-3-4: ends alike, middles alike, ends != middles
    val c = colorsOf(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 2)
    assert(c(1L) == c(4L) && c(2L) == c(3L) && c(1L) != c(2L))
  }

  test("refinement separates nodes degree alone cannot") {
    // star center vs triangle node both have degree 2 in: path end's
    // neighbor structure differs at round 2
    // graph: triangle 1-2-3 plus path 4-5, 5-6: all of 4,6 deg 1;
    // triangle nodes deg 2; 5 deg 2 — round 1 splits 5 from triangle
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L))
    val c0 = colorsOf(e, 0)
    assert(c0(5L) == c0(1L)) // degree 2 both — blind at round 0
    val c1 = colorsOf(e, 1)
    assert(c1(5L) != c1(1L)) // neighbors' degrees differ — split
  }

  test("1-WL blind spot stays blind: two triangles vs a 6-cycle") {
    // every node 2-regular with 2-regular neighbors: 1-WL cannot
    // distinguish C3+C3 from C6 — all nodes one color at any depth
    val twoTri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L))
    val c = colorsOf(twoTri, 3)
    assert(c.values.toSet.size == 1)
    val c6 = colorsOf(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L)), 3)
    assert(c6.values.toSet.size == 1)
  }

  test("directed input is symmetrized; duplicate edges collapse") {
    val c1 = colorsOf(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)), 2)
    val c2 = colorsOf(Seq((1L, 2L), (2L, 3L)), 2)
    assert(c1 == c2)
  }

  test("colors stabilize: extra rounds refine the partition monotonically") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val parts3 = colorsOf(e, 3).groupBy(_._2).values
      .map(_.keys.toSet).toSet
    val parts4 = colorsOf(e, 4).groupBy(_._2).values
      .map(_.keys.toSet).toSet
    assert(parts3 == parts4) // already stable on 5 edges
  }
}
