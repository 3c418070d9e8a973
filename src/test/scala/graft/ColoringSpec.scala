package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Coloring

/** Jones-Plassmann coloring (operators/Coloring) — properness, exact
  * agreement with an in-JVM replay of the same priority rounds, and
  * the structural cases (clique, star, bipartite). */
class ColoringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pr(n: Long): (BigInt, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(n.toString.getBytes("UTF-8"))
    (BigInt(1, md.take(6)), n)
  }

  /** Straight-line replay of the same synchronized JP rounds. */
  private def localJp(edges: Seq[(Long, Long)]): Map[Long, Int] = {
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct
    val adj = und.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, ps) => n -> ps.map(_._2).toSet }
    var un = adj.keySet
    var color = Map.empty[Long, Int]
    while (un.nonEmpty) {
      val lm = un.filter(v => adj(v).forall(w =>
        !un.contains(w) || implicitly[Ordering[(BigInt, Long)]]
          .lt(pr(w), pr(v))))
      lm.foreach { v =>
        val used = adj(v).flatMap(color.get)
        color += v -> Iterator.from(0).find(c => !used.contains(c)).get
      }
      un --= lm
    }
    color
  }

  private def sparkJp(edges: Seq[(Long, Long)]): Map[Long, Int] =
    Coloring.jonesPlassmann(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("bit-exact against the in-JVM replay on a random graph") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 250).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    assert(sparkJp(edges) == localJp(edges))
  }

  test("the coloring is proper and first-fit dense on random graphs") {
    val rnd = new scala.util.Random(5)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val c = sparkJp(edges)
    edges.foreach { case (a, b) =>
      assert(c(a) != c(b), s"monochrome edge ($a,$b)")
    }
    // first-fit from 0: the used color set is a dense 0..max range
    val used = c.values.toSet
    assert(used == (0 to used.max).toSet)
  }

  test("structural cases: clique needs n colors, a star needs 2") {
    val k6 = for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b)
    assert(sparkJp(k6).values.toSet == (0 to 5).toSet)
    val star = (2L to 30L).map(i => (1L, i))
    assert(sparkJp(star).values.toSet == Set(0, 1))
  }

  test("partitioning cannot move a single color") {
    val rnd = new scala.util.Random(99)
    val edges = (1 to 200).map(_ =>
      (rnd.nextInt(45).toLong, rnd.nextInt(45).toLong))
    def run(parts: Int) =
      Coloring.jonesPlassmann(edges.toDF("u", "v").repartition(parts))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(run(1) == run(11))
  }

  test("empty input returns an empty coloring") {
    assert(sparkJp(Seq((7L, 7L))).isEmpty)
  }
}
