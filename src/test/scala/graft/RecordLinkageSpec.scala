package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RecordLinkage

/** Fellegi-Sunter EM (operators/RecordLinkage) — pinned against a
  * straight-line in-JVM replay of the SAME quantized arithmetic: the
  * operator's contract is bit-exact integer-ppm determinism, so the
  * local twin must agree on every parameter and posterior, not just
  * approximately. Plus the statistical sanity EM must deliver. */
class RecordLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** In-JVM replay of emPpm's exact arithmetic over (g-vector, n). */
  private def localEm(
      pats: Seq[(Array[Int], Long)], iters: Int): (Map[Seq[Int], Long], Array[Long]) = {
    val k = pats.head._1.length
    var lam = 100000L
    var m = Array.fill(k)(900000L)
    var u = Array.fill(k)(100000L)
    def rppm(g: Array[Int]): Long = {
      var fm = lam / 1.0e6
      var fu = (1000000L - lam) / 1.0e6
      (0 until k).foreach { i =>
        fm *= (if (g(i) == 1) m(i) else 1000000L - m(i)) / 1.0e6
        fu *= (if (g(i) == 1) u(i) else 1000000L - u(i)) / 1.0e6
      }
      math.max(1L, math.min(999999L,
        math.floor(1000000 * (fm / (fm + fu)) + 0.5).toLong))
    }
    def clamp(x: Long) = math.max(1000L, math.min(999000L, x))
    (1 to iters).foreach { _ =>
      val rs = pats.map { case (g, _) => rppm(g) }
      val sn = pats.map(_._2).sum
      val snr = pats.zip(rs).map { case ((_, n), r) => n * r }.sum
      val snu = pats.zip(rs).map { case ((_, n), r) => n * (1000000L - r) }.sum
      val newM = (0 until k).map { i =>
        clamp(1000000L * pats.zip(rs).collect {
          case ((g, n), r) if g(i) == 1 => n * r
        }.sum / snr)
      }.toArray
      val newU = (0 until k).map { i =>
        clamp(1000000L * pats.zip(rs).collect {
          case ((g, n), r) if g(i) == 1 => n * (1000000L - r)
        }.sum / snu)
      }.toArray
      lam = clamp(snr / sn)
      m = newM
      u = newU
    }
    val post = pats.map { case (g, _) => g.toSeq -> rppm(g) }.toMap
    (post, Array(lam) ++ m ++ u)
  }

  // A realistic pattern frame: a small full-agreement match class, a
  // large disagreement class, and mixed middles.
  private val pats = Seq(
    (Array(1, 1, 1), 8L),
    (Array(1, 1, 0), 12L),
    (Array(1, 0, 0), 40L),
    (Array(0, 1, 0), 35L),
    (Array(0, 0, 1), 20L),
    (Array(0, 0, 0), 300L))

  private def runSpark(iters: Int) = {
    val df = pats.map { case (g, n) => (g(0), g(1), g(2), n) }
      .toDF("g1", "g2", "g3", "n")
    RecordLinkage.emPpm(df, Seq("g1", "g2", "g3"), iters)
      .collect().map { r =>
        (Seq(r.getInt(0), r.getInt(1), r.getInt(2)),
          r.getLong(r.fieldIndex("r_ppm")),
          (Seq("lam", "m_g1", "m_g2", "m_g3", "u_g1", "u_g2", "u_g3")
            .map(c => r.getLong(r.fieldIndex(c)))))
      }
  }

  test("bit-exact against the in-JVM replay of the same quantized EM") {
    for (iters <- Seq(1, 3, 5)) {
      val got = runSpark(iters)
      val (post, params) = localEm(pats, iters)
      got.foreach { case (g, r, ps) =>
        assert(r == post(g), s"iters=$iters posterior for $g")
        assert(ps == params.toSeq, s"iters=$iters params")
      }
    }
  }

  test("EM separates: full agreement scores far above full disagreement") {
    val byG = runSpark(5).map { case (g, r, _) => g -> r }.toMap
    assert(byG(Seq(1, 1, 1)) > 900000L)
    assert(byG(Seq(0, 0, 0)) < 100000L)
    assert(byG(Seq(1, 1, 1)) > byG(Seq(1, 1, 0)))
  }

  test("parameters stay clamped inside [1000, 999000] ppm") {
    runSpark(5).foreach { case (_, _, ps) =>
      ps.foreach(p => assert(p >= 1000L && p <= 999000L))
    }
  }

  test("pattern-frame partitioning cannot move a single ppm") {
    val df = pats.map { case (g, n) => (g(0), g(1), g(2), n) }
      .toDF("g1", "g2", "g3", "n")
    def run(d: org.apache.spark.sql.DataFrame) =
      RecordLinkage.emPpm(d, Seq("g1", "g2", "g3"), 4)
        .orderBy("g1", "g2", "g3").collect().toSeq.map(_.toSeq)
    assert(run(df.repartition(5)) == run(df.coalesce(1)))
  }
}
