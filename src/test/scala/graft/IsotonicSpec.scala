package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Isotonic

/** Isotonic minimax fit (operators/Isotonic) — pinned EXACTLY against
  * an in-JVM pool-adjacent-violators implementation on BigInt
  * rationals: fit_e6 must equal floor(1e6 * exact PAV fit) at every
  * position (floor commutes with the minimax), plus monotonicity and
  * weight semantics. */
class IsotonicSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Exact weighted PAV: pools carry (sum y, sum w) as BigInt; merge
    * while the previous pool's average >= the next's. */
  private def pavE6(ys: Seq[(Long, Long)]): Seq[Long] = {
    case class Pool(s: BigInt, w: BigInt, n: Int)
    val pools = scala.collection.mutable.ArrayBuffer.empty[Pool]
    ys.foreach { case (y, w) =>
      var cur = Pool(BigInt(y), BigInt(w), 1)
      while (pools.nonEmpty &&
          pools.last.s * cur.w >= cur.s * pools.last.w) {
        val p = pools.remove(pools.size - 1)
        cur = Pool(p.s + cur.s, p.w + cur.w, p.n + cur.n)
      }
      pools += cur
    }
    pools.toSeq.flatMap { p =>
      // floor(1e6 * s / w) with BigInt floor division (s may be negative)
      val q = (BigInt(1000000) * p.s).mod(p.w) // mod is nonneg for w > 0
      val f = ((BigInt(1000000) * p.s) - q) / p.w
      Seq.fill(p.n)(f.toLong)
    }
  }

  private def sparkFit(ys: Seq[(Long, Long)]): Seq[Long] = {
    val df = ys.zipWithIndex.map { case ((y, w), i) =>
      ("k", i.toLong, y, w) }.toDF("key", "pos", "y_e2", "w")
    Isotonic.fitE6(df).orderBy("pos").collect().map(_.getLong(2)).toSeq
  }

  test("equals floored exact PAV on random weighted series") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 5) {
      val ys = (1 to 40).map(_ =>
        (rnd.nextInt(2000).toLong - 500, rnd.nextInt(5).toLong + 1))
      assert(sparkFit(ys) == pavE6(ys), s"trial $trial")
    }
  }

  test("already-isotonic input is returned (floored) unchanged") {
    val ys = Seq((100L, 1L), (200L, 1L), (300L, 1L), (400L, 1L))
    assert(sparkFit(ys) == Seq(100000000L, 200000000L, 300000000L, 400000000L))
  }

  test("fully reversed input collapses to one pool at the weighted mean") {
    // y_e2 is the POSITIONAL SUM (avg = y_e2 / w): position 3 holds two
    // observations of 200 -> y_e2 = 400, w = 2.
    val ys = Seq((400L, 1L), (300L, 1L), (400L, 2L), (100L, 1L))
    // weighted mean = (400+300+400+100)/5 = 240 -> 240e6
    assert(sparkFit(ys).distinct == Seq(240000000L))
  }

  test("weights matter: a heavy violator drags its pool down") {
    val light = sparkFit(Seq((100L, 1L), (50L, 1L)))
    // nine observations of 50: y_e2 = 450, w = 9 -> pool mean 550/10
    val heavy = sparkFit(Seq((100L, 1L), (450L, 9L)))
    assert(light.distinct == Seq(75000000L))
    assert(heavy.distinct == Seq(55000000L))
  }

  test("output is monotone non-decreasing on every random series") {
    val rnd = new scala.util.Random(77)
    val ys = (1 to 60).map(_ => (rnd.nextInt(1000).toLong, 1L))
    val fit = sparkFit(ys)
    assert(fit == fit.sorted)
  }
}
