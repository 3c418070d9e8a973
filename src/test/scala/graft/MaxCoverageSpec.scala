package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MaxCoverage

/** Greedy max-coverage (operators/MaxCoverage) — exact agreement with
  * an in-JVM greedy replay, the submodular structure (non-increasing
  * gains), early stop, and the (1-1/e) guarantee vs the brute-force
  * optimum on a small instance. */
class MaxCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def localGreedy(
      inc: Seq[(Long, String)], k: Int): Seq[(Int, Long, Long, Long)] = {
    val sets = inc.distinct.groupBy(_._1).map { case (i, xs) =>
      i -> xs.map(_._2).toSet }
    var covered = Set.empty[String]
    val out = Seq.newBuilder[(Int, Long, Long, Long)]
    var stop = false
    (1 to k).foreach { r =>
      if (!stop) {
        val (item, gain) = sets.keys.toSeq.sorted
          .map(i => i -> (sets(i) -- covered).size)
          .maxBy { case (i, g) => (g.toLong, -i) }
        if (gain == 0) stop = true
        else {
          covered ++= sets(item)
          out += ((r, item, gain.toLong, covered.size.toLong))
        }
      }
    }
    out.result()
  }

  private def sparkGreedy(
      inc: Seq[(Long, String)], k: Int): Seq[(Int, Long, Long, Long)] =
    MaxCoverage.greedy(inc.toDF("item", "element"), k)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("matches the in-JVM greedy replay on random incidences") {
    val rnd = new scala.util.Random(41)
    val inc = (1 to 500).map(_ =>
      (rnd.nextInt(20).toLong, s"e${rnd.nextInt(80)}"))
    assert(sparkGreedy(inc, 8) == localGreedy(inc, 8))
  }

  test("gains are non-increasing (submodularity of the greedy path)") {
    val rnd = new scala.util.Random(13)
    val inc = (1 to 400).map(_ =>
      (rnd.nextInt(15).toLong, s"e${rnd.nextInt(60)}"))
    val gains = sparkGreedy(inc, 10).map(_._3)
    assert(gains == gains.sorted.reverse)
  }

  test("stops early once the universe is covered") {
    val inc = Seq((1L, "a"), (1L, "b"), (2L, "b"), (2L, "c"), (3L, "a"))
    val got = sparkGreedy(inc, 10)
    assert(got.length < 10)
    assert(got.last._4 == 3L) // a, b, c all covered
  }

  test("(1-1/e) guarantee vs the brute-force optimum at k = 3") {
    val rnd = new scala.util.Random(7)
    val inc = (1 to 200).map(_ =>
      (rnd.nextInt(10).toLong, s"e${rnd.nextInt(40)}"))
    val sets = inc.distinct.groupBy(_._1)
      .map { case (i, xs) => i -> xs.map(_._2).toSet }
    val best = sets.keys.toSeq.combinations(3)
      .map(c => c.map(sets).reduce(_ ++ _).size).max
    val greedy = sparkGreedy(inc, 3).last._4
    assert(greedy.toDouble >= (1 - 1 / math.E) * best)
  }

  test("tie on gain picks the least item") {
    val inc = Seq((5L, "a"), (5L, "b"), (2L, "c"), (2L, "d"), (9L, "e"))
    assert(sparkGreedy(inc, 1).head._2 == 2L)
  }

  test("budgeted greedy: ratio picks, affordability, and budget stop match the replay") {
    val rnd = new scala.util.Random(19)
    val inc = (1 to 400).map(_ =>
      (rnd.nextInt(12).toLong, s"e${rnd.nextInt(70)}"))
    val costs = (0L to 11L).map(i => i -> (10L + (i * 7) % 40)).toMap
    val budget = 90L
    // in-JVM replay of the same ppm-quantized cost-benefit greedy
    def replay(): Seq[(Long, Long, Long)] = {
      val sets = inc.distinct.groupBy(_._1)
        .map { case (i, xs) => i -> xs.map(_._2).toSet }
      var covered = Set.empty[String]; var bud = budget
      val out = Seq.newBuilder[(Long, Long, Long)]
      var stop = false
      (1 to 12).foreach { _ =>
        if (!stop) {
          val cand = sets.keys.toSeq
            .filter(i => costs(i) <= bud)
            .map { i =>
              val g = (sets(i) -- covered).size.toLong
              (1000000L * g / costs(i), g, -i)
            }.filter(_._2 > 0)
          if (cand.isEmpty) stop = true
          else {
            val (_, g, ni) = cand.max
            val i = -ni
            covered ++= sets(i); bud -= costs(i)
            out += ((i, g, bud))
          }
        }
      }
      out.result()
    }
    val got = MaxCoverage.greedyBudgeted(inc.toDF("item", "element"),
        costs.toSeq.toDF("item", "cost"), budget, maxPicks = 12)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2),
        r.getLong(r.fieldIndex("budget_left")))).toSeq
    assert(got == replay())
    assert(got.map(p => costs(p._1)).sum <= budget)
  }

  test("facilityGreedy: hand-checkable trajectory, ties to least item, early stop") {
    import spark.implicits._
    // points 1..4; candidates 10 (covers 1,2 well), 20 (covers 3,4 well),
    // 30 (covers everything a bit). Self-less toy graph.
    val sims = Seq(
      (1L, 10L, 9L), (2L, 10L, 8L), (3L, 10L, 1L),
      (3L, 20L, 9L), (4L, 20L, 7L),
      (1L, 30L, 5L), (2L, 30L, 5L), (3L, 30L, 5L), (4L, 30L, 5L)
    ).toDF("x", "item", "sim")
    val got = MaxCoverage.facilityGreedy(sims, 5).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // round 1: gains — 10 -> 18, 20 -> 16, 30 -> 20: pick 30 (obj 20)
    // round 2: 10 -> (9-5)+(8-5) = 7; 20 -> (9-5)+(7-5) = 6: pick 10 (obj 27)
    // round 3: 20 -> 4+2 = 6: pick 20 (obj 33)
    // round 4: nothing improves -> stop
    assert(got == Seq((1, 30L, 20L, 20L), (2, 10L, 7L, 27L), (3, 20L, 6L, 33L)))
    // submodularity sanity: per-round gains never increase
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
  }
}
