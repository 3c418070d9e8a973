package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mmr

/** MMR greedy re-ranking: the relevance-vs-redundancy trade on
  * hand-checkable candidate sets. */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one query, three candidates; A and B near-duplicates
  private def cand = Seq((1L, 10L, 0.90), (1L, 11L, 0.85), (1L, 12L, 0.50))
    .toDF("q", "c", "rel")
  private def sims = Seq(
    (1L, 10L, 11L, 0.99), (1L, 11L, 10L, 0.99),
    (1L, 10L, 12L, 0.10), (1L, 12L, 10L, 0.10),
    (1L, 11L, 12L, 0.12), (1L, 12L, 11L, 0.12)
  ).toDF("q", "c1", "c2", "sim")

  private def run(k: Int, lam: Double): Seq[(Long, Int, Long)] =
    Mmr.rerank(cand, sims, k, lam)
      .select("q", "rank", "c").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("diversity beats raw relevance past the first pick") {
    // rank 2: B scores .5*.85-.5*.99 < C's .5*.50-.5*.10 — the
    // near-dup of A loses to the distinct candidate
    assert(run(3, 0.5) == Seq((1L, 1, 10L), (1L, 2, 12L), (1L, 3, 11L)))
  }

  test("lambda = 1 reduces to pure relevance order") {
    assert(run(3, 1.0) == Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
  }

  test("k beyond the candidate set returns every candidate once") {
    val got = run(9, 0.5)
    assert(got.map(_._3).toSet == Set(10L, 11L, 12L))
    assert(got.size == 3)
  }

  test("score ties break by least candidate id") {
    val c2 = Seq((7L, 3L, 0.8), (7L, 2L, 0.8)).toDF("q", "c", "rel")
    val s2 = Seq((7L, 2L, 3L, 0.0), (7L, 3L, 2L, 0.0))
      .toDF("q", "c1", "c2", "sim")
    val got = Mmr.rerank(c2, s2, 2, 0.5)
      .select("rank", "c").as[(Int, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, 2L), (2, 3L)))
  }

  test("queries re-rank independently") {
    val c2 = cand.unionByName(
      Seq((2L, 20L, 0.3), (2L, 21L, 0.9)).toDF("q", "c", "rel"))
    val s2 = sims.unionByName(Seq((2L, 20L, 21L, 0.5),
      (2L, 21L, 20L, 0.5)).toDF("q", "c1", "c2", "sim"))
    val got = Mmr.rerank(c2, s2, 1, 0.5)
      .select("q", "c").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 21L)))
  }

  test("rank-1 score is lambda * rel (empty redundancy term)") {
    val r1 = Mmr.rerank(cand, sims, 1, 0.5)
      .select("score").as[Double].collect().head
    assert(math.abs(r1 - 0.45) < 1e-12)
  }
}
