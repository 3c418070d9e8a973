package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Lineage.CutOps

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
  * — the relevance-vs-redundancy greedy that turns a similarity top-N
  * into a DIVERSE top-k: pick the most relevant candidate, then
  * repeatedly the one maximizing
  * `lambda * rel(c) - (1 - lambda) * max_{s in S} sim(c, s)`.
  *
  * The deterministic discipline of the vector catalog applies: both
  * engines compute identical IEEE doubles for rel/sim (index-ordered
  * dot products), the MMR combination is plain IEEE arithmetic on
  * those, and every argmax breaks ties by candidate id — so a DuckDB
  * oracle replaying the same greedy lands on the identical selection.
  *
  * Scale shape: the input is the ALREADY-BOUNDED top-N frame per query
  * (WindowGroupLimit territory) and its N x N pairwise sims; each of
  * the k rounds is one anti-join + one join-aggregate over those
  * bounded frames, and the per-query argmax is a `max(struct(...))`
  * aggregate — partial-aggregating, no windows, no driver loops over
  * data (the k-round loop is over a CONSTANT). Never all-corpus:
  * diversity happens after retrieval, exactly where MMR sits in a real
  * retrieval stack.
  */
object Mmr {

  /** Greedy MMR selection.
    * `cand`: (q, c, rel) — bounded candidates per query with relevance;
    * `sims`: (q, c1, c2, sim) — pairwise sims among each query's
    * candidates, BOTH orientations present;
    * returns (q, rank, c, score) for rank = 1..k, score = the MMR
    * objective at selection time (rank 1 scores lambda * rel: the
    * redundancy term is empty, consistent with the paper). */
  def rerank(cand: DataFrame, sims: DataFrame, k: Int,
      lambda: Double): DataFrame = {
    require(k >= 1 && lambda >= 0 && lambda <= 1)
    val gc = new Lineage.RoundGc(cand.sparkSession)
    def pickTop(scored: DataFrame, rank: Int): DataFrame = scored
      .groupBy("q")
      .agg(max(struct(col("score").as("s"), (-col("c")).as("nc"))).as("t"))
      .select(col("q"), lit(rank).as("rank"), (-col("t.nc")).as("c"),
        col("t.s").as("score"))
    var sel = pickTop(
      cand.select(col("q"), col("c"), (col("rel") * lambda).as("score")),
      1).cutLineage()
    var r = 1
    while (r < k) {
      r += 1
      val remaining = cand.join(
        sel.select(col("q"), col("c")), Seq("q", "c"), "left_anti")
      val scored = remaining
        .join(sel.select(col("q"), col("c").as("c2")), Seq("q"))
        .join(sims.withColumnRenamed("c1", "c"), Seq("q", "c", "c2"))
        .groupBy("q", "c", "rel").agg(max("sim").as("red"))
        .select(col("q"), col("c"),
          (col("rel") * lambda - col("red") * (1 - lambda)).as("score"))
      sel = sel.unionByName(pickTop(scored, r)).cutLineage()
      gc.endRound()
    }
    sel.select(col("q"), col("rank"), col("c"), col("score"))
  }
}
