package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Lineage.CutOps

/** Densest-subgraph extraction by parallel greedy peeling — Charikar's
  * greedy 2-approximation made distributed the Bahmani-Kumar-
  * Vassilvitskii way ("Densest Subgraph in Streaming and MapReduce",
  * VLDB 2012): instead of removing ONE minimum-degree node per step
  * (inherently sequential, O(n) rounds), each round removes EVERY node
  * whose degree is at most (1+eps) times the current average — the
  * graph loses a constant fraction of nodes per round, so the peel
  * finishes in O(log n) rounds and the best intermediate subgraph is a
  * 2(1+eps)-approximation of the maximum-density subgraph. With
  * eps = 1/2 the removal test "deg <= (3/2) * (2m/n)" becomes the pure
  * integer predicate deg * n <= 3 * m: no float ever enters the loop,
  * so every round's survivor set — and therefore the whole round
  * history — is bit-identical on any engine.
  *
  * This is the community-CORE extractor next to the boundary-style
  * operators (kCore keeps everything above a fixed degree, kTruss
  * everything above a fixed edge support; this finds the globally
  * densest pocket with no threshold to guess).
  *
  * Scale shape per round: one node-keyed degree aggregate, the (n, m)
  * stats folded in-plan as a broadcast 1-row aggregate (never a driver
  * scalar in the predicate), two semi-joins to restrict the edge set.
  * Round frames are lineage-cut (stats reset), so plan depth and
  * checkpoint footprint stay constant across the O(log n) rounds; the
  * only driver values are the loop-control edge counts.
  */
object DensestSubgraph {

  /** Peel to the empty graph and return the full round history:
    * (round, n_nodes, n_edges, density_ppm, is_best) — one row per
    * round that still had edges, `is_best` marking the round whose
    * subgraph maximizes m/n (exact cross-multiplied comparison, ties
    * to the earliest round). Input edges may be directed/duplicated;
    * self-loops are dropped. */
  def peelRounds(edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    var cur = edges.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
      .cutLineage()
    var history = Vector.empty[DataFrame]
    var r = 0
    var m = cur.count()
    while (m > 0) {
      require(r < maxRounds,
        s"densestSubgraph: still $m edges after $maxRounds peel rounds — " +
          "raise maxRounds (the O(log n) bound should make this unreachable)")
      val deg = cur.select(col("u").as("x"))
        .union(cur.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("deg"))
      val stats = broadcast(
        deg.agg(count(lit(1)).as("n"), (sum("deg") / 2).cast("long").as("m")))
      history = history :+ stats.select(lit(r).as("round"),
        col("n").as("n_nodes"), col("m").as("n_edges"))
      val survivors = deg.crossJoin(stats)
        .filter(col("deg") * col("n") > lit(3L) * col("m"))
        .select("x")
        .cutLineage()
      val next = cur
        .join(survivors.select(col("x").as("u")), Seq("u"), "left_semi")
        .join(survivors.select(col("x").as("v")), Seq("v"), "left_semi")
        .select("u", "v")
        .cutLineage()
      m = next.count()
      cur = next
      r += 1
    }
    if (history.isEmpty)
      return edges.sparkSession.range(0).select(
        lit(0).as("round"), lit(0L).as("n_nodes"), lit(0L).as("n_edges"),
        lit(0L).as("density_ppm"), lit(0).as("is_best"))
    val hist = history.reduce(_ unionByName _).cutLineage()
    val other = hist.select(col("round").as("r2"),
      col("n_nodes").as("n2"), col("n_edges").as("m2"))
    val best = broadcast(hist.join(other,
        (col("m2") * col("n_nodes") > col("n_edges") * col("n2")) ||
        (col("m2") * col("n_nodes") === col("n_edges") * col("n2") &&
          col("r2") < col("round")),
        "left_anti")
      .select(col("round").as("best_round")))
    hist.crossJoin(best)
      .withColumn("density_ppm", expr("1000000 * n_edges div n_nodes"))
      .withColumn("is_best",
        when(col("round") === col("best_round"), 1).otherwise(0))
      .select("round", "n_nodes", "n_edges", "density_ppm", "is_best")
  }
}
