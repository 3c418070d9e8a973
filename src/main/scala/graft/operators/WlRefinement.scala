package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Lineage.CutOps

/** Weisfeiler-Lehman color refinement (1-WL; Weisfeiler & Lehman 1968,
  * Shervashidze et al.'s WL graph kernels, the expressiveness bound of
  * message-passing GNNs): iteratively relabel every node with a hash
  * of (own label, SORTED multiset of neighbor labels). After k rounds,
  * two nodes share a color only if their k-hop neighborhood structure
  * is identical — the canonical cheap structural signature for graph
  * fingerprinting, isomorphism screening, and GNN feature design
  * (what a GNN can distinguish, 1-WL distinguishes).
  *
  * Determinism across engines is the whole trick: the multiset
  * serializes as its SORTED comma-joined string, the relabel is
  * `md5(lbl || ':' || sorted-neighbors)`, and initial labels are
  * degrees as strings — every piece is bit-identical in Spark and
  * DuckDB, so the color partition (and the md5 strings themselves)
  * must match exactly.
  *
  * Scale shape: each round is one edge-to-label hash join + one
  * `collect_list` aggregate keyed by node — linear in edges, k
  * CONSTANT rounds, lineage cut per round. The sort is per-node over
  * a degree-sized array (`sort_array`, row-local), never a global
  * sort. Heavy-degree hubs cost their degree in one row — the same
  * skew profile as any neighborhood aggregate.
  */
object WlRefinement {

  /** (node, color) after `rounds` refinements over the UNDIRECTED
    * graph of `edges` (symmetrized here; self-loops dropped).
    * Round-0 color = degree as a string. */
  def colors(edges: DataFrame, rounds: Int, src: String = "src",
      dst: String = "dst"): DataFrame = {
    require(rounds >= 0)
    val gc = new Lineage.RoundGc(edges.sparkSession)
    val sym = edges.select(col(src).as("s"), col(dst).as("d"))
      .filter(col("s") =!= col("d"))
      .union(edges.select(col(dst), col(src)))
      .distinct().cutLineage()
    var lbl = sym.groupBy(col("s").as("node"))
      .agg(count(lit(1)).cast("string").as("lbl")).cutLineage()
    (1 to rounds).foreach { _ =>
      val neigh = sym
        .join(lbl.select(col("node").as("s"), col("lbl").as("nl")),
          Seq("s"))
        .groupBy(col("d").as("node"))
        .agg(concat_ws(",", sort_array(collect_list(col("nl"))))
          .as("ns"))
      lbl = lbl.join(neigh, Seq("node"))
        .select(col("node"),
          md5(concat(col("lbl"), lit(":"), col("ns"))).as("lbl"))
        .cutLineage()
      gc.endRound()
    }
    lbl.select(col("node"), col("lbl").as("color"))
  }
}
