package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over DataFrame edge lists.
  *
  * The reference pipeline's whole purpose is to materialize a property
  * graph (loaders/neo4j_loader.py builds nodes + relationships so Neo4j
  * can answer graph questions). A user replacing it with this library
  * keeps the edge list as DataFrames — so the graph questions Neo4j
  * would have answered (influence ranking, cohesion, reachability) need
  * first-class distributed implementations here. Everything below is
  * expressed as joins + aggregations over `(src, dst)` edge frames:
  * each round is a fixed number of key-shuffles, lineage is truncated
  * with `localCheckpoint` (swap for `checkpoint` on a cluster with a
  * checkpoint dir), and nothing ever collects node rows to the driver.
  *
  * Companion to [[Components]] (connected components / min-label
  * propagation), which covers the community-extraction side.
  */
object GraphAlgos {

  /** Weighted PageRank over a directed edge list.
    *
    * Semantics (matched exactly by the DuckDB oracle twin in
    * GraphCatalog): ranks start uniform at 1/N; each iteration a node
    * distributes `rank * weight/out_weight` along its out-edges, and
    *
    *   rank' = (1-d)/N + d * (in_contributions + dangling_mass/N)
    *
    * where `dangling_mass` is the summed rank of nodes with no
    * out-edges (their mass is redistributed uniformly, the standard
    * correction — without it total mass leaks and ranks depend on how
    * many sinks the data happens to contain).
    *
    * Scale shape: `outNorm` (edges with pre-divided contribution
    * fractions) is computed ONCE — one groupBy(src) + one join, then
    * localCheckpointed; each iteration after that is one join on `src`
    * + one groupBy(dst) + one broadcast-size aggregate for the dangling
    * mass. Ranks are a node-keyed frame, never driver-side. Lineage is
    * cut every iteration (iterative plans otherwise grow exponentially
    * in the optimizer).
    *
    * @param edges   directed edges with columns (src, dst, weight);
    *                weight must be > 0 (use lit(1.0) for unweighted)
    * @param iters   fixed iteration count (fixed, not convergence-based,
    *                so results are deterministic and oracle-matchable)
    * @param damping damping factor d, conventionally 0.85
    */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val nNodes = nodes.count()
    require(nNodes > 0, "pageRank: empty graph")
    val n = nNodes.toDouble
    // Pre-divide each edge's share of its source's out-mass: the
    // per-iteration join then multiplies by the current rank only.
    val outW = edges.groupBy("src").agg(sum("weight").as("out_w"))
    val outNorm = edges.join(outW, "src")
      .select(col("src"), col("dst"), (col("weight") / col("out_w")).as("share"))
      .localCheckpoint()
    // Dangling nodes (no out-edges) are a property of the GRAPH, not the
    // iteration: resolve the set once; when it's empty (common for
    // aggregated entity graphs) every per-iteration mass probe — a
    // whole Spark job each — is skipped.
    val danglingNodes = nodes
      .join(outW.select(col("src").as("node")), Seq("node"), "left_anti")
      .localCheckpoint()
    val hasDangling = !danglingNodes.isEmpty
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    for (_ <- 1 to iters) {
      // Dangling mass: total rank held by nodes with no out-edges.
      // head() on a 1-row aggregate, not a row collect.
      val dangling =
        if (!hasDangling) 0.0
        else ranks.join(danglingNodes, Seq("node"))
          .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
      val contrib = ranks.join(outNorm, ranks("node") === outNorm("src"))
        .groupBy(outNorm("dst").as("node"))
        .agg(sum(col("rank") * col("share")).as("in_mass"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("in_mass"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Per-node triangle count over an undirected edge list.
    *
    * Uses the degree-orientation algorithm: orient every edge from its
    * lower-degree endpoint to its higher-degree endpoint (ties broken
    * by node id), then count wedges `a->b, a->c` that close with an
    * oriented edge `b->c`. Each triangle is found exactly once, and the
    * wedge count drops from sum(deg^2) to O(m^1.5) — the difference
    * between infeasible and routine on power-law graphs, where the
    * naive self-join explodes on hub nodes.
    *
    * Shape: two shuffles for degrees + orientation, one self-join on
    * the wedge pivot, one join to close the wedge, one explode +
    * groupBy for the per-node counts. No driver-side state.
    *
    * @param edges undirected edges (u, v); self-loops and duplicate /
    *              reversed duplicates are removed here
    * @return (node, n_triangles) — one row per node that closes at
    *         least one triangle
    */
  def trianglesPerNode(edges: DataFrame): DataFrame = {
    val und = edges.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // Orientation: lo = smaller (degree, id), hi = the other endpoint.
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("lo"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("hi"))
      .localCheckpoint()
    // Wedges a->(b,c) from the low-degree pivot, ordered so each
    // unordered pair is generated once; closed iff (b,c) or (c,b) is
    // an oriented edge — membership via a semi-join-shaped inner join.
    val e1 = oriented.select(col("lo").as("a"), col("hi").as("b"))
    val e2 = oriented.select(col("lo").as("a"), col("hi").as("c"))
    val wedges = e1.join(e2, Seq("a")).filter(col("b") < col("c"))
    val closing = oriented.select(
      least(col("lo"), col("hi")).as("b"), greatest(col("lo"), col("hi")).as("c"))
    val tris = wedges.join(closing, Seq("b", "c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Minimum hop distance from a source node over an undirected edge
    * list, bounded at `maxHops` (unreached nodes are absent from the
    * result) — the DataFrame form of Cypher's
    * `shortestPath((a)-[*..k]-(b))` that reference users would have
    * asked Neo4j for.
    *
    * Frontier-based BFS: each round expands only the nodes discovered
    * in the previous round (one join + one groupBy + one anti-join),
    * so total work is O(edges touched), not O(rounds * nodes). The
    * frontier and the settled set are localCheckpointed per round.
    *
    * @param edges undirected edges (s, d)
    * @param source source node id (must match the edge id type)
    */
  def bfsHops(edges: DataFrame, source: Any, maxHops: Int = 6): DataFrame = {
    val sym = edges.select(col("s"), col("d"))
      .union(edges.select(col("d").as("s"), col("s").as("d")))
      .filter(col("s") =!= col("d"))
      .distinct()
      .localCheckpoint()
    var settled = sym.sparkSession.range(1).select(
      lit(source).cast(sym.schema("s").dataType).as("node"), lit(0).as("hops"))
      .localCheckpoint()
    var frontier = settled
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = frontier.join(sym, frontier("node") === sym("s"))
        .select(sym("d").as("node")).distinct()
        .join(settled, Seq("node"), "left_anti")
        .withColumn("hops", lit(hop))
        .localCheckpoint()
      settled = settled.unionByName(next).localCheckpoint()
      frontier = next
    }
    settled
  }
}
