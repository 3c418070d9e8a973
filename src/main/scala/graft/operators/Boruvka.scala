package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Lineage.CutOps

/** Boruvka minimum spanning forest — the textbook DISTRIBUTED MST
  * (Boruvka 1926; the parallel formulation in JaJa and every
  * Pregel/GraphX MST since): log n rounds of "every component hooks
  * its lightest incident edge, then contracts".
  *
  * Determinism: edge weights are made a TOTAL order by ranking on
  * (w, a, b) with (a, b) the canonical (least, greatest) orientation —
  * under a total order the MSF is UNIQUE (the cut property picks one
  * lightest edge per cut, never a choice), so a DuckDB oracle can
  * replay the same rounds and must land on the identical forest.
  *
  * Per round, all in DataFrame algebra (the [[Components]] shuffle
  * discipline — hash joins + aggregates, per-round lineage cuts):
  *  1. **Cross edges**: project edges to component space via two
  *     comp-map joins; drop internal edges.
  *  2. **Hook**: each component picks its min incident edge with ONE
  *     `min(struct(w, a, b, other))` aggregate — partial-aggregating
  *     (map-side combine), no window, no skew: the classic
  *     min-edge-per-star step.
  *  3. **Contract**: the hook graph parent(c) = other is functional,
  *     and under a total order its only cycles are MUTUAL pairs
  *     (the lightest edge of the merged pair is picked from both
  *     sides), so 2-cycles resolve to roots by least-id and pointer
  *     JUMPING (parent := parent(parent), depth halves per round)
  *     flattens every hook tree in <= log2 rounds — bounded by
  *     `maxJump`, loud on overrun, never truncated.
  *  4. Chosen edges join the forest; components relabel through the
  *     root map and the round repeats until no cross edges remain
  *     (`maxRounds` guard, loud).
  *
  * Scale shape: components at least HALVE per round (every component
  * hooks), so rounds are log-bounded; the heavy per-round frames are
  * the two edge-to-comp-map joins — linear in surviving cross edges,
  * which shrink as trees close. Nothing driver-sized exists anywhere:
  * the comp map and forest stay distributed, convergence probes are
  * aggregate-only `isEmpty`s.
  */
object Boruvka {

  /** MSF edges (a, b, w, tree): (a, b) the canonical orientation,
    * `tree` = the MINIMUM node id of the containing tree. Multi-edges
    * collapse to their lightest (w, a, b)-ranked representative first;
    * self-loops drop. Isolated nodes (none here — every node arrives
    * on an edge) would simply be absent. */
  def minimumSpanningForest(edges: DataFrame, src: String = "src",
      dst: String = "dst", weight: String = "w", maxRounds: Int = 16,
      maxJump: Int = 32): DataFrame = {
    val gc = new Lineage.RoundGc(edges.sparkSession)
    val canon = edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"), col(weight).as("w"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(min("w").as("w"))
      .cutLineage()

    var comp = canon.select(col("a").as("node"))
      .union(canon.select(col("b"))).distinct()
      .withColumn("c", col("node")).cutLineage()
    var forest = Vector.empty[DataFrame]
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      val ce = canon
        .join(comp.select(col("node").as("a"), col("c").as("ca")), Seq("a"))
        .join(comp.select(col("node").as("b"), col("c").as("cb")), Seq("b"))
        .filter(col("ca") =!= col("cb"))
        .cutLineage()
      if (ce.isEmpty) done = true
      else {
        val pick = ce.select(col("ca").as("c"),
            struct(col("w"), col("a"), col("b"), col("cb").as("other"))
              .as("e"))
          .union(ce.select(col("cb"),
            struct(col("w"), col("a"), col("b"), col("ca").as("other"))))
          .groupBy("c").agg(min("e").as("e"))
          .select(col("c"), col("e.w").as("w"), col("e.a").as("a"),
            col("e.b").as("b"), col("e.other").as("p"))
          .cutLineage()
        forest :+= pick.select("a", "b", "w").distinct().cutLineage()
        // 2-cycle resolution: the merged pair's shared min edge makes
        // parent mutual; the lesser id becomes the root.
        var par = pick.select(col("c"), col("p"))
          .join(pick.select(col("c").as("p"), col("p").as("pp")), Seq("p"))
          .select(col("c"), when(col("pp") === col("c"),
            least(col("c"), col("p"))).otherwise(col("p")).as("p"))
          .cutLineage()
        var j = 0
        var flat = false
        while (j < maxJump && !flat) {
          // two pointer hops per materialization (depth^(1/4) per
          // round), with the movement flag computed IN-plan so the
          // convergence probe is a scan of the cached cut, not a
          // recomputed self-join — job count is what dominates here,
          // the frames are component-sized
          val once = par
            .join(par.select(col("c").as("p"), col("p").as("pp")),
              Seq("p"), "left")
            .select(col("c"), col("p").as("p0"),
              coalesce(col("pp"), col("p")).as("p"))
          val nxt = once
            .join(once.select(col("c").as("p"), col("p").as("pp")),
              Seq("p"), "left")
            .select(col("c"), coalesce(col("pp"), col("p")).as("p"),
              (coalesce(col("pp"), col("p")) =!= col("p0")).as("moved"))
            .cutLineage()
          flat = nxt.filter(col("moved")).isEmpty
          par = nxt.drop("moved")
          j += 1
          gc.endRound()
        }
        require(flat, s"Boruvka: hook trees not flat in $maxJump jumps")
        comp = comp.join(par, Seq("c"), "left")
          .select(col("node"), coalesce(col("p"), col("c")).as("c"))
          .cutLineage()
      }
      round += 1
      gc.endRound()
    }
    require(done, s"Boruvka: forest not closed in $maxRounds rounds")
    // canonical tree label = min member id, via one aggregate + remap
    val treeOf = comp.groupBy("c").agg(min("node").as("tree"))
    val labels = comp.join(treeOf, Seq("c")).select("node", "tree")
    forest.reduceOption(_ unionByName _)
      .getOrElse(canon.limit(0))
      .join(labels.withColumnRenamed("node", "a"), Seq("a"))
      .select(col("a"), col("b"), col("w"), col("tree"))
  }
}
