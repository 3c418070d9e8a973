package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Lineage.CutOps

/** Distributed greedy graph coloring — Jones-Plassmann (1993), the
  * parallelization of sequential greedy coloring by random priorities:
  * each round, every uncolored node whose priority beats ALL its
  * uncolored neighbors colors itself with the smallest color its
  * already-colored neighbors have not used (first-fit / mex). Nodes
  * with independent priorities color concurrently without conflicts,
  * and the expected round count is O(log n / log log n) on bounded-
  * degree graphs. The scheduling primitive: a proper coloring IS a
  * conflict-free batching (same-color nodes never share an edge, so a
  * per-color sweep can update them all in parallel) — the step before
  * any batched graph mutation at 100 TB.
  *
  * Determinism (the oracle contract): the paper's random priorities
  * are replaced by the 48-bit md5 of the node id with the id itself as
  * tiebreak — a total order both engines derive identically, so the
  * local-maximum set, every mex, and therefore the entire coloring are
  * bit-exact under any partitioning. The loop is count-converged
  * (uncolored set empties), never fixed-round.
  *
  * Scale shape per round: one both-uncolored edge restriction (two
  * node-keyed semi-ish joins), one neighbor-max anti-join for the
  * local maxima, one colored-neighbor collect for the mex (row-local
  * array arithmetic, no UDF), all sharing the node key; round frames
  * are lineage-cut so plan depth stays constant.
  */
object Coloring {

  /** Color the undirected graph; returns (node, color) with color a
    * dense-from-0 first-fit INT. Self-loops dropped, orientation and
    * duplicates tolerated. */
  def jonesPlassmann(edges: DataFrame, maxRounds: Int = 256): DataFrame = {
    val und = edges.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
    val sym = und.select(col("u").as("s"), col("v").as("d"))
      .union(und.select(col("v").as("s"), col("u").as("d")))
      .cutLineage()
    var un = sym.select(col("s").as("node")).distinct()
      .withColumn("pr", expr(
        "CAST(conv(substring(md5(CAST(node AS STRING)), 1, 12), 16, 10) AS BIGINT)"))
      .cutLineage()
    var colored: DataFrame = null
    var round = 0
    var remaining = un.count()
    while (remaining > 0) {
      round += 1
      require(round <= maxRounds,
        s"jonesPlassmann: $remaining nodes uncolored after $maxRounds " +
          "rounds — raise maxRounds")
      // a node is blocked if some UNCOLORED neighbor outranks it
      val blocked = sym
        .join(un.select(col("node").as("s"), col("pr").as("prs")), Seq("s"))
        .join(un.select(col("node").as("d"), col("pr").as("prd")), Seq("d"))
        .filter(col("prd") > col("prs") ||
          (col("prd") === col("prs") && col("d") > col("s")))
        .select(col("s").as("node")).distinct()
      val lm = un.join(blocked, Seq("node"), "left_anti").select("node")
      // mex over already-colored neighbors (first round: no one colored)
      val newly = (if (colored == null) {
        lm.withColumn("used", expr("CAST(array() AS ARRAY<INT>)"))
      } else {
        val nbColors = sym.join(lm.select(col("node").as("s")), Seq("s"))
          .join(colored.select(col("node").as("d"), col("color")), Seq("d"))
          .groupBy(col("s").as("node"))
          .agg(collect_set("color").as("used"))
        lm.join(nbColors, Seq("node"), "left")
          .withColumn("used",
            coalesce(col("used"), expr("CAST(array() AS ARRAY<INT>)")))
      }).withColumn("color", expr(
        "filter(sequence(0, size(used)), i -> NOT array_contains(used, i))[0]"))
        .select("node", "color")
        .cutLineage()
      // colored stays an UNCUT union of the per-round cut frames: its
      // lineage depth is the (O(log n)) round count over materialized
      // leaves — one checkpoint per round instead of two.
      colored = if (colored == null) newly else colored.unionByName(newly)
      un = un.join(newly.select("node"), Seq("node"), "left_anti").cutLineage()
      remaining = un.count()
    }
    if (colored == null)
      edges.sparkSession.range(0)
        .select(lit(0L).as("node"), lit(0).as("color"))
    else colored
  }
}
