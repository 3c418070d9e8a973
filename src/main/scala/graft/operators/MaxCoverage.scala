package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Lineage.CutOps

/** Greedy maximum-coverage selection — the submodular data-selection
  * primitive (Nemhauser-Wolsey-Fisher 1978: the greedy pick is a
  * (1 - 1/e)-approximation, and that bound is tight): from a universe
  * of (item, element) incidences, pick k items that together cover the
  * most distinct elements, one argmax-of-marginal-gain per round. This
  * is the coverage-flavored complement of the distance-flavored
  * diversity selectors already shipped (k-center keeps far-apart
  * points, SemDeDup drops near ones): facility-location/coverage
  * selection is how a training-data curator picks a compact subset
  * that still SEES every n-gram/skill/topic (CRAIG-style coreset
  * selection, test-set coverage panels).
  *
  * Determinism: marginal gains are exact integer counts; the argmax is
  * `max(struct(gain, -item))` — least item on ties — folded in-plan as
  * a broadcast 1-row aggregate (no driver scalar steers the plan), so
  * both engines replay the identical greedy trajectory.
  *
  * Scale shape per round: one item-keyed count over the remaining
  * incidence (the argmax folds in-plan as a 1-row broadcast), then one
  * anti-join removing the picked item's elements — TWO passes over the
  * shrinking frame, nothing else. A separate covered-element frame is
  * unnecessary: `remaining` already excludes every covered element, so
  * the picked item's REMAINING elements are exactly the newly covered
  * ones — the running union size is the plain cumulative sum of gains,
  * carried on the same 1-row frame as the pick (round-13 verdict: the
  * old covered-set union/distinct/anti-join bookkeeping tripled the
  * per-round job count for a value a counter already held). Round
  * frames are lineage-cut.
  */
object MaxCoverage {

  /** Pick `k` items greedily from an (item, element) incidence frame.
    * Returns one row per selection round: (rank, item, gain,
    * covered_total) — gain = newly covered elements, covered_total the
    * running union size. Stops early (fewer rows) when everything is
    * covered or items run out. */
  def greedy(incidence: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"greedy: k must be >= 1, got $k")
    val spark = incidence.sparkSession
    val inc = incidence.select(col("item"), col("element"))
      .distinct().cutLineage()
    // 1-row running state: covered_total so far (gains are counts of
    // NEWLY covered elements, see scaladoc — the union size is their sum)
    var state = spark.range(1).select(lit(0L).as("covtot"))
    var chosen = Vector.empty[DataFrame] // 1-row frames
    var remaining = inc
    var done = false
    (1 to k).foreach { rank =>
      if (!done) {
        val picked = broadcast(remaining.groupBy("item")
          .agg(count(lit(1)).as("gain"))
          .crossJoin(broadcast(state))
          .agg(max(struct(col("gain"), (-col("item")).as("ni"),
            col("covtot").as("covtot"))).as("s"))
          .select(col("s.gain").as("gain"), (-col("s.ni")).as("item"),
            (col("s.covtot") + col("s.gain")).as("covered_total")))
          // no candidate left with positive gain -> stop
          .filter(col("gain") > 0)
          .cutLineage()
        if (picked.isEmpty) { done = true }
        else {
          chosen = chosen :+ picked
            .select(lit(rank).as("rank"), col("item"), col("gain"),
              col("covered_total"))
          state = picked.select(col("covered_total").as("covtot"))
          remaining = remaining
            .join(remaining
              .join(picked.select("item"), Seq("item"), "left_semi")
              .select("element"),
              Seq("element"), "left_anti")
            .select("item", "element")
            .cutLineage()
        }
      }
    }
    if (chosen.isEmpty)
      spark.range(0).select(lit(0).as("rank"), lit(0L).as("item"),
        lit(0L).as("gain"), lit(0L).as("covered_total"))
    else chosen.reduce(_ unionByName _)
  }

  /** BUDGETED maximum coverage (Khuller-Moss-Naor 1999): pick items by
    * greedy COST-BENEFIT ratio — argmax of newly-covered-elements per
    * unit cost among items still affordable — until the budget or
    * `maxPicks` runs out. (Khuller et al.'s full (1-1/sqrt(e))
    * guarantee takes max(this, best single affordable item); the
    * ratio-greedy is the workhorse half.) The ratio argmax is
    * quantized to ppm once per candidate (gain*1e6 div cost — ties to
    * higher gain, then least item), so the trajectory is bit-exact on
    * any engine; the remaining budget rides a 1-row frame, in-plan.
    *
    * @param costs one row per item: (item, cost > 0).
    * @return (rank, item, gain, cost, budget_left, covered_total). */
  def greedyBudgeted(incidence: DataFrame, costs: DataFrame,
      budget: Long, maxPicks: Int): DataFrame = {
    require(maxPicks >= 1 && budget > 0)
    val spark = incidence.sparkSession
    val inc = incidence.select(col("item"), col("element"))
      .distinct().cutLineage()
    val cost = costs.select(col("item"), col("cost")).cutLineage()
    // 1-row running state: remaining budget + covered-so-far counter
    // (same no-covered-frame argument as [[greedy]])
    var state = spark.range(1)
      .select(lit(budget).as("bud"), lit(0L).as("covtot"))
    var chosen = Vector.empty[DataFrame]
    var remaining = inc
    var done = false
    (1 to maxPicks).foreach { rank =>
      if (!done) {
        val marg = remaining.groupBy("item")
          .agg(count(lit(1)).as("gain"))
          .join(cost, Seq("item"))
        // cut the 1-row pick: every later frame of this round AND the
        // next round's state reference it — uncut, the round lineages
        // compound into a planner-melting tree (measured: the 12-round
        // catalog query never finished planning before this cut).
        // The argmax struct carries cost/bud/covtot along (cost sits
        // AFTER the unique -item, so it never affects the ordering;
        // bud and covtot are constants from the 1-row state).
        val picked = broadcast(marg.crossJoin(broadcast(state))
          .filter(col("cost") <= col("bud"))
          .agg(max(struct(expr("1000000 * gain div cost").as("ratio"),
            col("gain"), (-col("item")).as("ni"), col("cost").as("cost"),
            col("bud").as("bud"), col("covtot").as("covtot"))).as("s"))
          .select(col("s.gain").as("gain"), (-col("s.ni")).as("item"),
            col("s.cost").as("cost"),
            (col("s.bud") - col("s.cost")).as("budget_left"),
            (col("s.covtot") + col("s.gain")).as("covered_total")))
          .filter(col("gain") > 0)
          .cutLineage()
        if (picked.isEmpty) { done = true }
        else {
          chosen = chosen :+ picked
            .select(lit(rank).as("rank"), col("item"), col("gain"),
              col("cost"), col("budget_left"), col("covered_total"))
          state = picked.select(col("budget_left").as("bud"),
            col("covered_total").as("covtot"))
          remaining = remaining
            .join(remaining
              .join(picked.select("item"), Seq("item"), "left_semi")
              .select("element"),
              Seq("element"), "left_anti")
            .select("item", "element")
            .cutLineage()
        }
      }
    }
    if (chosen.isEmpty)
      spark.range(0).select(lit(0).as("rank"), lit(0L).as("item"),
        lit(0L).as("gain"), lit(0L).as("cost"), lit(0L).as("budget_left"),
        lit(0L).as("covered_total"))
    else chosen.reduce(_ unionByName _)
  }

  /** Greedy FACILITY-LOCATION selection (Lin & Bilmes 2011's exemplar
    * objective: maximize sum_x max_{s in S} sim(x, s)) — the
    * similarity-weighted sibling of [[greedy]]'s set coverage: where
    * max-coverage counts elements seen at all, facility location
    * rewards how WELL each point is represented by its best exemplar,
    * the objective behind exemplar-based corpus summarization. Monotone
    * submodular, so the same greedy argmax carries the (1 - 1/e) bound.
    *
    * `sims` is a SPARSE nonnegative similarity edge list (x, item,
    * sim) — at scale the sparsifier is a blocking pass (LSH buckets:
    * only pairs sharing a bucket carry an edge; everything else
    * contributes 0), which keeps every round one linear pass over |E|
    * instead of the dense n^2 the textbook objective hides. Per round:
    * join edges with the current per-point coverage, sum positive
    * improvements per candidate, 1-row in-plan argmax (ties -> least
    * item), update coverage by greatest(). All BIGINT; round frames
    * lineage-cut (the x_budgeted_coverage planner lesson).
    *
    * @return one row per round: (rank, item, gain, objective_total). */
  def facilityGreedy(sims: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"facilityGreedy: k must be >= 1, got $k")
    val spark = sims.sparkSession
    val e = sims.select(col("x"), col("item"), col("sim"))
      .filter(col("sim") > 0)
      .groupBy("x", "item").agg(max("sim").as("sim"))
      .cutLineage()
    var cur: DataFrame = null // (x, cov) — only points some pick covers
    var chosen = Vector.empty[DataFrame]
    var done = false
    (1 to k).foreach { rank =>
      if (!done) {
        val withCur =
          if (cur == null) e.withColumn("cov", lit(0L))
          else e.join(cur, Seq("x"), "left")
            .select(col("x"), col("item"), col("sim"),
              coalesce(col("cov"), lit(0L)).as("cov"))
        val marg = withCur.groupBy("item")
          .agg(sum(greatest(col("sim") - col("cov"), lit(0L))).as("gain"))
        val picked = broadcast(marg
          .agg(max(struct(col("gain"), (-col("item")).as("ni"))).as("s"))
          .select(col("s.gain").as("gain"), (-col("s.ni")).as("item")))
          .filter(col("gain") > 0)
          .cutLineage()
        if (picked.isEmpty) { done = true }
        else {
          val pickedCov = e
            .join(picked.select("item"), Seq("item"), "left_semi")
            .select(col("x"), col("sim").as("ncov"))
          cur = (if (cur == null) pickedCov.select(col("x"), col("ncov").as("cov"))
            else cur.join(pickedCov, Seq("x"), "full")
              .select(col("x"), greatest(coalesce(col("cov"), lit(0L)),
                coalesce(col("ncov"), lit(0L))).as("cov"))).cutLineage()
          chosen = chosen :+ picked
            .crossJoin(broadcast(
              cur.agg(sum("cov").cast("long").as("objective_total"))))
            .select(lit(rank).as("rank"), col("item"), col("gain"),
              col("objective_total"))
        }
      }
    }
    if (chosen.isEmpty)
      spark.range(0).select(lit(0).as("rank"), lit(0L).as("item"),
        lit(0L).as("gain"), lit(0L).as("objective_total"))
    else chosen.reduce(_ unionByName _)
  }
}
