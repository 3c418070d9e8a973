package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) — the classic dominance query (Borzsonyi,
  * Kossmann, Stocker 2001): keep every row no other row dominates,
  * where s dominates r iff s is <= r on ALL criteria and < on at least
  * one (all criteria oriented as MINIMIZE; negate a column to
  * maximize). The multi-objective "best tradeoffs" operator — price vs
  * size, quality vs length, relevance vs cost — and the result SET is
  * unique (ties on every dim are mutually non-dominating: both stay).
  *
  * The 2-criteria case — the overwhelmingly common one — needs NO
  * dominance join at all: sort-free window algebra does it exactly.
  * With rx = dense_rank of x ascending (per group),
  *
  *   dominated(r) <=> min y over { x' < x }  <= y(r)     // strict-x
  *                 OR min y over { x' = x }  <  y(r)     // same-x
  *
  * — the first window is a running min over rx RANGE .. 1 PRECEDING
  * (rank-range = strictly smaller x, correct for DOUBLE x too, where a
  * value-range frame could not be), the second a per-(group, x) min.
  * Two window passes + a dense_rank, all whole-stage codegen, one
  * shuffle by group: linear in the data, never the O(n^2)
  * block-nested-loop the naive formulation pays. The DuckDB oracle
  * deliberately uses the INDEPENDENT NOT EXISTS dominance definition,
  * so a green row proves the window algebra IS dominance, not a shared
  * reformulation.
  *
  * Scale shape: one hash exchange on the group key, windows within
  * partitions; ungrouped use means a single-partition window — shard
  * first (grid cells, then merge local skylines) if an ungrouped
  * 100 TB skyline ever matters.
  */
object Skyline {

  /** Rows of `df` on the per-group 2-D Pareto frontier, both criteria
    * MINIMIZED. Pass `lit(1)` as `group` for a global skyline. */
  def pareto2d(df: DataFrame, group: Column, x: Column, y: Column)
      : DataFrame = {
    val g = df.withColumn("_sky_g", group)
      .withColumn("_sky_x", x).withColumn("_sky_y", y)
    val byX = Window.partitionBy("_sky_g").orderBy(col("_sky_rx"))
    val ranked = g.withColumn("_sky_rx",
      dense_rank().over(Window.partitionBy("_sky_g")
        .orderBy(col("_sky_x"))))
    ranked
      .withColumn("_sky_prev",
        min("_sky_y").over(byX
          .rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn("_sky_same",
        min("_sky_y").over(
          Window.partitionBy(col("_sky_g"), col("_sky_x"))))
      .filter((col("_sky_prev").isNull ||
          col("_sky_prev") > col("_sky_y")) &&
        col("_sky_same") === col("_sky_y"))
      .drop("_sky_g", "_sky_x", "_sky_y", "_sky_rx", "_sky_prev",
        "_sky_same")
  }
}
