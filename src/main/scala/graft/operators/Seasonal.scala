package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition (the moving-average
  * method behind STL's outer loop; Kendall & Stuart): an evenly-spaced
  * counter series splits into
  *
  *   y = trend (centered moving average)
  *     + seasonal (per-phase mean of the detrended series)
  *     + residual
  *
  * — the load-shape / capacity-planning primitive: "what is this
  * metric's daily rhythm once growth is removed, and which hours sit
  * off it?"
  *
  * Integer-exact cross-engine discipline (the w9 trick, extended):
  * inputs are integer counts, the trend is floor((window_sum *
  * 10000.0) / window_count) — an exact double product under 2^53,
  * one correctly-rounded IEEE division, one floor: bit-identical in
  * any engine, no running-average retraction drift, no float
  * accumulation order. Gaps in the series are handled by the RANGE
  * frame (missing slots shrink count, not misalign the window), and
  * series edges keep their shrunken windows (documented classical
  * alternative drops p/2 at each end).
  *
  * Scale shape: ONE ordered range window over the series + one grouped
  * aggregate. A metric series is tiny relative to the events that
  * produce it (the groupBy upstream is the heavy reduction); for a
  * 100 TB multi-metric deployment, partition the window BY METRIC —
  * the global-order single-partition window here is the single-series
  * special case, not the design.
  */
object Seasonal {

  /** Adds trend/residual columns to an integer series (slot, y):
    * phase = slot % period, trend_e4/resid_e4 in 1e-4 units. The
    * centered window spans `half` slots each side in RANGE terms. */
  def detrend(series: DataFrame, period: Int, half: Int): DataFrame = {
    val w = Window.orderBy(col("slot")).rangeBetween(-half, half)
    series
      .withColumn("phase", col("slot") % period)
      .withColumn("_sum", sum("y").over(w))
      .withColumn("_cnt", count(lit(1)).over(w))
      .withColumn("trend_e4",
        expr("CAST(floor((_sum * 10000.0) / _cnt) AS BIGINT)"))
      .withColumn("resid_e4", col("y") * 10000L - col("trend_e4"))
      .drop("_sum", "_cnt")
  }

  /** Per-phase seasonal index: mean of the detrended series, floor'd
    * to 1e-4 units — (phase, n_slots, seasonal_e4). */
  def seasonalIndex(detrended: DataFrame): DataFrame = detrended
    .groupBy("phase")
    .agg(count(lit(1)).as("n_slots"),
      expr("CAST(floor(CAST(sum(resid_e4) AS DOUBLE) / count(1)) AS BIGINT)")
        .as("seasonal_e4"))
}
