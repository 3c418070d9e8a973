package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) regression per series — the
  * calibration fit (Zadrozny-Elkan style score calibration, dose-
  * response curves, monotone trend extraction) computed through the
  * MINIMAX identity instead of the sequential pool-adjacent-violators
  * sweep: the weighted least-squares isotonic fit at position i is
  *
  *   fit_i = max_{j <= i} min_{l >= i} weightedAvg(y_j .. y_l)
  *
  * (Robertson-Wright-Dykstra, Order Restricted Statistical Inference,
  * Thm 1.4.4). PAV is inherently sequential (each pool merge depends
  * on the previous); the minimax form is two window passes over the
  * O(n^2) interval-average frame — embarrassingly parallel and, for a
  * SERIES fit (n = days, not rows), span-bounded: the corpus changes
  * the daily sums, never the pair count.
  *
  * Determinism discipline: interval averages quantize to integer
  * micro-units ONCE — av_e6(j,l) = (1e6 * cents(j..l)) div count(j..l)
  * on exact BIGINT prefix sums — and the max-of-suffix-min runs over
  * those integers, so the whole fit is BIGINT-exact in any engine and
  * any partitioning. Monotonicity survives quantization structurally:
  * as i grows, the max ranges over more j and the min over fewer l,
  * so fit_i can only rise — no float epsilon can break the order. And
  * because floor commutes with min and max (both are monotone maps),
  *   max_j min_l floor(1e6 * av) = floor(1e6 * max_j min_l av),
  * the quantized fit is EXACTLY the floored exact-rational PAV fit —
  * not an approximation (IsotonicSpec pins equality against an
  * exact-BigInt-rational in-JVM PAV).
  */
object Isotonic {

  /** Fit per-key isotonic regression of `y_e2` (integer cent-ish
    * micro-values) weighted by `w` over the order column `pos`.
    * Input: (key, pos, y_e2, w) — one row per position. Output:
    * (key, pos, fit_e6) with fit_e6 non-decreasing in pos per key. */
  def fitE6(series: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("key").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = series
      .withColumn("ps", sum("y_e2").over(wOrd))
      .withColumn("pc", sum("w").over(wOrd))
      .select(col("key"), col("pos"),
        col("ps"), col("pc"),
        (col("ps") - col("y_e2")).as("ps0"),
        (col("pc") - col("w")).as("pc0"))
    // interval averages av_e6(j, l) for every j <= l, from prefix sums
    val j = pre.select(col("key"), col("pos").as("j"),
      col("ps0").as("psj"), col("pc0").as("pcj"))
    val l = pre.select(col("key"), col("pos").as("l"),
      col("ps").as("psl"), col("pc").as("pcl"))
    // FLOOR division, not Spark's truncate-toward-zero `div`: y may be
    // negative, and the floor-commutes-with-minimax identity needs a
    // true floor. (num - pmod(num, den)) is exactly divisible, so the
    // truncating div returns the exact floored quotient — all BIGINT.
    val pairs = j.join(l, Seq("key")).filter(col("j") <= col("l"))
      .withColumn("av_e6", expr(
        "(1000000 * (psl - psj) - pmod(1000000 * (psl - psj), pcl - pcj)) " +
          "div (pcl - pcj)"))
      .select("key", "j", "l", "av_e6")
    // m(j, i) = min over l >= i of av_e6(j, l): suffix min per (key, j)
    val wSuf = Window.partitionBy("key", "j")
      .orderBy(col("l").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = pairs.withColumn("m", min("av_e6").over(wSuf))
      .select(col("key"), col("j"), col("l").as("pos"), col("m"))
    // fit(i) = max over j <= i of m(j, i): rows already satisfy j <= pos
    m.groupBy("key", "pos").agg(max("m").as("fit_e6"))
  }
}
