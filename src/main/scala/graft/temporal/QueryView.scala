package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an AGGREGATE over a JOIN — DBToaster's
  * higher-order delta rule, composed from the two maintenance pieces
  * the repo already proves separately: [[JoinView]]'s counting join
  * delta (ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, signed multiplicities) and
  * [[Rollup]]'s mergeable aggregate state. The key insight that makes
  * the composition one-step: a DISTRIBUTIVE aggregate of a bag view
  * maintains by aggregating the bag DELTA alone —
  *
  *   Δagg(g) = Σ over ΔV rows in group g of (_mult, _mult * value)
  *
  * — so the refresh never materializes the join view at all. State is
  * GROUP-sized (segments, not order-rows); refresh work is DELTA-sized
  * (the join delta, aggregated before it ever hits the state). At
  * 100 TB that is the difference between maintaining a view as large
  * as the fact table and maintaining a few thousand aggregate rows.
  *
  * Honest scope: count and sum only (the distributive aggregates).
  * min/max are NOT incrementally maintainable under deletes without
  * auxiliary per-group structure (a deleted minimum forces a re-scan)
  * — that is DBToaster's restriction too, not an implementation
  * shortcut. Sums use Rollup's integer micro-unit discipline so merge
  * order can never move a ulp. Groups whose bag count reaches zero
  * vanish; negative counts (inconsistent over-delete) drop rather
  * than resurrect, matching JoinView's normalize.
  */
object QueryView {

  private val Mult = "_mult"

  /** Group-level mergeable aggregate state of a (possibly signed) bag:
    * per `groupKeys` row — `n` (signed bag count) and, per value
    * column c, `sum_<c>_e4` (mult-weighted BIGINT micro-units). */
  def aggOfBag(bag: DataFrame, groupKeys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val m = JoinView.withMult(bag)
    val aggs = sum(col(Mult)).as("n") +: valueCols.map(c =>
      sum(col(Mult) * expr(s"CAST(floor($c * 10000 + 0.5) AS BIGINT)"))
        .as(s"sum_${c}_e4"))
    m.groupBy(groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def mergeStates(s: DataFrame, groupKeys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val aggs = sum(col("n")).as("n") +: valueCols.map(c =>
      sum(col(s"sum_${c}_e4")).as(s"sum_${c}_e4"))
    s.groupBy(groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .filter(col("n") > 0)
  }

  /** Initialize: the aggregate of A ⋈ B, stored as mergeable state. */
  def init(a: DataFrame, b: DataFrame, joinKey: Seq[String],
      groupKeys: Seq[String], valueCols: Seq[String]): DataFrame =
    mergeStates(aggOfBag(JoinView.init(a, b, joinKey), groupKeys, valueCols),
      groupKeys, valueCols)

  /** One refresh from both-side deltas: aggregate the JOIN DELTA (the
    * view itself is never built), then fold group-level deltas into
    * the state — untouched groups pass through against a broadcast
    * touched-group set, the JoinView discipline one level up. */
  def applyDeltas(state: DataFrame, aOld: DataFrame, bOld: DataFrame,
      dA: DataFrame, dB: DataFrame, joinKey: Seq[String],
      groupKeys: Seq[String], valueCols: Seq[String]): DataFrame = {
    val dAgg = aggOfBag(JoinView.delta(aOld, bOld, dA, dB, joinKey),
      groupKeys, valueCols)
    val touched = dAgg.select(groupKeys.map(col): _*).distinct()
    val untouched = state.join(broadcast(touched), groupKeys, "left_anti")
    val affected = state.join(broadcast(touched), groupKeys, "left_semi")
    untouched.unionByName(
      mergeStates(affected.unionByName(dAgg), groupKeys, valueCols))
  }
}
