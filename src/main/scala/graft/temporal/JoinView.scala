package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a JOIN view — the counting algorithm /
  * delta rules of DBToaster and Materialize, re-expressed in DataFrame
  * algebra: V = A ⋈ B is kept as a bag with an explicit `_mult`
  * multiplicity column, updates arrive as deltas (+n inserts, -n
  * deletes in the SAME frame), and one refresh applies
  *
  *   ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * with multiplicities MULTIPLYING across the join and SUMMING on
  * merge; rows whose multiplicity reaches zero vanish. The cross term
  * ΔA ⋈ ΔB is what makes simultaneous both-side updates exact — drop
  * it and an insert landing in the same refresh as its partner's
  * insert is lost. Deletes need no tombstone machinery: a delete is a
  * row with negative multiplicity flowing through the same algebra.
  *
  * Scale shape: every term is sized by a DELTA (the view is never
  * recomputed), and [[applyDeltas]] touches only the view slice whose
  * keys appear in the deltas — the untouched remainder passes through
  * without entering any aggregation (the touched-key set is
  * delta-sized, so Catalyst broadcasts it and the split is scan-only).
  * Keep the state tables bucketed on the join key (BucketingSpec /
  * BSCALE discipline) and the `⋈ old-state` terms co-locate too: a
  * refresh then shuffles ONLY delta-sized frames. The oracle-gated
  * catalog query (`t17_join_view`) proves the maintained view equals
  * the from-scratch join after both-side batched updates.
  */
object JoinView {

  private val Mult = "_mult"

  /** Ensure a multiplicity column (a plain table is a bag of 1s). */
  def withMult(df: DataFrame): DataFrame =
    if (df.columns.contains(Mult)) df else df.withColumn(Mult, lit(1L))

  /** Bag join: multiplicities multiply. Inputs may or may not carry
    * `_mult`. */
  private def bagJoin(a: DataFrame, b: DataFrame, key: Seq[String]): DataFrame = {
    val am = withMult(a).withColumnRenamed(Mult, "_ma")
    val bm = withMult(b).withColumnRenamed(Mult, "_mb")
    am.join(bm, key)
      .withColumn(Mult, col("_ma") * col("_mb"))
      .drop("_ma", "_mb")
  }

  /** Collapse to one row per distinct tuple, multiplicities summed;
    * zero (and negative — inconsistent over-delete, kept out rather
    * than resurrected) multiplicities drop. */
  private def normalize(v: DataFrame): DataFrame = {
    val cols = v.columns.filterNot(_ == Mult).toSeq
    v.groupBy(cols.map(col): _*)
      .agg(sum(Mult).as(Mult))
      .filter(col(Mult) > 0)
  }

  /** Initialize the view: V0 = A ⋈ B (normalized bag). */
  def init(a: DataFrame, b: DataFrame, key: Seq[String]): DataFrame =
    normalize(bagJoin(a, b, key))

  /** The delta rule: what one batched update adds to (or removes from)
    * the view. `aOld`/`bOld` are the PRE-update states; `dA`/`dB` the
    * deltas (signed `_mult`; either may be empty). */
  def delta(aOld: DataFrame, bOld: DataFrame,
      dA: DataFrame, dB: DataFrame, key: Seq[String]): DataFrame =
    bagJoin(dA, bOld, key)
      .unionByName(bagJoin(aOld, dB, key))
      .unionByName(bagJoin(dA, dB, key))

  /** One refresh: fold the delta into the view. Only rows whose key
    * appears in a delta enter the merge aggregation; everything else
    * passes through untouched (delta-sized work against a broadcast
    * key set). */
  def applyDeltas(view: DataFrame, aOld: DataFrame, bOld: DataFrame,
      dA: DataFrame, dB: DataFrame, key: Seq[String]): DataFrame = {
    val touched = dA.select(key.map(col): _*)
      .unionByName(dB.select(key.map(col): _*)).distinct()
    val vm = withMult(view)
    val untouched = vm.join(broadcast(touched), key, "left_anti")
    val affected = vm.join(broadcast(touched), key, "left_semi")
    untouched.unionByName(
      normalize(affected.unionByName(delta(aOld, bOld, dA, dB, key))))
  }
}
