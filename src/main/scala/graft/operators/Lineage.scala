package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators, with a cluster-safe mode.
  *
  * Every iterative operator here (GraphAlgos, Components, the pipeline
  * loops) must cut lineage each round or plans grow linearly with the
  * iteration count. `localCheckpoint()` does that by caching blocks on
  * the executors WITH the lineage discarded — fast, but on a real
  * cluster an executor loss then kills the job unrecoverably, because
  * the lost blocks can no longer be recomputed (round-7 verdict #3).
  *
  * The knob is Spark's own checkpoint directory: when the deployment
  * sets one (`sparkContext.setCheckpointDir(...)` /
  * `spark.checkpoint.dir` — as any production cluster job should),
  * [[cut]] uses reliable `checkpoint()`, which persists the blocks to
  * that (fault-tolerant) storage and survives executor loss. With no
  * dir configured — local runs, tests — it falls back to
  * `localCheckpoint()`. Results are identical either way; only
  * durability and write cost differ. See SCALE.md for when to flip it.
  */
object Lineage {

  /** Cut `df`'s lineage: reliable `checkpoint()` under the configured
    * checkpoint dir when one is set, else `localCheckpoint()`. Both
    * eager. */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** `.cutLineage()` as a chainable postfix, mirroring the
    * `.localCheckpoint()` call sites it replaces. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(): DataFrame = cut(df)
  }
}
