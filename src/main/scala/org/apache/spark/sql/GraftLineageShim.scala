package org.apache.spark.sql

/** One `private[sql]` bridge, used only by graft.operators.Lineage.
  *
  * `Dataset.checkpoint()`/`localCheckpoint()` deliberately PRESERVE the
  * optimized plan's statistics on the resulting `LogicalRDD`
  * (SPARK-34295's originStats) — sensible for one cut, catastrophic
  * for iterative self-joins: Catalyst's join size estimate MULTIPLIES
  * `sizeInBytes`, so a loop that cuts a plan referencing its previous
  * frame f times per round carries sizeInBytes ~ prev^f ACROSS cuts —
  * the BigInt's bit-length grows geometrically, and by round 3 of a
  * Boruvka jump loop the driver spends MINUTES in
  * `BigInteger.multiplyToomCook3` sizing 160-million-bit "estimates"
  * for 342-row frames.
  *
  * The bridge rebuilds a DataFrame on the SAME materialized
  * (checkpointed) RDD but through `internalCreateDataFrame`, whose
  * fresh `LogicalRDD` carries NO origin stats — size falls back to the
  * conf default, so per-round estimates stay bounded and the estimate
  * reset composes with AQE's runtime re-planning (which measures REAL
  * sizes at stage boundaries anyway; static estimates on checkpointed
  * frames were never load-bearing here).
  */
object GraftLineageShim {

  /** Same rows, same truncated lineage, default statistics. */
  def resetStats(df: Dataset[Row]): Dataset[Row] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession
      .internalCreateDataFrame(cdf.queryExecution.toRdd, cdf.schema)
  }
}
