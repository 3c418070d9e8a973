package graft.temporal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-style `MERGE INTO` for plain-parquet state tables — the
  * general keyed-mutation operator the reference's loader family
  * implements per entity (`loaders/neo4j_loader.py`'s MERGE-on-key
  * upserts, `temporal_loader.py`'s delete detection): one statement
  * that upserts matched rows, inserts unmatched ones, and deletes on a
  * source-driven condition.
  *
  * [[ScdLoader]] is the HISTORY-keeping twin (SCD-4 current+history);
  * this operator is the plain current-state MERGE — what a user of a
  * transactional table format (Delta/Iceberg `MERGE INTO`) would run
  * for the same step, re-expressed over the repo's parquet + AtomicSwap
  * storage convention.
  *
  * Plan shape (the 100 TB story): ONE full-outer shuffle join on the
  * merge key classifies every row — matched-update / matched-delete /
  * source-only-insert / target-only-keep — with no second pass over
  * either side; both inputs shuffle once on the key and AQE handles
  * skewed keys. Nothing collects to the driver. A real table format
  * would additionally prune untouched FILES; the swap protocol here
  * rewrites the state directory, which is the documented plain-parquet
  * deviation (AtomicSwap's scaladoc).
  */
object Merge {

  /** Pure MERGE: returns the post-merge state of `target`.
    *
    * Semantics (SQL:2003 / Delta `MERGE INTO` with update-all /
    * insert-all actions):
    *  - source rows are deduplicated to ONE row per key first when
    *    `versionCol` is set (last-writer-wins by highest version —
    *    the CDC-feed discipline; a multi-row-per-key source otherwise
    *    makes MERGE nondeterministic, which Delta rejects outright);
    *  - matched + delete condition  -> row removed
    *  - matched otherwise           -> source row replaces target row
    *  - source-only + NOT delete    -> row inserted (`insertUnmatched`)
    *  - source-only + delete        -> no-op (delete of absent key)
    *  - target-only                 -> row kept unchanged
    *
    * @param target     current state (any schema)
    * @param source     change rows; must carry `keys` plus every
    *                   non-key column of `target` (extra source-only
    *                   columns — op flags, versions — are dropped from
    *                   the result)
    * @param keys       merge key columns
    * @param deleteExpr SQL boolean over SOURCE columns marking deletes
    * @param versionCol source column ranking duplicates per key; the
    *                   highest (then latest by stable tiebreak on all
    *                   key columns) wins
    */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteExpr: Option[String] = None,
      insertUnmatched: Boolean = true,
      versionCol: Option[String] = None): DataFrame = {
    val valueCols = target.columns.filterNot(keys.contains).toSeq
    require(keys.forall(source.columns.contains) &&
      valueCols.forall(source.columns.contains),
      s"source must carry ${keys ++ valueCols}, has ${source.columns.toSeq}")

    // 1. evaluate the delete predicate while source columns are still
    //    in their own namespace, then 2. last-writer-wins dedup
    val flagged = source.withColumn("__del",
      deleteExpr.map(e => expr(e).cast("boolean")).getOrElse(lit(false)))
    val deduped = versionCol match {
      case Some(v) =>
        import org.apache.spark.sql.expressions.Window
        // tiebreak equal versions on a content hash so the winner is
        // deterministic across runs/partitionings (Delta instead
        // REJECTS multi-match sources; picking deterministically is
        // the kinder contract for CDC feeds with idempotent replays)
        flagged
          .withColumn("__rn", row_number().over(
            Window.partitionBy(keys.map(col): _*)
              .orderBy(col(v).desc,
                xxhash64(source.columns.map(col): _*).asc)))
          .filter(col("__rn") === 1)
      case None => flagged
    }
    val s = deduped.select(
      keys.map(col) ++
        valueCols.map(c => col(c).as(s"__s_$c")) ++
        Seq(coalesce(col("__del"), lit(false)).as("__del"),
          lit(true).as("__s")): _*)

    // 3. one full-outer join on the key classifies every row
    val t = target.withColumn("__t", lit(true))
    val j = t.join(s, keys, "full_outer")
    val matched = col("__t").isNotNull && col("__s").isNotNull
    val sourceOnly = col("__t").isNull && col("__s").isNotNull
    val keep =
      (matched && !col("__del")) ||                       // update
      col("__s").isNull ||                                // target-only
      (sourceOnly && !col("__del") && lit(insertUnmatched)) // insert
    j.filter(keep)
      .select(keys.map(col) ++ valueCols.map { c =>
        when(col("__s").isNotNull, col(s"__s_$c")).otherwise(col(c)).as(c)
      }: _*)
  }

  /** Transactional MERGE against a parquet state directory: recover any
    * crashed swap, read the current state (absent directory = empty
    * table in the source's key+value shape), merge, stage the new state
    * at `<path>.next`, marker-protected swap (AtomicSwap). Returns
    * (rows before, rows after). */
  def mergeIntoPath(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String], deleteExpr: Option[String] = None,
      insertUnmatched: Boolean = true,
      versionCol: Option[String] = None): (Long, Long) = {
    AtomicSwap.recover(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // bootstrap shape when the table doesn't exist yet: the source
    // minus its version column (callers with extra op-flag columns
    // should project them away before the FIRST merge — they would
    // otherwise become state columns)
    val target =
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        spark.read.parquet(path)
      else source.drop(versionCol.toSeq: _*).limit(0)
    val before = target.count()
    val merged = mergeInto(target, source, keys, deleteExpr,
      insertUnmatched, versionCol)
    merged.write.mode("overwrite").parquet(s"$path.next")
    AtomicSwap.swapIn(spark, path)
    (before, spark.read.parquet(path).count())
  }
}
