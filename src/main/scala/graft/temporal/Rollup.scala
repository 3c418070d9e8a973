package graft.temporal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for keyed rollups — the
  * pattern that keeps a 100 TB corpus's aggregate tables fresh without
  * ever re-reading the corpus: store the MERGEABLE state of each
  * aggregate (count / sum / min / max per key), fold each arriving
  * batch's partial state into it, and derive display values (avg) at
  * read time. The algebra is exactly Spark's own partial-aggregation
  * contract (what map-side combine does inside one query), lifted to
  * state that persists ACROSS jobs.
  *
  * Parity discipline: sums are kept in integer micro-units
  * (floor(x * 1e4 + 0.5) per row, then BIGINT sums) so merge order —
  * which differs between an incremental fold and a direct aggregate,
  * and between engines — can never move a ulp ([[graft.catalog.Q]]
  * rules; the j2-cents lesson). min/max/count are order-immune as-is.
  *
  * Storage follows the repo convention: plain parquet +
  * [[AtomicSwap]], single-writer ([[refreshPath]]).
  */
object Rollup {

  /** Mergeable per-key state of one batch: `n`, and for each value
    * column `c`: `sum_c_e4` (BIGINT micro-units), `min_c`, `max_c`. */
  def aggState(rows: DataFrame, keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("n") +:
        valueCols.flatMap { c =>
          Seq(
            sum(expr(s"CAST(floor($c * 10000 + 0.5) AS BIGINT)"))
              .as(s"sum_${c}_e4"),
            min(col(c)).as(s"min_$c"),
            max(col(c)).as(s"max_$c"))
        }
    rows.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold two states: the same fold Spark's partial aggregation runs,
    * one shuffle on the key. Associative and commutative, so ANY batch
    * arrival order yields the identical state (t11's oracle pins this
    * against the direct one-pass aggregate). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      sum(col("n")).as("n") +:
        valueCols.flatMap { c =>
          Seq(
            sum(col(s"sum_${c}_e4")).as(s"sum_${c}_e4"),
            min(col(s"min_$c")).as(s"min_$c"),
            max(col(s"max_$c")).as(s"max_$c"))
        }
    a.unionByName(b).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold one batch into the persisted state at `path` (bootstraps an
    * absent table), staged + marker-protected via AtomicSwap. Returns
    * the post-refresh key count. */
  def refreshPath(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String], valueCols: Seq[String]): Long = {
    AtomicSwap.recover(spark, path)
    val delta = aggState(batch, keys, valueCols)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        merge(spark.read.parquet(path), delta, keys, valueCols)
      else delta
    merged.write.mode("overwrite").parquet(s"$path.next")
    AtomicSwap.swapIn(spark, path)
    spark.read.parquet(path).count()
  }
}
