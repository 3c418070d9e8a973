package graft.temporal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read deletes for plain-parquet dirs — Delta deletion
  * vectors / Iceberg positional delete files, re-expressed as a
  * sidecar: deleting a sliver of rows never rewrites the data files.
  * At 100 TB a 1% delete (GDPR erasure, a bad-batch rollback, PII
  * scrub) must not rewrite 100% of the table; the write cost of a
  * delete should be sized by the DELETED rows, the read cost by one
  * anti-join against a sidecar sized the same way.
  *
  * Layout: `<dir>/_dv/` (underscore rule — invisible to normal reads).
  * One row per deleted position: `file, file_size, pos` — Iceberg's
  * format-v2 positional-delete shape. Positions come from Spark's own
  * `_metadata.row_index` hidden column (stable within an immutable
  * parquet file), captured in ONE distributed filter pass over the
  * predicate; deletes ACCUMULATE by plain append (each delete writes
  * only its own matches).
  *
  * [[read]] is the merge-on-read: data joined `left_anti` to the
  * sidecar on (file, pos) — Catalyst broadcasts the sidecar while it
  * is small and hash-partitions both sides on the same key once it is
  * not; duplicate sidecar rows (an idempotent re-delete) are harmless
  * by anti-join semantics. Files appended AFTER a delete carry no
  * sidecar rows, so their rows are all live — append safety for free.
  *
  * [[materialize]] is the compaction face: rewrite the survivors and
  * clear the sidecar — the once-in-a-while cleanup that converts
  * accumulated read-side work back into scan speed, exactly what
  * OPTIMIZE does for small files ([[Compaction]]).
  */
object DeletionVectors {

  private val SidecarDir = "_dv"

  private def withMeta(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .withColumn("__file", col("_metadata.file_path"))
      .withColumn("__fsize", col("_metadata.file_size"))
      .withColumn("__pos", col("_metadata.row_index"))

  /** Mark every row matching `pred` as deleted: one distributed filter
    * pass, appends (file, file_size, pos) rows to the sidecar. Returns
    * the number of positions written. Never touches a data file. */
  def delete(spark: SparkSession, dir: String, pred: Column): Long = {
    val marks = withMeta(spark, dir)
      .filter(pred)
      .select(col("__file").as("file"), col("__fsize").as("file_size"),
        col("__pos").as("pos"))
    val n = marks.count()
    if (n > 0)
      marks.write.mode("append").parquet(s"$dir/$SidecarDir")
    n
  }

  /** Merge-on-read: the table minus its deleted positions. Plain
    * `spark.read` semantics otherwise (schema, partition columns). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val data = withMeta(spark, dir)
    val out =
      if (!fs.exists(new Path(dir, SidecarDir))) data
      else {
        val dv = spark.read.parquet(s"$dir/$SidecarDir")
          .select(col("file").as("__file"), col("pos").as("__pos"))
        data.join(dv, Seq("__file", "__pos"), "left_anti")
      }
    out.drop("__file", "__fsize", "__pos")
  }

  /** Deleted-position count per live data file (diagnostics: when a
    * file's fraction crosses a threshold, [[materialize]] pays off). */
  def stats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/$SidecarDir")
      .groupBy("file")
      .agg(count(lit(1)).as("n_deleted"))

  /** Purge: rewrite the survivors as `targetFiles` fresh files and drop
    * the sidecar — read-side anti-join cost returns to zero. The
    * rewrite goes through a staging dir so a crash mid-materialize
    * leaves the original data + sidecar fully intact (stage is
    * re-runnable); the swap itself is the same delete-then-rename
    * window AtomicSwap documents for plain dirs. */
  def materialize(spark: SparkSession, dir: String, targetFiles: Int = 8): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(s"$dir.__dv_stage")
    if (fs.exists(stage)) require(fs.delete(stage, true), s"DV: clear $stage failed")
    read(spark, dir).coalesce(targetFiles).write.parquet(stage.toString)
    val target = new Path(dir)
    require(fs.delete(target, true), s"DV: delete $target failed")
    require(fs.rename(stage, target), s"DV: rename $stage -> $target failed")
  }
}
