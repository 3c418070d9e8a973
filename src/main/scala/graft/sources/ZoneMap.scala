package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map (per-file min/max) sidecar pruning for plain-parquet dirs —
  * the manual twin of a table format's file-statistics skipping (Delta
  * `stats`, Iceberg manifest metrics). Parquet row-group stats already
  * prune WITHIN a file the scan opened; the zone map prunes the file
  * LIST, so an interval lookup on a clustered column never plans, opens,
  * or footer-reads the files that can't match — at 100 TB the difference
  * between a point lookup scheduling 8 tasks and 800 000.
  *
  * Layout: `<dir>/_zonemap/` — underscore-prefixed, so every normal
  * Spark/parquet read of `<dir>` ignores it (the `_SUCCESS` rule).
  * One row per data file: path, size, row count, min/max per indexed
  * column, built DISTRIBUTED-ly from the `_metadata.file_path` hidden
  * column (one pass over the data, no driver IO).
  *
  * Safety contract (what lets this run against a live dir):
  *  - a data file NOT in the sidecar, or whose size changed since
  *    indexing, is included unconditionally — appends after [[build]]
  *    degrade pruning, never correctness;
  *  - sidecar rows for files that no longer exist are ignored;
  *  - all-null stats (a file with only nulls in the column) include the
  *    file — min/max of nulls prove nothing.
  * Pruning is an OVERLAP test on a closed interval, so it is only ever
  * file-level: the caller still applies its exact predicate to the
  * returned frame ([[Pruned.df]] is the candidate set, not the answer).
  */
object ZoneMap {

  /** A pruned read: candidate rows + the file-skipping evidence. */
  final case class Pruned(df: DataFrame, filesTotal: Long, filesSelected: Long)

  private val SidecarDir = "_zonemap"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recursive (path, size) of data files — skips `_`/`.`-prefixed
    * names at every level (sidecar, markers, staging). Shared with
    * [[BloomMap]] (same hidden-file discipline, same sidecar rule). */
  private[sources] def dataFiles(fs: FileSystem, dir: String): Seq[(String, Long)] = {
    val it = fs.listFiles(new Path(dir), true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toUri.getPath
        .stripPrefix(new Path(dir).toUri.getPath).stripPrefix("/")
      val hidden = rel.split("/").exists(s => s.startsWith("_") || s.startsWith("."))
      if (!hidden && f.getPath.getName.endsWith(".parquet"))
        out += ((f.getPath.toUri.getPath, f.getLen))
    }
    out.result()
  }

  /** Build (or rebuild) the sidecar for `cols`: one distributed pass,
    * one tiny grouped result (a row per FILE — listing-scale, the
    * quantity small-file compaction already bounds). */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "ZoneMap.build: need at least one column")
    val aggs =
      count(lit(1)).as("row_count") +:
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("file"),
        col("_metadata.file_size").as("file_size"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$SidecarDir")
  }

  /** Read `dir` keeping only files whose [min, max] on `column` can
    * overlap [lo, hi] (either bound optional). Unindexed/changed files
    * are conservatively included; vanished sidecar entries ignored. */
  def prune(spark: SparkSession, dir: String, column: String,
      lo: Option[Column], hi: Option[Column]): Pruned =
    pruneAll(spark, dir, Seq((column, lo, hi)))

  /** Conjunctive multi-column prune: keep a file only if EVERY
    * (column, lo, hi) interval can overlap that file's [min, max] —
    * the read-side half of a z-ordered layout ([[graft.operators
    * .Layout.zorderWriteRange]]), where each file is tight on ALL
    * interleaved columns at once so the conjunction multiplies the
    * skip rates. Per-column null stats stay conservative (a column
    * whose stats prove nothing never excludes a file), so any prefix
    * of the predicates degrades to the single-column behavior. */
  def pruneAll(spark: SparkSession, dir: String,
      preds: Seq[(String, Option[Column], Option[Column])]): Pruned = {
    require(preds.nonEmpty, "ZoneMap.pruneAll: need at least one predicate")
    val fs = fsOf(spark, dir)
    val live = dataFiles(fs, dir)
    val zm = spark.read.parquet(s"$dir/$SidecarDir")
    // keep = AND over predicates of (stats prove nothing OR overlap)
    val keepAll = preds.map { case (column, lo, hi) =>
      val mn = col(s"min_$column"); val mx = col(s"max_$column")
      val overlap =
        lo.map(l => mx >= l).getOrElse(lit(true)) &&
          hi.map(h => mn <= h).getOrElse(lit(true))
      mn.isNull || mx.isNull || overlap
    }.reduce(_ && _)
    val indexed = zm
      .withColumn("keep", keepAll)
      .select(col("file"), col("file_size"), col("keep"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    def uriPath(p: String) = new Path(p).toUri.getPath
    val byPath = indexed.map { case ((p, sz), k) => uriPath(p) -> ((sz, k)) }
    val selected = live.filter { case (p, sz) =>
      byPath.get(p) match {
        case Some((isz, keep)) if isz == sz => keep
        case _ => true // unindexed or resized: include unconditionally
      }
    }
    val df =
      if (selected.nonEmpty)
        spark.read.option("basePath", dir).parquet(selected.map(_._1): _*)
      else // everything pruned: empty frame, schema from the dir (no scan)
        spark.read.option("basePath", dir).parquet(dir).limit(0)
    Pruned(df, live.size.toLong, selected.size.toLong)
  }
}
