package graft.temporal

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction (the OPTIMIZE half of a table format: Delta
  * OPTIMIZE / Iceberg rewrite_data_files) for the repo's plain-parquet
  * state stores. Streaming sinks and incremental refreshes accrete one
  * parquet file set per trigger forever — at 100 TB the file count, not
  * the byte count, becomes the scan bottleneck (footer reads, listing,
  * task scheduling all scale with files). A size-aware rewrite
  * bin-packs each store back to ~`targetBytes` files, committed through
  * the store's own crash-safe protocol:
  *
  *  - [[compactPath]] — flat [[AtomicSwap]] state dirs and sidecar
  *    append logs: one `coalesce` (narrow, shuffle-free — compaction
  *    costs exactly the bytes it rewrites), staged at `.next`,
  *    marker-protected swap. Single-writer: run it from the process
  *    that owns the store, between refreshes.
  *  - [[compactPartitionedPath]] — Hive-layout dirs (`col=value/`):
  *    per-partition bin-packing in ONE shuffle job. Per-partition
  *    target file counts come from the listing; rows salt by
  *    `xxhash64 % target(partition)` via a broadcast join against the
  *    (tiny) per-partition plan, and `repartition(partCols :+ salt)`
  *    lands each (partition, salt) group in one task, so `partitionBy`
  *    writes ≤ target files per partition (hash collisions between
  *    groups can only MERGE output files, never split them). This is
  *    the driver-loop-free form of Delta's per-partition OPTIMIZE —
  *    no per-partition jobs, so 3650 date partitions cost the same
  *    scheduling as one.
  *
  * [[VersionedStore.compact]] is the third face: the same rewrite
  * committed as a new VERSION, composing with snapshot isolation.
  */
object Compaction {

  /** What a rewrite did: file count before/after and bytes rewritten. */
  final case class Stats(filesBefore: Long, filesAfter: Long, bytes: Long)

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recursive parquet listing as (relative partition dir, file bytes).
    * Driver-side, O(files) — the quantity compaction exists to bound. */
  private def listing(fs: FileSystem, dir: Path): Seq[(String, Long)] = {
    val base = dir.toUri.getPath
    val it = fs.listFiles(dir, true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val rel = f.getPath.getParent.toUri.getPath.stripPrefix(base)
          .stripPrefix("/")
        out += ((rel, f.getLen))
      }
    }
    out.result()
  }

  private def targetFiles(bytes: Long, targetBytes: Long): Long =
    math.max(1L, (bytes + targetBytes - 1) / targetBytes)

  /** Compact a flat (unpartitioned) state dir or append log in place.
    * No-op (None) when the dir already meets the target file count. */
  def compactPath(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): Option[Stats] = {
    AtomicSwap.recover(spark, path)
    val fs = fsOf(spark, path)
    require(fs.exists(new Path(path)), s"Compaction: $path does not exist")
    val files = listing(fs, new Path(path))
    require(files.forall(_._1.isEmpty),
      s"Compaction: $path has partition subdirs — use compactPartitionedPath")
    val bytes = files.map(_._2).sum
    val target = targetFiles(bytes, targetBytes)
    if (files.size <= target) None
    else {
      spark.read.parquet(path).coalesce(target.toInt)
        .write.mode("overwrite").parquet(s"$path.next")
      AtomicSwap.swapIn(spark, path)
      Some(Stats(files.size.toLong, listing(fs, new Path(path)).size.toLong, bytes))
    }
  }

  /** Compact a Hive-partitioned state dir in place, bin-packing within
    * each partition. Only partitions over their per-partition target
    * contribute to the rewrite decision, but the swap rewrites the
    * whole dir (plain parquet has no per-file commit; a real format
    * would rewrite only the offending partitions' files). No-op (None)
    * when every partition meets its target. */
  def compactPartitionedPath(spark: SparkSession, path: String,
      partCols: Seq[String], targetBytes: Long = 128L << 20): Option[Stats] = {
    require(partCols.nonEmpty, "compactPartitionedPath needs partition columns")
    AtomicSwap.recover(spark, path)
    val fs = fsOf(spark, path)
    require(fs.exists(new Path(path)), s"Compaction: $path does not exist")
    val files = listing(fs, new Path(path))
    val perPart = files.groupBy(_._1).map { case (rel, fs0) =>
      (rel, fs0.size.toLong, fs0.map(_._2).sum)
    }.toSeq
    val needed = perPart.exists { case (_, n, b) => n > targetFiles(b, targetBytes) }
    if (!needed) return None

    // per-partition salt counts from the listing; partition dir names
    // are `k=v` pairs in partCols order (Spark's own layout), so the
    // join key is the string form of each partition column
    val plan = perPart.map { case (rel, _, b) =>
      val values = rel.split("/").map(_.split("=", 2)(1))
      (values.toSeq, targetFiles(b, targetBytes))
    }
    import spark.implicits._
    val planDf = plan.map { case (vs, n) => (vs.mkString("\u0001"), n) }
      .toDF("__pk", "__n")

    val df = spark.read.parquet(path)
    val dataCols = df.columns.filterNot(partCols.contains).toSeq
    val keyed = df.withColumn("__pk",
      concat_ws("\u0001", partCols.map(c => col(c).cast("string")): _*))
    val salted = keyed.join(broadcast(planDf), Seq("__pk"))
      .withColumn("__salt", pmod(xxhash64(dataCols.map(col): _*), col("__n")))
    val buckets = math.max(spark.sessionState.conf.numShufflePartitions,
      plan.map(_._2).sum.min(4096L).toInt)
    salted
      .repartition(buckets, (partCols.map(col) :+ col("__salt")): _*)
      .drop("__pk", "__n", "__salt")
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(s"$path.next")
    AtomicSwap.swapIn(spark, path)
    Some(Stats(files.size.toLong, listing(fs, new Path(path)).size.toLong,
      files.map(_._2).sum))
  }
}
