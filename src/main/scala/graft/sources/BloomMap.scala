package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file Bloom-filter sidecar for point lookups on UNCLUSTERED
  * high-cardinality keys — the case zone maps cannot touch: when a key
  * is uniform across files, every file's [min, max] overlaps every
  * probe and [[ZoneMap]] prunes nothing. A per-file Bloom turns
  * `key = v` into "plan only the files whose filter might contain v":
  * false positives cost extra files READ, never wrong rows — the same
  * conservative contract as the zone map (the caller still applies its
  * exact predicate). This is parquet's optional column Bloom / Delta's
  * Bloom index, re-expressed as a sidecar over plain parquet dirs.
  *
  * Layout: `<dir>/_bloommap/` (underscore rule — invisible to normal
  * reads). SPARSE word rows, one per (file, 64-bit word with >=1 set
  * bit): `file, file_size, w, word, m_bits, k_hashes`. Sparse beats a
  * dense array-per-file row at scale twice over: the sidecar is sized
  * by set bits, not mBits x files, and [[prune]] reads ONLY the k x
  * |values| word indexes it needs — an equality-pushed scan of a
  * listing-scale table, never a full sidecar load.
  *
  * Build is one distributed pass, relational end to end (the
  * [[graft.operators.Curation.shingleBloom]] strategy keyed by
  * `_metadata.file_path`): each value sets k positions
  * (`pmod(xxhash64(v, seed), mBits)`), positions group into words via
  * `bit_or`. Values hash via their CAST-to-string form on both build
  * and probe, so the two sides can never disagree on numeric widths.
  *
  * Safety contract (mirrors [[ZoneMap]]):
  *  - files not in the sidecar, or whose size changed since indexing,
  *    are included unconditionally (appends degrade pruning, never
  *    correctness); an all-null file carries a sentinel row (w = -1)
  *    so it stays indexed and prunable;
  *  - sidecar rows for vanished files are ignored;
  *  - a file is kept iff ANY probed value has ALL k bits set.
  */
object BloomMap {

  /** A pruned read: candidate rows + the file-skipping evidence. */
  final case class Pruned(df: DataFrame, filesTotal: Long, filesSelected: Long)

  private val SidecarDir = "_bloommap"

  /** Build (or rebuild) the sidecar for `column`. `mBits` is the
    * filter width per file (power of two; 2^16 bits = 8 KiB dense,
    * far less sparse), `k` the hash count. */
  def build(spark: SparkSession, dir: String, column: String,
      mBits: Int = 1 << 16, k: Int = 5): Unit = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(k >= 1, s"k must be >= 1, got $k")
    val rows = spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.file_size").as("file_size"),
        col(column).cast("string").as("__v"))
    val words = rows.filter(col("__v").isNotNull)
      .select(col("file"), col("file_size"), explode(expr(
        s"transform(sequence(0, ${k - 1}), s -> pmod(xxhash64(__v, s), ${mBits}L))"))
        .as("pos"))
      .groupBy(col("file"), col("file_size"),
        expr("CAST(pos div 64 AS INT)").as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))")
        .as("word"))
    // sentinel keeps all-null files indexed (prunable: no word can match)
    val sentinels = rows.groupBy(col("file"), col("file_size"))
      .agg(count(col("__v")).as("n"))
      .filter(col("n") === 0L)
      .select(col("file"), col("file_size"),
        lit(-1).as("w"), lit(0L).as("word"))
    words.unionByName(sentinels)
      .withColumn("m_bits", lit(mBits))
      .withColumn("k_hashes", lit(k))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$SidecarDir")
  }

  /** Read `dir` keeping only files whose Bloom filter might contain at
    * least one of `values` in `column` (IN-list point lookup; pass one
    * value for equality). Values are matched via their string form —
    * the same cast the build applied. */
  def prune(spark: SparkSession, dir: String, column: String,
      values: Seq[String]): Pruned = {
    require(values.nonEmpty, "BloomMap.prune: need at least one value")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = ZoneMap.dataFiles(fs, dir)
    val zm = spark.read.parquet(s"$dir/$SidecarDir")
    val meta = zm.select("m_bits", "k_hashes").head()
    val mBits = meta.getInt(0); val k = meta.getInt(1)
    // per-value bit positions, computed IN Spark so the hash chain is
    // bit-identical with the build side (k x |values| rows — tiny)
    import spark.implicits._
    val positions = values.toDF("__v")
      .select(col("__v"), explode(expr(
        s"transform(sequence(0, ${k - 1}), s -> pmod(xxhash64(__v, s), ${mBits}L))"))
        .as("pos"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (v, rs) => v -> rs.map(_.getLong(1)).toSeq }
    val neededWs = positions.values.flatten.map(p => (p / 64).toInt).toSeq.distinct
    // equality-pushed scan: only the word rows the probe needs
    val wordRows = zm.filter(col("w").isin(neededWs: _*))
      .select("file", "file_size", "w", "word").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    val indexed = zm.select("file", "file_size").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    def uriPath(p: String) = new org.apache.hadoop.fs.Path(p).toUri.getPath
    val indexedByPath = indexed.map { case (p, sz) => uriPath(p) -> ((p, sz)) }.toMap
    def mightContain(fileKey: (String, Long), poss: Seq[Long]): Boolean =
      poss.forall { p =>
        val word = wordRows.getOrElse((fileKey._1, fileKey._2, (p / 64).toInt), 0L)
        (word >> (p % 64).toInt & 1L) == 1L
      }
    val selected = live.filter { case (p, sz) =>
      indexedByPath.get(p) match {
        case Some((orig, isz)) if isz == sz =>
          positions.values.exists(mightContain((orig, isz), _))
        case _ => true // unindexed or resized: include unconditionally
      }
    }
    val df =
      if (selected.nonEmpty)
        spark.read.option("basePath", dir).parquet(selected.map(_._1): _*)
      else
        spark.read.option("basePath", dir).parquet(dir).limit(0)
    Pruned(df, live.size.toLong, selected.size.toLong)
  }
}
