package graft.temporal

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot isolation + time travel for plain-parquet state tables — a
  * transactional version log in miniature (the shape Delta's
  * `_delta_log` / Iceberg's snapshot metadata give a real table format),
  * layered on the same single-writer discipline as [[AtomicSwap]].
  * Where AtomicSwap keeps exactly ONE state and replaces it in place,
  * this store keeps the last `keep` snapshots addressable, so a reader
  * can pin a version for a whole multi-stage job while the writer keeps
  * committing — the isolation a 100 TB pipeline needs once state tables
  * are read by jobs that outlive one refresh cycle.
  *
  * Layout under `root`:
  * {{{
  *   v000000000001/            immutable data directory, one per version
  *   v000000000002/
  *   _log/000000000001.json    manifest; its EXISTENCE is the commit point
  *   _log/000000000002.json
  *   .stage/                   writer scratch, never resolved by readers
  * }}}
  *
  * Commit protocol (single writer, like the reference loader's one
  * process per portal):
  *   1. materialize the new snapshot at `.stage` (plain `df.write`)
  *   2. next version N = max manifested version + 1; an unmanifested
  *      `vN` left by a crashed commit is certified garbage — delete it
  *   3. rename `.stage` -> `vN`                     (atomic dir rename)
  *   4. write `_log/.tmp-N`, rename -> `_log/N.json` (atomic file
  *      rename; the manifest's existence IS the commit)
  *
  * Readers resolve versions ONLY through manifests, so every crash
  * state is invisible to them: a crash before (4) leaves an
  * unmanifested data dir that the next commit deletes, and nothing a
  * reader can observe ever changes or disappears inside the retention
  * horizon. No marker, no roll-forward — unlike [[AtomicSwap]] the
  * current snapshot is never deleted-then-replaced, so a reader pinned
  * at version v is untouched by any number of concurrent commits
  * ([[gc]] alone can invalidate a pin, and only past the horizon).
  * The price is storage for `keep` generations; [[gc]] bounds it.
  *
  * Same deviation note as AtomicSwap: dir/file rename is atomic on
  * HDFS and posix local filesystems; object stores need an atomic
  * rename layer underneath. Reference anchor: the loaders' wish for
  * re-runnable loads (`docs/TESTING_QUICK_REFERENCE.md` idempotence
  * invariant) — here a failed load never corrupts, and the PREVIOUS
  * snapshot stays queryable while the next one lands.
  */
object VersionedStore {

  /** One committed version as recorded in its manifest. */
  final case class VersionInfo(
      version: Long, operation: String, files: Long, bytes: Long)

  private val LogDir = "_log"
  private val StageDir = ".stage"

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def vDir(root: String, v: Long) = new Path(root, f"v$v%012d")
  private def manifestPath(root: String, v: Long) =
    new Path(new Path(root, LogDir), f"$v%012d.json")

  private def checkedDelete(fs: FileSystem, p: Path): Unit =
    if (fs.exists(p)) require(fs.delete(p, true), s"VersionedStore: delete $p failed")

  private def checkedRename(fs: FileSystem, src: Path, dst: Path): Unit =
    require(fs.rename(src, dst), s"VersionedStore: rename $src -> $dst failed")

  /** Recursive (files, bytes) of one version's data files. Driver-side
    * listing, O(files of one version) — the same order of work the
    * write itself just did. */
  private def du(fs: FileSystem, dir: Path): (Long, Long) = {
    val it = fs.listFiles(dir, true)
    var files = 0L; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { files += 1; bytes += f.getLen }
    }
    (files, bytes)
  }

  /** All committed versions, ascending. One directory listing. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val log = new Path(root, LogDir)
    if (!fs.exists(log)) Seq.empty
    else fs.listStatus(log).map(_.getPath.getName).toSeq
      .filter(_.matches("\\d{12}\\.json"))
      .map(_.stripSuffix(".json").toLong).sorted
  }

  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Parse one manifest (written by [[commit]], fixed field order). */
  private def readManifest(fs: FileSystem, root: String, v: Long): VersionInfo = {
    val in = fs.open(manifestPath(root, v))
    val body = try {
      val buf = new Array[Byte](4096)
      val n = in.read(buf)
      new String(buf, 0, math.max(n, 0), "UTF-8")
    } finally in.close()
    def field(k: String) =
      s""""$k"\\s*:\\s*("([^"]*)"|[0-9]+)""".r.findFirstMatchIn(body)
        .map(m => Option(m.group(2)).getOrElse(m.group(1)))
        .getOrElse(sys.error(s"manifest $v: missing $k in $body"))
    VersionInfo(field("version").toLong, field("operation"),
      field("files").toLong, field("bytes").toLong)
  }

  /** The version log as data: one [[VersionInfo]] per retained version. */
  def log(spark: SparkSession, root: String): Seq[VersionInfo] = {
    val fs = fsOf(spark, root)
    versions(spark, root).map(readManifest(fs, root, _))
  }

  /** Commit `df` as the next version. Returns the new version number. */
  def commit(spark: SparkSession, root: String, df: DataFrame,
      operation: String = "write", partitionCols: Seq[String] = Nil): Long = {
    val fs = fsOf(spark, root)
    val stage = new Path(root, StageDir)
    checkedDelete(fs, stage) // scratch from a crashed commit
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(stage.toString)
    val n = currentVersion(spark, root).getOrElse(0L) + 1
    val data = vDir(root, n)
    checkedDelete(fs, data) // unmanifested leftover of a crashed commit
    checkedRename(fs, stage, data)
    val (files, bytes) = du(fs, data)
    val logDir = new Path(root, LogDir)
    if (!fs.exists(logDir))
      require(fs.mkdirs(logDir), s"VersionedStore: mkdirs $logDir failed")
    val tmp = new Path(logDir, s".tmp-$n")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"version":$n,"operation":"$operation","files":$files,"bytes":$bytes}"""
        .getBytes("UTF-8"))
    finally out.close()
    checkedRename(fs, tmp, manifestPath(root, n))
    n
  }

  /** Time travel: read a pinned version. Fails fast with the retained
    * range when `v` was never committed or has been GC'd. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val fs = fsOf(spark, root)
    require(fs.exists(manifestPath(root, v)), {
      val vs = versions(spark, root)
      s"VersionedStore: version $v not retained at $root " +
        s"(retained: ${if (vs.isEmpty) "none" else s"${vs.head}..${vs.last}"})"
    })
    spark.read.parquet(vDir(root, v).toString)
  }

  /** Read the current snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, currentVersion(spark, root)
      .getOrElse(sys.error(s"VersionedStore: no committed version at $root")))

  /** Retention GC: drop all but the newest `keep` versions. The
    * manifest is deleted FIRST (the version disappears atomically from
    * every reader's view), then its data dir; a crash in between leaves
    * an unmanifested dir below the horizon, swept by the next gc.
    * Returns the versions removed. */
  def gc(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, s"gc keep must be >= 1, got $keep")
    val fs = fsOf(spark, root)
    val vs = versions(spark, root)
    if (vs.isEmpty) return Seq.empty
    val horizon = vs.takeRight(keep).head
    val expired = vs.filter(_ < horizon)
    expired.foreach { v =>
      require(fs.delete(manifestPath(root, v), false),
        s"VersionedStore: delete manifest $v failed")
      checkedDelete(fs, vDir(root, v))
    }
    // sweep data dirs below the horizon orphaned by a crashed gc
    fs.listStatus(new Path(root)).map(_.getPath).toSeq
      .filter(_.getName.matches("v\\d{12}"))
      .filter(p => p.getName.drop(1).toLong < horizon)
      .foreach(checkedDelete(fs, _))
    expired
  }

  /** OPTIMIZE: bin-pack the current snapshot's small files into
    * ~`targetBytes` files and commit the rewrite as a NEW version (so
    * compaction composes with snapshot isolation: pinned readers of the
    * uncompacted version are untouched, and a bad rewrite is one gc
    * away from harmless). `coalesce` keeps the rewrite shuffle-free —
    * compaction costs exactly the bytes it rewrites. No-op (None) when
    * the snapshot already meets the target file count. */
  def compact(spark: SparkSession, root: String,
      targetBytes: Long = 128L << 20): Option[Long] = {
    val cur = currentVersion(spark, root)
      .getOrElse(sys.error(s"VersionedStore: nothing to compact at $root"))
    val fs = fsOf(spark, root)
    val (files, bytes) = du(fs, vDir(root, cur))
    val target = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    if (files <= target) None
    else Some(commit(spark, root,
      readVersion(spark, root, cur).coalesce(target.toInt), "compact"))
  }
}
