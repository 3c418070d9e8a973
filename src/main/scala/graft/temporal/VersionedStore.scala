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

  /** One committed version as recorded in its manifest. `dir` is the
    * data directory name under the store root — `vNNNNNNNNNNNN` for
    * single-writer [[commit]]s, a txn-unique `d-*` name for
    * [[transact]] commits (OCC needs the data dir decoupled from the
    * version number: two racing writers must never contend on a
    * directory rename, only on the manifest CAS). */
  final case class VersionInfo(
      version: Long, operation: String, files: Long, bytes: Long,
      dir: Option[String] = None, parent: Option[Long] = None)

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

  /** Parse one manifest (written by [[commit]] / [[transact]], fixed
    * field order; `dir` present only on transact commits). */
  private def readManifest(fs: FileSystem, root: String, v: Long): VersionInfo = {
    val in = fs.open(manifestPath(root, v))
    val body = try {
      val buf = new Array[Byte](4096)
      val n = in.read(buf)
      new String(buf, 0, math.max(n, 0), "UTF-8")
    } finally in.close()
    def fieldOpt(k: String) =
      s""""$k"\\s*:\\s*("([^"]*)"|[0-9]+)""".r.findFirstMatchIn(body)
        .map(m => Option(m.group(2)).getOrElse(m.group(1)))
    def field(k: String) = fieldOpt(k)
      .getOrElse(sys.error(s"manifest $v: missing $k in $body"))
    VersionInfo(field("version").toLong, field("operation"),
      field("files").toLong, field("bytes").toLong, fieldOpt("dir"),
      fieldOpt("parent").map(_.toLong))
  }

  /** One committed version's manifest info (refs/ancestry walks). */
  def manifest(spark: SparkSession, root: String, v: Long): VersionInfo =
    readManifest(fsOf(spark, root), root, v)

  /** Resolve a version's data directory through its manifest. */
  private def dataDir(fs: FileSystem, root: String, v: Long): Path =
    readManifest(fs, root, v).dir match {
      case Some(d) => new Path(root, d)
      case None => vDir(root, v)
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

  /** Publish an EXTERNALLY staged directory as the next version — the
    * write-audit-publish commit point ([[Wap]]): the staged files move
    * by RENAME (never rewritten, never re-read), and the manifest
    * write is the atomic publish exactly as in [[commit]]. The staged
    * dir must live on the same filesystem as `root`. */
  def publishDir(spark: SparkSession, root: String, stagedDir: String,
      operation: String = "wap-publish"): Long = {
    val fs = fsOf(spark, root)
    val staged = new Path(stagedDir)
    require(fs.exists(staged), s"VersionedStore: staged dir $staged missing")
    val n = currentVersion(spark, root).getOrElse(0L) + 1
    val data = vDir(root, n)
    checkedDelete(fs, data) // unmanifested leftover of a crashed publish
    checkedRename(fs, staged, data)
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
    spark.read.parquet(dataDir(fs, root, v).toString)
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
  def gc(spark: SparkSession, root: String, keep: Int): Seq[Long] =
    gc(spark, root, keep, orphanGraceMs = 3600L * 1000)

  /** [[gc]] with an explicit orphan grace period. Beyond expiring
    * versions, sweeps data dirs no retained manifest references:
    *   - `vNNN` dirs below the horizon (crashed single-writer commit
    *     or crashed gc);
    *   - `d-*` dirs unreferenced by ANY retained manifest (a
    *     [[transact]] loser that crashed between its data rename and
    *     its cleanup) — but only when older than `orphanGraceMs`,
    *     because an IN-FLIGHT transaction's data dir is unreferenced
    *     for the instant between its rename and its manifest CAS.
    *     Same contract as a table format's VACUUM retention window. */
  def gc(spark: SparkSession, root: String, keep: Int,
      orphanGraceMs: Long): Seq[Long] = {
    require(keep >= 1, s"gc keep must be >= 1, got $keep")
    val fs = fsOf(spark, root)
    val vs = versions(spark, root)
    if (vs.isEmpty) return Seq.empty
    val horizon = vs.takeRight(keep).head
    // versions pinned by a branch or tag ref ([[Refs]]) survive any
    // horizon — deleting a ref'd snapshot would break its readers
    val pinned = Refs.pinnedVersions(spark, root)
    val expired = vs.filter(v => v < horizon && !pinned.contains(v))
    expired.foreach { v =>
      val data = dataDir(fs, root, v) // resolve BEFORE the manifest dies
      require(fs.delete(manifestPath(root, v), false),
        s"VersionedStore: delete manifest $v failed")
      checkedDelete(fs, data)
    }
    // sweep data dirs below the horizon orphaned by a crashed gc —
    // "orphaned" = the manifest is gone; a ref-pinned version below the
    // horizon keeps its manifest and therefore its data
    fs.listStatus(new Path(root)).map(_.getPath).toSeq
      .filter(_.getName.matches("v\\d{12}"))
      .filter(p => p.getName.drop(1).toLong < horizon)
      .filter(p => !fs.exists(manifestPath(root, p.getName.drop(1).toLong)))
      .foreach(checkedDelete(fs, _))
    // sweep txn data dirs no retained manifest references, past grace
    val referenced = versions(spark, root)
      .flatMap(v => readManifest(fs, root, v).dir).toSet
    val now = System.currentTimeMillis()
    fs.listStatus(new Path(root)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("d-"))
      .filter(st => !referenced.contains(st.getPath.getName))
      .filter(st => now - st.getModificationTime >= orphanGraceMs)
      .foreach(st => checkedDelete(fs, st.getPath))
    // sweep `.stage-<txn>` dirs past grace: a transact/casCommit that
    // crashed DURING its staging write leaks one (txnIds are never
    // reused, so nothing ever reclaims it — unlike the single-writer
    // `.stage`, which the next commit overwrites in place). Grace
    // matters for the same reason as `d-*`: an in-flight transaction's
    // stage dir is live for the duration of its parquet write.
    fs.listStatus(new Path(root)).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(StageDir + "-"))
      .filter(st => now - st.getModificationTime >= orphanGraceMs)
      .foreach(st => checkedDelete(fs, st.getPath))
    expired
  }

  // ---- schema evolution (Delta mergeSchema semantics) -------------

  /** Merge two field types under ADDITIVE evolution: equal types pass,
    * integrals widen up to Long, Float widens to Double, Int (and
    * below) widen to Double. Long -> Double is REFUSED — it is lossy
    * past 2^53, the silent-corruption class a schema gate exists to
    * stop (same boundary the oracle-parity rules pin for casts). */
  private def mergedType(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType)
      : Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    val intOrder = Seq[DataType](ByteType, ShortType, IntegerType, LongType)
    (a, b) match {
      case (x, y) if x == y => Some(x)
      case (x, y) if intOrder.contains(x) && intOrder.contains(y) =>
        Some(intOrder(math.max(intOrder.indexOf(x), intOrder.indexOf(y))))
      case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
      case (x, DoubleType) if intOrder.take(3).contains(x) => Some(DoubleType)
      case (DoubleType, y) if intOrder.take(3).contains(y) => Some(DoubleType)
      case _ => None
    }
  }

  /** The table schema after committing `next` over `cur`: existing
    * fields keep their position and widen per [[mergedType]] (an
    * unmergeable pair refuses the commit — fail loud, never coerce);
    * fields missing from `next` are retained (null-filled); genuinely
    * new fields append at the end. Column matching is BY NAME, so a
    * reordered writer is a no-op, not an evolution. */
  def evolvedSchema(cur: org.apache.spark.sql.types.StructType,
      next: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val nextByName = next.fields.map(f => f.name -> f).toMap
    val kept = cur.fields.map { f =>
      nextByName.get(f.name) match {
        case Some(nf) =>
          val t = mergedType(f.dataType, nf.dataType).getOrElse(sys.error(
            s"VersionedStore: incompatible schema change on '${f.name}': " +
              s"${f.dataType.simpleString} -> ${nf.dataType.simpleString} " +
              "(only additive widening is allowed)"))
          StructField(f.name, t, nullable = true)
        case None => f.copy(nullable = true) // dropped by writer: null-fill
      }
    }
    val curNames = cur.fieldNames.toSet
    val added = next.fields.filterNot(f => curNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(kept ++ added)
  }

  /** Align `df` to `schema`: cast present columns, null-fill missing
    * ones, in schema order. */
  private def align(df: DataFrame,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val have = df.columns.toSet
    df.select(schema.fields.toSeq.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** [[commit]] with schema evolution: the new snapshot's schema is the
    * [[evolvedSchema]] of the current version's schema and `df`'s —
    * added columns append, widenable types widen, columns the writer
    * dropped are retained null-filled, and an incompatible change
    * (narrowing, string/number flips, Long -> Double) REFUSES before
    * any byte is written. Every version still reads with its OWN
    * schema via [[readVersion]]; [[readUnion]] reads across them. */
  def commitEvolved(spark: SparkSession, root: String, df: DataFrame,
      operation: String = "write", partitionCols: Seq[String] = Nil): Long =
    currentVersion(spark, root) match {
      case None => commit(spark, root, df, operation, partitionCols)
      case Some(v) =>
        val cur = readVersion(spark, root, v).schema
        commit(spark, root, align(df, evolvedSchema(cur, df.schema)),
          operation, partitionCols)
    }

  /** Read ALL retained versions under the union (evolved) schema —
    * missing columns null, widenable types widened — stamped with a
    * `_version` column: the history-as-one-table face (Delta's
    * mergeSchema read over old files, restated over full snapshots).
    * Versions whose schema cannot merge refuse, same rule as commit. */
  def readUnion(spark: SparkSession, root: String): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"VersionedStore: no committed version at $root")
    val frames = vs.map(v => v -> readVersion(spark, root, v))
    val unified = frames.map(_._2.schema)
      .reduceLeft((a, b) => evolvedSchema(a, b))
    import org.apache.spark.sql.functions.lit
    frames.map { case (v, f) =>
      align(f, unified).withColumn("_version", lit(v))
    }.reduce(_.unionByName(_))
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

  // ---- optimistic concurrency control (Delta/Iceberg OCC shape) ----

  /** A concurrent writer won the version this transaction attempted and
    * the conflict is NOT resolvable by recompute (see [[conflictsWith]]).
    * The store is untouched by the refused transaction. */
  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  /** Conflict classification between a losing transaction's operation
    * and one concurrent winner's, in the snapshot-recompute model of
    * [[transact]] (each attempt re-derives the FULL next snapshot from
    * the then-current version, so a retry replays the writer's INTENT
    * on the winner's result — serializable by construction):
    *
    *   - `append`, `delete`, `compact` (and any other named intent)
    *     never conflict with each other: re-running the body against
    *     the winner's snapshot yields exactly the state a serial
    *     execution would — append lands its rows on top of the
    *     winner's, delete re-evaluates its predicate, compact rewrites
    *     whatever is now current. DISJOINT -> retry.
    *   - a LOSING `overwrite` (blind snapshot replace) conflicts with
    *     every winner: its intent presumes the base it read, and
    *     replaying it would silently discard whatever the concurrent
    *     commit wrote — the lost-update class Delta's WriteSerializable
    *     level refuses (ConcurrentWriteException). CONFLICT -> refuse.
    *   - an overwrite WINNER does not block other losers: retrying an
    *     append/delete/compact against the overwritten snapshot is the
    *     serial schedule "overwrite, then the loser" — exactly what a
    *     lock-based writer would have produced.
    *
    * This is the same decision Delta's commit protocol makes from its
    * read/write file sets, collapsed to operation level because a
    * transact body re-reads the whole snapshot (its read set is always
    * the full table). */
  def conflictsWith(mine: String, winner: String): Boolean =
    mine == "overwrite"

  /** Per-root commit locks: on a plain local filesystem
    * `create(overwrite = false)` is exists-check-then-open (not
    * atomic), so the manifest CAS is additionally serialized in-JVM —
    * the contract delta-io's LocalLogStore documents (single process
    * per local store; HDFS needs no lock, its create-no-overwrite is
    * one atomic namenode op). */
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Atomically publish manifest `n` — the OCC commit point. True iff
    * THIS caller created it; false means a concurrent winner exists. */
  private def casManifest(fs: FileSystem, root: String, n: Long,
      content: String): Boolean = {
    val lock = rootLocks.computeIfAbsent(
      new Path(root).toUri.toString, _ => new Object)
    lock.synchronized {
      val p = manifestPath(root, n)
      if (fs.exists(p)) false
      else {
        val logDir = new Path(root, LogDir)
        if (!fs.exists(logDir))
          require(fs.mkdirs(logDir), s"VersionedStore: mkdirs $logDir failed")
        val out = try fs.create(p, false)
        catch { case _: java.io.IOException => return false } // lost on HDFS
        try out.write(content.getBytes("UTF-8")) finally out.close()
        true
      }
    }
  }

  /** Result of one [[transact]]: the committed version plus how many
    * concurrent winners forced a recompute (0 = clean first attempt). */
  final case class TxnResult(version: Long, retries: Int)

  /** Stage `df` to a txn-unique data dir and attempt to publish it as
    * version `n` (recording `parent` in the manifest) by manifest CAS.
    * True iff THIS caller won version n; on false the staged data has
    * already been deleted. The shared commit core of [[transact]] and
    * the branch commits in [[Refs]]. */
  private[temporal] def casCommit(spark: SparkSession, root: String,
      df: DataFrame, n: Long, operation: String, parent: Option[Long],
      partitionCols: Seq[String], txnId: String): Boolean = {
    val fs = fsOf(spark, root)
    val stage = new Path(root, s"$StageDir-$txnId")
    checkedDelete(fs, stage)
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(stage.toString)
    val dirName = f"d-$n%012d-$txnId"
    val data = new Path(root, dirName)
    checkedDelete(fs, data) // own leftover from a crashed prior attempt
    checkedRename(fs, stage, data)
    val (files, bytes) = du(fs, data)
    val par = parent.map(p => s""","parent":$p""").getOrElse("")
    val manifest = s"""{"version":$n,"operation":"$operation",""" +
      s""""files":$files,"bytes":$bytes,"dir":"$dirName"$par}"""
    if (casManifest(fs, root, n, manifest)) true
    else { checkedDelete(fs, data); false }
  }

  /** Optimistic-concurrency commit: derive the next FULL snapshot from
    * the current one with `body` (None on an empty store), stage it to
    * a txn-unique data dir, and attempt to publish version
    * current+1 by manifest CAS. Losing the CAS means a concurrent
    * writer committed first; the loser classifies the conflict with
    * [[conflictsWith]] and either RECOMPUTES against the winner's
    * snapshot and retries (append/delete/compact — convergent by
    * construction) or REFUSES with [[ConcurrentCommitException]]
    * (blind overwrite), deleting its own staged data either way. A
    * reader pinned at any committed version is untouched throughout:
    * losers never touch published dirs, winners only add.
    *
    * Commit protocol per attempt (compare [[commit]]'s single-writer
    * protocol — steps 1-3 are contention-free because every path is
    * txn-unique; step 4 is the only shared word):
    *   1. rv = current version; out = body(snapshot at rv)
    *   2. write `out` -> `.stage-<txn>`
    *   3. rename -> `d-<rv+1>-<txn>`   (txn-unique: no rename race)
    *   4. CAS-create `_log/<rv+1>.json` pointing at that dir
    *
    * A crash between 3 and 4 leaks one unreferenced `d-*` dir; [[gc]]
    * sweeps it past the VACUUM grace window. */
  def transact(spark: SparkSession, root: String, operation: String,
      maxRetries: Int = 20, partitionCols: Seq[String] = Nil)
      (body: Option[DataFrame] => DataFrame): TxnResult = {
    val fs = fsOf(spark, root)
    val txnId = java.util.UUID.randomUUID().toString.take(8)
    var attempt = 0
    while (attempt <= maxRetries) {
      val rv = currentVersion(spark, root)
      val out = body(rv.map(readVersion(spark, root, _)))
      val n = rv.getOrElse(0L) + 1
      if (casCommit(spark, root, out, n, operation, rv, partitionCols, txnId))
        return TxnResult(n, attempt)
      // Lost the race: a winner holds version n (and possibly more by
      // now). Our stale snapshot is already cleaned; classify, retry
      // or refuse.
      val winnerOps = versions(spark, root).filter(_ >= n)
        .map(readManifest(fs, root, _).operation)
      winnerOps.find(conflictsWith(operation, _)).foreach { w =>
        throw new ConcurrentCommitException(
          s"VersionedStore: '$operation' at $root lost version $n to a " +
            s"concurrent '$w' commit and cannot be replayed safely " +
            "(blind overwrite intent); re-read and re-issue explicitly")
      }
      attempt += 1
    }
    throw new ConcurrentCommitException(
      s"VersionedStore: '$operation' at $root exceeded $maxRetries retries " +
        "under concurrent write pressure")
  }
}
