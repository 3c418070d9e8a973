package graft.temporal

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named refs over a [[VersionedStore]] — branches and tags in the
  * Iceberg/Nessie shape: a ref is a POINTER into the shared, immutable
  * snapshot history, so creating one is O(1) metadata (no data copied),
  * and the whole feature composes with the store's OCC commits:
  *
  *   - a TAG pins one version forever (immutable once created);
  *   - a BRANCH points at a head version and moves ONLY by
  *     compare-and-swap against the head the committer read, so two
  *     writers racing the same branch serialize exactly like
  *     [[VersionedStore.transact]] losers (recompute-and-retry);
  *   - branch commits land in the SAME version log (each manifest
  *     records its `parent`, so ancestry is a chain walk), which keeps
  *     every store invariant intact: `VersionedStore.read` stays "the
  *     log head" (the physical, linear view), `readBranch` is the
  *     ref-head view. USAGE CONTRACT: a store that adopts refs writes
  *     EXCLUSIVELY through [[commitToBranch]] (create a "main" branch
  *     first) — a plain `transact` bases itself on the log head, which
  *     after a feature-branch commit is that branch's snapshot, not
  *     main's. Stores that never create refs keep the plain
  *     commit/transact/read face unchanged;
  *   - [[VersionedStore.gc]] never deletes a version a ref pins
  *     (snapshots are FULL, so only the pointed version needs
  *     retention — no ancestor chain must survive, the property that
  *     makes ref-aware GC a set lookup instead of reachability).
  *
  * Layout: `root/_refs/branch-<name>` / `root/_refs/tag-<name>`, each
  * holding the version number. Ref updates write-temp-then-rename and
  * are serialized per root by the same JVM lock discipline as the
  * manifest CAS (HDFS rename is atomic; local needs the lock).
  */
object Refs {

  private val RefsDir = "_refs"

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def refPath(root: String, kind: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9._-]+"), s"Refs: bad ref name '$name'")
    new Path(new Path(root, RefsDir), s"$kind-$name")
  }

  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(new Path(root).toUri.toString, _ => new Object)

  private def readRef(fs: FileSystem, p: Path): Option[Long] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String({
        val buf = new Array[Byte](64)
        val n = in.read(buf); buf.take(math.max(n, 0))
      }, "UTF-8").trim.toLong)
      finally in.close()
    }

  private def writeRef(fs: FileSystem, root: String, p: Path, v: Long): Unit = {
    val dir = new Path(root, RefsDir)
    if (!fs.exists(dir)) require(fs.mkdirs(dir), s"Refs: mkdirs $dir failed")
    val tmp = new Path(dir, s".tmp-${p.getName}")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) require(fs.delete(p, false), s"Refs: replace $p failed")
    require(fs.rename(tmp, p), s"Refs: rename $tmp -> $p failed")
  }

  /** Every version some ref (branch or tag) currently pins — consumed
    * by [[VersionedStore.gc]]. One directory listing + tiny reads. */
  def pinnedVersions(spark: SparkSession, root: String): Set[Long] = {
    val fs = fsOf(spark, root)
    val dir = new Path(root, RefsDir)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("branch-") || p.getName.startsWith("tag-"))
      .flatMap(readRef(fs, _)).toSet
  }

  /** Create a branch pointing at `atVersion` (default: the log head).
    * Refuses if the name exists — branches are created once. */
  def createBranch(spark: SparkSession, root: String, name: String,
      atVersion: Option[Long] = None): Long = lockFor(root).synchronized {
    val fs = fsOf(spark, root)
    val v = atVersion.getOrElse(VersionedStore.currentVersion(spark, root)
      .getOrElse(sys.error(s"Refs: nothing committed at $root")))
    require(VersionedStore.versions(spark, root).contains(v),
      s"Refs: version $v not retained at $root")
    val p = refPath(root, "branch", name)
    require(!fs.exists(p), s"Refs: branch '$name' already exists")
    writeRef(fs, root, p, v)
    v
  }

  /** Create an immutable tag at `atVersion`. */
  def createTag(spark: SparkSession, root: String, name: String,
      atVersion: Long): Unit = lockFor(root).synchronized {
    val fs = fsOf(spark, root)
    require(VersionedStore.versions(spark, root).contains(atVersion),
      s"Refs: version $atVersion not retained at $root")
    val p = refPath(root, "tag", name)
    require(!fs.exists(p), s"Refs: tag '$name' already exists (tags are immutable)")
    writeRef(fs, root, p, atVersion)
  }

  /** The version a branch currently points at. */
  def branchHead(spark: SparkSession, root: String, name: String): Long =
    readRef(fsOf(spark, root), refPath(root, "branch", name))
      .getOrElse(sys.error(s"Refs: no branch '$name' at $root"))

  /** The version a tag pins. */
  def tagVersion(spark: SparkSession, root: String, name: String): Long =
    readRef(fsOf(spark, root), refPath(root, "tag", name))
      .getOrElse(sys.error(s"Refs: no tag '$name' at $root"))

  /** Read a branch's head snapshot. */
  def readBranch(spark: SparkSession, root: String, name: String): DataFrame =
    VersionedStore.readVersion(spark, root, branchHead(spark, root, name))

  /** Read a tag's pinned snapshot. */
  def readTag(spark: SparkSession, root: String, name: String): DataFrame =
    VersionedStore.readVersion(spark, root, tagVersion(spark, root, name))

  /** OCC commit to a branch: derive the next snapshot from the branch
    * HEAD (not the log head), publish it as a new version in the shared
    * log with `parent` = that head, then move the ref — conditional on
    * the head still being the one this committer read. A concurrent
    * commit to the same branch loses exactly one of the two CAS points
    * and recomputes against the winner's head, same discipline (and
    * same conflict classes) as [[VersionedStore.transact]]. */
  def commitToBranch(spark: SparkSession, root: String, name: String,
      operation: String = "append", maxRetries: Int = 20,
      partitionCols: Seq[String] = Nil)
      (body: DataFrame => DataFrame): VersionedStore.TxnResult = {
    val fs = fsOf(spark, root)
    val txnId = java.util.UUID.randomUUID().toString.take(8)
    var attempt = 0
    while (attempt <= maxRetries) {
      val head = branchHead(spark, root, name)
      // version numbers come from the shared log: next free slot, read
      // BEFORE the body so a commit interleaved during the body's plan
      // construction surfaces as an ordinary CAS loss (retried below)
      val n = VersionedStore.currentVersion(spark, root).getOrElse(0L) + 1
      val out = body(VersionedStore.readVersion(spark, root, head))
      if (VersionedStore.casCommit(spark, root, out, n, operation,
          Some(head), partitionCols, txnId)) {
        // manifest won; now move the ref iff nobody moved it first
        val moved = lockFor(root).synchronized {
          if (branchHead(spark, root, name) == head) {
            writeRef(fs, root, refPath(root, "branch", name), n); true
          } else false
        }
        if (moved) return VersionedStore.TxnResult(n, attempt)
        // a concurrent branch commit won the ref between our read and
        // our manifest CAS; our version n stays in the log as an
        // orphaned (un-ref'd) snapshot — harmless, gc-able — and we
        // recompute against the new head
      }
      // Lost one of the two CAS points. Classify BEFORE retrying,
      // mirroring [[VersionedStore.transact]]: the winners are the
      // commits that moved THIS branch since our read (the new head's
      // parent chain back to the head we based on — a loss to another
      // branch's log-slot race leaves our base intact and is always
      // replayable). A blind `overwrite` that lost to a moved head
      // must refuse: replaying it would silently discard the winner's
      // changes — the lost-update class transact refuses.
      val newHead = branchHead(spark, root, name)
      if (newHead != head) {
        opsBetween(spark, root, newHead, head)
          .find(VersionedStore.conflictsWith(operation, _)).foreach { w =>
            throw new VersionedStore.ConcurrentCommitException(
              s"Refs: '$operation' on branch '$name' at $root lost to a " +
                s"concurrent '$w' commit (head $head -> $newHead) and " +
                "cannot be replayed safely (blind overwrite intent); " +
                "re-read and re-issue explicitly")
          }
      }
      attempt += 1
    }
    throw new VersionedStore.ConcurrentCommitException(
      s"Refs: branch '$name' at $root exceeded $maxRetries retries " +
        "under concurrent write pressure")
  }

  /** Operations on `from`'s parent chain back to (exclusive) `until` —
    * the winner set a lost branch commit classifies against. If the
    * chain never reaches `until` (a ref rewritten outside
    * [[commitToBranch]]/[[fastForward]]), every walked op counts as a
    * winner — the conservative read. O(chain length) tiny reads. */
  private def opsBetween(spark: SparkSession, root: String, from: Long,
      until: Long): Seq[String] = {
    val retained = VersionedStore.versions(spark, root).toSet
    val ops = Seq.newBuilder[String]
    var cur = Option(from)
    while (cur.exists(v => v != until && retained.contains(v))) {
      val m = VersionedStore.manifest(spark, root, cur.get)
      ops += m.operation
      cur = m.parent
    }
    ops.result()
  }

  /** Is `ancestor` on `descendant`'s parent chain (inclusive)? Walks
    * the manifests' parent pointers — O(chain length) tiny reads. */
  def isAncestor(spark: SparkSession, root: String, ancestor: Long,
      descendant: Long): Boolean = {
    var cur = Option(descendant)
    while (cur.isDefined) {
      if (cur.get == ancestor) return true
      cur = VersionedStore.manifest(spark, root, cur.get).parent
        .filter(VersionedStore.versions(spark, root).contains)
    }
    false
  }

  /** Fast-forward `target` to `source`'s head. Refuses when the target
    * head is not an ancestor of the source head (a divergent branch
    * needs a real merge — MERGE INTO on the snapshots — not a pointer
    * move that would silently drop the target's commits). */
  def fastForward(spark: SparkSession, root: String, target: String,
      source: String): Long = lockFor(root).synchronized {
    val fs = fsOf(spark, root)
    val t = branchHead(spark, root, target)
    val s0 = branchHead(spark, root, source)
    if (t == s0) return t
    require(isAncestor(spark, root, t, s0),
      s"Refs: '$target' (v$t) is not an ancestor of '$source' (v$s0) — " +
        "divergent histories cannot fast-forward")
    writeRef(fs, root, refPath(root, "branch", target), s0)
    s0
  }
}
