package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.temporal.VersionedStore

/** The version log's contract: manifests are the commit point, pinned
  * readers are isolated from later commits (including compaction), gc
  * alone invalidates pins and only past the horizon, and every crash
  * state a commit or gc can leave is invisible to readers and cleaned
  * by the next writer pass. Crash points are simulated by reproducing
  * the exact on-disk state the protocol leaves at each step (the
  * AtomicSwapSpec discipline). */
class VersionedStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-vstore-$tag").toString + "/store"

  private def df(vals: Int*) = vals.map(v => (v.toLong, s"r$v")).toDF("k", "s")

  private def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    d.as[(Long, String)].collect().toSet

  test("commit/read roundtrip; versions ascend; log records operations") {
    val root = freshRoot("rt")
    assert(VersionedStore.versions(spark, root).isEmpty)
    assert(VersionedStore.currentVersion(spark, root).isEmpty)
    val v1 = VersionedStore.commit(spark, root, df(1, 2, 3))
    val v2 = VersionedStore.commit(spark, root, df(4, 5), operation = "merge")
    assert((v1, v2) == (1L, 2L))
    assert(VersionedStore.versions(spark, root) == Seq(1L, 2L))
    assert(rows(VersionedStore.read(spark, root)) == Set((4L, "r4"), (5L, "r5")))
    val log = VersionedStore.log(spark, root)
    assert(log.map(_.operation) == Seq("write", "merge"))
    assert(log.forall(i => i.files > 0 && i.bytes > 0))
  }

  test("snapshot isolation: a pinned reader is untouched by later commits") {
    val root = freshRoot("pin")
    VersionedStore.commit(spark, root, df(1, 2))
    val pinned = VersionedStore.readVersion(spark, root, 1) // lazy plan
    VersionedStore.commit(spark, root, df(9))
    VersionedStore.commit(spark, root, df(10, 11, 12))
    // materialize AFTER the concurrent commits: still version 1's rows
    assert(rows(pinned) == Set((1L, "r1"), (2L, "r2")))
    assert(rows(VersionedStore.readVersion(spark, root, 1)) ==
      Set((1L, "r1"), (2L, "r2")))
  }

  test("gc keeps the newest K, removes the rest, and fails pins past the horizon") {
    val root = freshRoot("gc")
    (1 to 4).foreach(i => VersionedStore.commit(spark, root, df(i)))
    val removed = VersionedStore.gc(spark, root, keep = 2)
    assert(removed == Seq(1L, 2L))
    assert(VersionedStore.versions(spark, root) == Seq(3L, 4L))
    assert(rows(VersionedStore.readVersion(spark, root, 3)) == Set((3L, "r3")))
    val e = intercept[IllegalArgumentException](
      VersionedStore.readVersion(spark, root, 1))
    assert(e.getMessage.contains("retained: 3..4"))
    assert(!new java.io.File(s"$root/v000000000001").exists(),
      "expired data dirs must be deleted")
  }

  test("crashed commit (data dir renamed, no manifest) is invisible and reclaimed") {
    val root = freshRoot("crash")
    VersionedStore.commit(spark, root, df(1))
    // simulate: a second commit crashed after the v2 rename, before the
    // manifest write — an unmanifested data dir
    df(99).write.parquet(s"$root/v000000000002")
    assert(VersionedStore.currentVersion(spark, root).contains(1L),
      "readers must not see the unmanifested version")
    val v2 = VersionedStore.commit(spark, root, df(2))
    assert(v2 == 2L)
    assert(rows(VersionedStore.read(spark, root)) == Set((2L, "r2")),
      "the retried commit must replace the crashed leftover, not merge with it")
  }

  test("crashed gc (manifest gone, dir left) is swept by the next gc") {
    val root = freshRoot("gcrash")
    (1 to 3).foreach(i => VersionedStore.commit(spark, root, df(i)))
    // simulate: gc deleted v1's manifest then crashed before the dir
    val m = new java.io.File(s"$root/_log/000000000001.json")
    assert(m.delete())
    assert(new java.io.File(s"$root/v000000000001").exists())
    VersionedStore.gc(spark, root, keep = 2)
    assert(!new java.io.File(s"$root/v000000000001").exists(),
      "orphaned dir below the horizon must be swept")
    assert(VersionedStore.versions(spark, root) == Seq(2L, 3L))
  }

  test("compact: fewer files, identical rows, new version; pinned old version intact") {
    val root = freshRoot("opt")
    val wide = (1 to 200).map(v => (v.toLong, s"r$v")).toDF("k", "s")
    VersionedStore.commit(spark, root, wide.repartition(16))
    assert(VersionedStore.log(spark, root).head.files == 16)
    val compacted = VersionedStore.compact(spark, root)
    assert(compacted.contains(2L))
    val log = VersionedStore.log(spark, root)
    assert(log.last.operation == "compact")
    assert(log.last.files == 1, s"bin-pack to one file, got ${log.last.files}")
    assert(rows(VersionedStore.read(spark, root)) == rows(
      VersionedStore.readVersion(spark, root, 1)),
      "compaction must be read-equivalent")
    // already compact -> no-op, no new version
    assert(VersionedStore.compact(spark, root).isEmpty)
    assert(VersionedStore.currentVersion(spark, root).contains(2L))
  }

  test("schema evolution: add + widen + drop merge; each version keeps its own schema") {
    import org.apache.spark.sql.types._
    val root = freshRoot("evolve")
    VersionedStore.commit(spark, root,
      Seq((1, "a"), (2, "b")).toDF("k", "s")
        .select(col("k").cast("int").as("k"), col("s")), "base")
    // writer widens k to long, drops s, adds v
    VersionedStore.commitEvolved(spark, root,
      Seq((2L, 0.5), (3L, 1.5)).toDF("k", "v"), "evolve")
    // v1 reads with its OWN (pre-evolution) schema
    val s1 = VersionedStore.readVersion(spark, root, 1).schema
    assert(s1("k").dataType == IntegerType && s1.fieldNames.toSeq == Seq("k", "s"))
    // v2 landed with the evolved schema: k widened, s retained null, v added
    val v2 = VersionedStore.readVersion(spark, root, 2)
    assert(v2.schema("k").dataType == LongType)
    assert(v2.schema.fieldNames.toSeq == Seq("k", "s", "v"))
    assert(v2.filter(col("s").isNotNull).count() == 0, "dropped column null-fills")
    // union read: one table, missing -> null, _version stamped
    val u = VersionedStore.readUnion(spark, root)
    assert(u.schema("k").dataType == LongType)
    val got = u.select("_version", "k", "s", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSet
    assert(got == Set(
      (1L, 1L, Some("a"), None), (1L, 2L, Some("b"), None),
      (2L, 2L, None, Some(0.5)), (2L, 3L, None, Some(1.5))))
  }

  test("schema evolution: reorder is a no-op, incompatible changes refuse") {
    val root = freshRoot("refuse")
    VersionedStore.commit(spark, root, Seq((1L, "a")).toDF("k", "s"), "base")
    // reordered writer: same schema, matched by name
    VersionedStore.commitEvolved(spark, root,
      Seq(("b", 2L)).toDF("s", "k"), "reorder")
    assert(VersionedStore.read(spark, root).schema.fieldNames.toSeq == Seq("k", "s"))
    // an int write into a long column UPCASTS on write — the table
    // schema never narrows (Delta's upcast-on-write, not an evolution)
    VersionedStore.commitEvolved(spark, root,
      Seq((3, "c")).toDF("k", "s")
        .select(col("k").cast("int").as("k"), col("s")), "upcast")
    val after = VersionedStore.read(spark, root)
    assert(after.schema("k").dataType ==
      org.apache.spark.sql.types.LongType, "table schema must not narrow")
    assert(after.count() == 1)
    // string -> number flip refuses
    val flip = intercept[RuntimeException] {
      VersionedStore.commitEvolved(spark, root,
        Seq((3L, 9L)).toDF("k", "s"), "bad")
    }
    assert(flip.getMessage.contains("incompatible schema change"))
    // long -> double refuses (lossy past 2^53)
    intercept[RuntimeException] {
      VersionedStore.commitEvolved(spark, root,
        Seq((3.0, "c")).toDF("k", "s"), "bad")
    }
    // refusals happened BEFORE any byte landed: still 3 versions
    assert(VersionedStore.versions(spark, root) == Seq(1L, 2L, 3L))
  }

  // ---- optimistic concurrency (transact) ---------------------------
  // Interleavings are DETERMINISTIC: the losing transaction's body
  // triggers the winning commit inline on its first invocation, so the
  // loser is guaranteed to compute against a stale snapshot and lose
  // the manifest CAS — the exact race, every run.

  private def appendTxn(root: String, vals: Int*): VersionedStore.TxnResult =
    VersionedStore.transact(spark, root, "append") { cur =>
      cur.map(_.unionByName(df(vals: _*))).getOrElse(df(vals: _*))
    }

  test("occ: append racing append — loser recomputes and converges") {
    val root = freshRoot("occ-aa")
    VersionedStore.commit(spark, root, df(1))
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val res = VersionedStore.transact(spark, root, "append") { cur =>
      if (fired.compareAndSet(false, true)) appendTxn(root, 2) // winner
      cur.map(_.unionByName(df(3))).getOrElse(df(3))
    }
    assert(res.retries == 1, "the loser must have recomputed exactly once")
    assert(res.version == 3L, "winner took v2, retried loser lands v3")
    assert(rows(VersionedStore.read(spark, root)) ==
      Set((1L, "r1"), (2L, "r2"), (3L, "r3")),
      "no lost update: both appends present")
  }

  test("occ: append racing compact — both orders converge, rows exact") {
    val root = freshRoot("occ-ac")
    VersionedStore.commit(spark, root, df(1, 2).repartition(8))
    // compact loses to a concurrent append
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val res = VersionedStore.transact(spark, root, "compact") { cur =>
      if (fired.compareAndSet(false, true)) appendTxn(root, 3)
      cur.get.coalesce(1)
    }
    assert(res.retries == 1)
    assert(rows(VersionedStore.read(spark, root)) ==
      Set((1L, "r1"), (2L, "r2"), (3L, "r3")),
      "the retried compaction must carry the winner's appended row")
    assert(VersionedStore.log(spark, root).last.files == 1)
    // append loses to a concurrent compaction
    val fired2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    val res2 = VersionedStore.transact(spark, root, "append") { cur =>
      if (fired2.compareAndSet(false, true))
        VersionedStore.transact(spark, root, "compact")(c => c.get.coalesce(1))
      cur.get.unionByName(df(4))
    }
    assert(res2.retries == 1)
    assert(rows(VersionedStore.read(spark, root)) ==
      Set((1L, "r1"), (2L, "r2"), (3L, "r3"), (4L, "r4")))
  }

  test("occ: delete racing compact — predicate re-evaluates on the compacted snapshot") {
    val root = freshRoot("occ-dc")
    VersionedStore.commit(spark, root, df(1, 2, 3).repartition(8))
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val res = VersionedStore.transact(spark, root, "delete") { cur =>
      if (fired.compareAndSet(false, true))
        VersionedStore.transact(spark, root, "compact")(c => c.get.coalesce(1))
      cur.get.filter(col("k") =!= 2L)
    }
    assert(res.retries == 1)
    assert(rows(VersionedStore.read(spark, root)) ==
      Set((1L, "r1"), (3L, "r3")),
      "delete applied on top of the compacted snapshot")
  }

  test("occ: blind overwrite losing a race REFUSES and leaves the store untouched") {
    val root = freshRoot("occ-ow")
    VersionedStore.commit(spark, root, df(1))
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[VersionedStore.ConcurrentCommitException] {
      VersionedStore.transact(spark, root, "overwrite") { _ =>
        if (fired.compareAndSet(false, true)) appendTxn(root, 2)
        df(99)
      }
    }
    assert(e.getMessage.contains("cannot be replayed safely"))
    assert(VersionedStore.versions(spark, root) == Seq(1L, 2L),
      "only the winner's commit exists")
    assert(rows(VersionedStore.read(spark, root)) ==
      Set((1L, "r1"), (2L, "r2")),
      "the refused overwrite must not have landed anything")
    // an UNCONTENDED overwrite is fine (no winner to lose to)
    val ok = VersionedStore.transact(spark, root, "overwrite")(_ => df(7))
    assert(ok.retries == 0 && ok.version == 3L)
    assert(rows(VersionedStore.read(spark, root)) == Set((7L, "r7")))
  }

  test("occ: reader pinned mid-race sees one consistent version throughout") {
    val root = freshRoot("occ-pin")
    VersionedStore.commit(spark, root, df(1, 2))
    val pinned = VersionedStore.readVersion(spark, root, 1)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    VersionedStore.transact(spark, root, "append") { cur =>
      if (fired.compareAndSet(false, true)) appendTxn(root, 3)
      // materialize the pin in the middle of the race
      assert(rows(pinned) == Set((1L, "r1"), (2L, "r2")))
      cur.get.unionByName(df(4))
    }
    // and after the dust settles: still version 1's rows
    assert(rows(pinned) == Set((1L, "r1"), (2L, "r2")))
    assert(rows(VersionedStore.readVersion(spark, root, 1)) ==
      Set((1L, "r1"), (2L, "r2")))
  }

  test("occ: two real threads x 5 appends each all land, no lost updates") {
    val root = freshRoot("occ-thr")
    VersionedStore.commit(spark, root, df(0))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val tasks = (1 to 2).map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            (1 to 5).foreach(i => appendTxn(root, t * 10 + i))
        })
      }
      tasks.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(VersionedStore.currentVersion(spark, root).contains(11L),
      "1 base + 10 appends = 11 sequential versions")
    val expect = Set(0L) ++ (1 to 2).flatMap(t => (1 to 5).map(i => (t * 10 + i).toLong))
    assert(rows(VersionedStore.read(spark, root)) ==
      expect.map(v => (v, s"r$v")),
      "every append from both threads must be present exactly once")
  }

  test("occ: crashed loser's orphan data dir is swept by gc past the grace window") {
    val root = freshRoot("occ-orphan")
    VersionedStore.commit(spark, root, df(1))
    appendTxn(root, 2)
    // simulate a txn that crashed between data rename and manifest CAS
    df(99).write.parquet(s"$root/d-000000000009-deadbeef")
    assert(VersionedStore.currentVersion(spark, root).contains(2L),
      "the orphan is invisible to readers")
    // within the grace window the orphan survives (it could be in-flight)
    VersionedStore.gc(spark, root, keep = 2, orphanGraceMs = 3600000L)
    assert(new java.io.File(s"$root/d-000000000009-deadbeef").exists())
    // past the window it is reclaimed; committed data dirs stay
    VersionedStore.gc(spark, root, keep = 2, orphanGraceMs = 0L)
    assert(!new java.io.File(s"$root/d-000000000009-deadbeef").exists(),
      "unreferenced txn dir past grace must be swept")
    assert(rows(VersionedStore.read(spark, root)) ==
      Set((1L, "r1"), (2L, "r2")), "referenced txn dirs are untouched")
  }

  test("occ: a crash DURING staging leaves .stage-<txn>; gc sweeps it past grace") {
    val root = freshRoot("occ-stage")
    VersionedStore.commit(spark, root, df(1))
    // simulate a transact that died mid-parquet-write: txnIds are never
    // reused, so without the sweep this dir would live forever (the
    // round-12 advice's leak — the fixed-name single-writer `.stage`
    // self-cleans on the next commit; these cannot)
    df(99).write.parquet(s"$root/.stage-deadbeef")
    // within the grace window it survives (could be an in-flight write)
    VersionedStore.gc(spark, root, keep = 1, orphanGraceMs = 3600000L)
    assert(new java.io.File(s"$root/.stage-deadbeef").exists())
    // past the window it is reclaimed
    VersionedStore.gc(spark, root, keep = 1, orphanGraceMs = 0L)
    assert(!new java.io.File(s"$root/.stage-deadbeef").exists(),
      "crashed-staging dir past grace must be swept")
    assert(rows(VersionedStore.read(spark, root)) == Set((1L, "r1")))
  }
}
