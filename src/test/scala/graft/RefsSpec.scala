package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.temporal.{Refs, VersionedStore}

/** Branch/tag refs over the versioned store: O(1) branch creation,
  * ref-head isolation between branches, OCC on the branch pointer
  * (interleaved committers recompute and converge), immutable tags,
  * fast-forward with divergence refusal, and gc that never deletes a
  * ref-pinned snapshot. */
class RefsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-refs-$tag").toString + "/store"

  private def df(vals: Int*) = vals.map(v => (v.toLong, s"r$v")).toDF("k", "s")

  private def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    d.as[(Long, String)].collect().toSet

  test("branches diverge from one snapshot and stay isolated; ancestry tracks parents") {
    val root = freshRoot("iso")
    VersionedStore.commit(spark, root, df(1))
    Refs.createBranch(spark, root, "main")
    Refs.createBranch(spark, root, "feature") // both at v1, zero copy
    Refs.commitToBranch(spark, root, "feature")(cur => cur.unionByName(df(2)))
    Refs.commitToBranch(spark, root, "main")(cur => cur.unionByName(df(3)))
    assert(rows(Refs.readBranch(spark, root, "feature")) ==
      Set((1L, "r1"), (2L, "r2")), "feature must not see main's commit")
    assert(rows(Refs.readBranch(spark, root, "main")) ==
      Set((1L, "r1"), (3L, "r3")), "main must not see feature's commit")
    // ancestry: v1 is an ancestor of both heads; the heads are unrelated
    val f = Refs.branchHead(spark, root, "feature")
    val m = Refs.branchHead(spark, root, "main")
    assert(Refs.isAncestor(spark, root, 1L, f))
    assert(Refs.isAncestor(spark, root, 1L, m))
    assert(!Refs.isAncestor(spark, root, f, m))
    assert(!Refs.isAncestor(spark, root, m, f))
  }

  test("occ on the branch pointer: interleaved committers converge, no lost update") {
    val root = freshRoot("occ")
    VersionedStore.commit(spark, root, df(1))
    Refs.createBranch(spark, root, "main")
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val res = Refs.commitToBranch(spark, root, "main") { cur =>
      if (fired.compareAndSet(false, true))
        Refs.commitToBranch(spark, root, "main")(c => c.unionByName(df(2)))
      cur.unionByName(df(3))
    }
    assert(res.retries == 1, "the loser must recompute exactly once")
    assert(rows(Refs.readBranch(spark, root, "main")) ==
      Set((1L, "r1"), (2L, "r2"), (3L, "r3")))
  }

  test("a lost blind overwrite on a moved branch head refuses (no lost update)") {
    val root = freshRoot("ovr")
    VersionedStore.commit(spark, root, df(1))
    Refs.createBranch(spark, root, "main")
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ex = intercept[VersionedStore.ConcurrentCommitException] {
      Refs.commitToBranch(spark, root, "main", operation = "overwrite") { _ =>
        if (fired.compareAndSet(false, true))
          Refs.commitToBranch(spark, root, "main")(c => c.unionByName(df(2)))
        df(9) // blind replace, based on the head this committer read
      }
    }
    assert(ex.getMessage.contains("overwrite"), ex.getMessage)
    // the concurrent winner's commit survives — the loser replayed
    // NOTHING over it (the lost-update class transact refuses)
    assert(rows(Refs.readBranch(spark, root, "main")) ==
      Set((1L, "r1"), (2L, "r2")))
  }

  test("losing only the log slot to ANOTHER branch retries even for overwrite") {
    val root = freshRoot("slot")
    VersionedStore.commit(spark, root, df(1))
    Refs.createBranch(spark, root, "main")
    Refs.createBranch(spark, root, "side")
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    // the interleaved SIDE commit takes the version slot main wanted,
    // but main's own head never moves: main's overwrite intent still
    // presumes exactly the base it read — replay is safe, not a
    // conflict (this is what distinguishes the branch classification
    // from transact's log-level one)
    val res = Refs.commitToBranch(spark, root, "main",
        operation = "overwrite") { _ =>
      if (fired.compareAndSet(false, true))
        Refs.commitToBranch(spark, root, "side")(c => c.unionByName(df(2)))
      df(9)
    }
    assert(res.retries == 1, "the slot loser must recompute exactly once")
    assert(rows(Refs.readBranch(spark, root, "main")) == Set((9L, "r9")))
    assert(rows(Refs.readBranch(spark, root, "side")) ==
      Set((1L, "r1"), (2L, "r2")))
  }

  test("tags are immutable pins; duplicate branch/tag names refuse") {
    val root = freshRoot("tag")
    VersionedStore.commit(spark, root, df(1))
    Refs.createBranch(spark, root, "main")
    Refs.createTag(spark, root, "v1.0", 1L)
    Refs.commitToBranch(spark, root, "main")(c => c.unionByName(df(2)))
    assert(rows(Refs.readTag(spark, root, "v1.0")) == Set((1L, "r1")),
      "the tag must keep reading the pinned snapshot")
    intercept[IllegalArgumentException](Refs.createTag(spark, root, "v1.0", 2L))
    intercept[IllegalArgumentException](Refs.createBranch(spark, root, "main"))
  }

  test("fast-forward moves an ancestor head; divergent branches refuse") {
    val root = freshRoot("ff")
    VersionedStore.commit(spark, root, df(1))
    Refs.createBranch(spark, root, "main")
    Refs.createBranch(spark, root, "feature")
    Refs.commitToBranch(spark, root, "feature")(c => c.unionByName(df(2)))
    Refs.commitToBranch(spark, root, "feature")(c => c.unionByName(df(3)))
    // main (v1) is an ancestor of feature's head -> fast-forward works
    val ff = Refs.fastForward(spark, root, "main", "feature")
    assert(ff == Refs.branchHead(spark, root, "feature"))
    assert(rows(Refs.readBranch(spark, root, "main")) ==
      Set((1L, "r1"), (2L, "r2"), (3L, "r3")))
    // now both advance independently -> divergent -> refuse
    Refs.commitToBranch(spark, root, "main")(c => c.unionByName(df(4)))
    Refs.commitToBranch(spark, root, "feature")(c => c.unionByName(df(5)))
    val e = intercept[IllegalArgumentException](
      Refs.fastForward(spark, root, "main", "feature"))
    assert(e.getMessage.contains("divergent"))
  }

  test("gc keeps ref-pinned snapshots alive past any horizon") {
    val root = freshRoot("gc")
    VersionedStore.commit(spark, root, df(1))
    Refs.createBranch(spark, root, "main")
    Refs.createTag(spark, root, "pin", 1L)
    (2 to 6).foreach(i =>
      Refs.commitToBranch(spark, root, "main")(c => c.unionByName(df(i))))
    // keep=2 would normally expire v1..v4; the tag pins v1
    val removed = VersionedStore.gc(spark, root, keep = 2)
    assert(!removed.contains(1L), "tag-pinned v1 must survive gc")
    assert(removed == Seq(2L, 3L, 4L))
    assert(rows(Refs.readTag(spark, root, "pin")) == Set((1L, "r1")))
    assert(rows(Refs.readBranch(spark, root, "main")).size == 6)
  }
}
