package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.temporal.AtomicSwap

/** The marker-protocol swap must make every crash point recoverable:
  * once the marker exists, the fully-written `.next` is the truth and a
  * reader rolls the swap forward; before the marker, the old state stays
  * current. Crash points are simulated by reproducing the exact on-disk
  * state the protocol leaves at each step. */
class AtomicSwapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-swap-$tag").toString
    s"$dir/current"
  }
  private def write(path: String, v: Int): Unit =
    Seq((1L, v)).toDF("id", "version").write.mode("overwrite").parquet(path)
  private def version(path: String): Int =
    spark.read.parquet(path).select("version").as[Int].head()
  private def touch(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, true).close()
  }
  private def rmr(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  test("completed swap replaces the table; recover is then a no-op") {
    val t = freshTable("ok")
    write(t, 1); write(s"$t.next", 2)
    AtomicSwap.swapIn(spark, t)
    assert(version(t) == 2)
    AtomicSwap.recover(spark, t)
    assert(version(t) == 2)
  }

  test("kill between delete and rename: reader rolls forward to the new state") {
    val t = freshTable("mid")
    // on-disk state after steps 1-3 (next written, marker created, old
    // state deleted) with the process killed before the rename:
    write(s"$t.next", 2); touch(s"$t.swap")
    AtomicSwap.recover(spark, t)
    assert(version(t) == 2, "marker + complete .next must roll forward")
    assert(!new java.io.File(s"$t.swap").exists())
    assert(!new java.io.File(s"$t.next").exists())
  }

  test("kill after marker but before delete: old state replaced, not merged") {
    val t = freshTable("pre")
    write(t, 1); write(s"$t.next", 2); touch(s"$t.swap")
    AtomicSwap.recover(spark, t)
    assert(version(t) == 2)
    assert(spark.read.parquet(t).count() == 1, "old files must not survive")
  }

  test("kill after rename but before marker cleanup: stale marker is dropped") {
    val t = freshTable("post")
    write(t, 2); touch(s"$t.swap") // .next already renamed in
    AtomicSwap.recover(spark, t)
    assert(version(t) == 2)
    assert(!new java.io.File(s"$t.swap").exists())
  }

  test("partial .next without marker is ignored (crash mid-write of .next)") {
    val t = freshTable("partial")
    write(t, 1); write(s"$t.next", 99) // "partial": never markered
    AtomicSwap.recover(spark, t)
    assert(version(t) == 1, "unmarkered .next must not become current")
    // the next swapIn overwrites and completes normally
    write(s"$t.next", 2)
    AtomicSwap.swapIn(spark, t)
    assert(version(t) == 2)
  }

  test("Pipeline.currentTable reads a mid-swap state WITHOUT mutating it") {
    val state = java.nio.file.Files.createTempDirectory("graft-swap-e2e").toString
    val t = s"$state/current_contacts"
    write(s"$t.next", 7); touch(s"$t.swap") // killed between delete and rename
    val cur = Pipeline.currentTable(spark, state, "contacts")
      .getOrElse(fail("mid-swap table must be readable"))
    assert(cur.select("version").as[Int].head() == 7,
      "reader must resolve the marker-certified .next")
    // Readers never join the swap protocol: a reader racing a live writer
    // must not delete/rename anything (that interleaving loses state).
    assert(new java.io.File(s"$t.swap").exists(), "reader must not touch the marker")
    assert(new java.io.File(s"$t.next").exists(), "reader must not rename .next")
    // The next WRITER rolls it forward.
    AtomicSwap.recover(spark, state + "/current_contacts")
    assert(version(t) == 7)
    assert(!new java.io.File(s"$t.swap").exists())
    rmr(state)
  }

  // --- sidecar protocol: a staged CDC batch commits atomically with the swap ---

  private def sidecarFixture(tag: String): (String, AtomicSwap.Sidecar) = {
    val t = freshTable(tag)
    val dir = new java.io.File(t).getParent
    (t, AtomicSwap.Sidecar(s"$dir/log.stage", s"$dir/log"))
  }
  private def logCount(dest: String): Long =
    if (new java.io.File(dest).exists()) spark.read.parquet(dest).count() else 0L

  test("sidecar: staged batch lands in the log exactly when the swap commits") {
    val (t, sc) = sidecarFixture("sc-ok")
    write(t, 1); write(s"$t.next", 2)
    Seq(("e1", "added")).toDF("edge", "change").write.parquet(sc.stage)
    AtomicSwap.swapIn(spark, t, Seq(sc))
    assert(version(t) == 2)
    assert(logCount(sc.dest) == 1, "staged batch must be committed")
    assert(!new java.io.File(sc.stage).exists(), "stage must be consumed")
    // second swap appends a second batch — part-file names never collide
    write(s"$t.next", 3)
    Seq(("e2", "removed")).toDF("edge", "change").write.parquet(sc.stage)
    AtomicSwap.swapIn(spark, t, Seq(sc))
    assert(logCount(sc.dest) == 2, "log accumulates across swaps")
  }

  test("sidecar: kill between rename and commit — recover lands the batch once") {
    val (t, sc) = sidecarFixture("sc-mid")
    // on-disk state: rename done (cur == new), stage written, marker present
    write(t, 2); touch(s"$t.swap")
    Seq(("e1", "added")).toDF("edge", "change").write.parquet(sc.stage)
    AtomicSwap.recover(spark, t, Seq(sc))
    assert(version(t) == 2)
    assert(logCount(sc.dest) == 1, "marker-certified stage must commit")
    AtomicSwap.recover(spark, t, Seq(sc)) // idempotent
    assert(logCount(sc.dest) == 1, "recover must not double-commit")
  }

  test("sidecar: unmarkered stage is garbage recover must NOT commit") {
    val (t, sc) = sidecarFixture("sc-stale")
    write(t, 1)
    Seq(("e1", "added")).toDF("edge", "change").write.parquet(sc.stage)
    AtomicSwap.recover(spark, t, Seq(sc)) // no marker: crashed before step 2
    assert(logCount(sc.dest) == 0, "uncertified batch must not land")
    assert(new java.io.File(sc.stage).exists(), "recover leaves it for the writer")
  }
}
