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

  test("Pipeline.currentTable recovers a mid-swap state directory") {
    val state = java.nio.file.Files.createTempDirectory("graft-swap-e2e").toString
    val t = s"$state/current_contacts"
    write(s"$t.next", 7); touch(s"$t.swap") // killed between delete and rename
    val cur = Pipeline.currentTable(spark, state, "contacts")
      .getOrElse(fail("recovered table must be readable"))
    assert(cur.select("version").as[Int].head() == 7)
    rmr(state)
  }
}
