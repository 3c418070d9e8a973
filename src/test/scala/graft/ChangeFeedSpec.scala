package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.temporal.{ChangeFeed, VersionedStore}

/** The row-level CDF contract: every SCD change class maps to the right
  * image rows (resurrections are updates, unchanged and already-deleted
  * rows emit nothing), re-loading an identical snapshot produces an
  * EMPTY feed (the reference's idempotence invariant lifted to row
  * level), and the VersionedStore face reports NET changes — a value
  * that flips and flips back across the version range disappears. */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scd(rows: (String, String, Boolean)*): DataFrame =
    rows.toDF("hubspot_id", "snapshot_hash", "is_deleted")

  private def feedRows(f: DataFrame): Set[(String, String, String)] =
    f.select("hubspot_id", "snapshot_hash", "_change_type")
      .as[(String, String, String)].collect().toSet

  test("fromScdBatch: every change class maps to the right image rows") {
    val current = scd(
      ("a", "hA", false),  // unchanged
      ("b", "hB1", false), // updated
      ("c", "hC", false),  // deleted this batch
      ("d", "hD1", true),  // resurrected
      ("e", "hE", true))   // already deleted -> silent
    val incoming = scd(
      ("a", "hA", false),
      ("b", "hB2", false),
      ("d", "hD2", false),
      ("f", "hF", false))  // new
    val feed = ChangeFeed.fromScdBatch(current, incoming, commitVersion = 7L)
    assert(feedRows(feed) == Set(
      ("f", "hF", "insert"),
      ("b", "hB1", "update_preimage"), ("b", "hB2", "update_postimage"),
      ("d", "hD1", "update_preimage"), ("d", "hD2", "update_postimage"),
      ("c", "hC", "delete")))
    assert(feed.select("_commit_version").distinct().as[Long].collect().toSeq == Seq(7L))
  }

  test("fromScdBatch: re-loading an identical snapshot emits an empty feed") {
    val snap = scd(("a", "hA", false), ("b", "hB", false))
    assert(ChangeFeed.fromScdBatch(snap, snap, 2L).isEmpty)
  }

  test("betweenVersions: adjacent versions give the per-commit feed") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdf").toString + "/store"
    VersionedStore.commit(spark, root,
      Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 30)).toDF("k", "s", "n"))
    VersionedStore.commit(spark, root,
      Seq((1L, "x", 10), (2L, "y", 25), (4L, "w", 40)).toDF("k", "s", "n"))
    val feed = ChangeFeed.betweenVersions(spark, root, 1L, 2L, Seq("k"))
    val got = feed.select("k", "n", "_change_type")
      .as[(Long, Int, String)].collect().toSet
    assert(got == Set(
      (2L, 20, "update_preimage"), (2L, 25, "update_postimage"),
      (3L, 30, "delete"), (4L, 40, "insert")))
    assert(feed.select("_commit_version").distinct().as[Long].collect().toSeq == Seq(2L))
  }

  test("betweenVersions: distant versions report NET changes only") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdf-net").toString + "/store"
    val v1 = Seq((1L, 10), (2L, 20)).toDF("k", "n")
    VersionedStore.commit(spark, root, v1)
    VersionedStore.commit(spark, root, Seq((1L, 11), (2L, 20), (3L, 30)).toDF("k", "n"))
    VersionedStore.commit(spark, root, Seq((1L, 10), (2L, 20)).toDF("k", "n"))
    // v2 changed k=1 and inserted k=3; v3 reverted both -> net empty
    assert(ChangeFeed.betweenVersions(spark, root, 1L, 3L, Seq("k")).isEmpty)
    // but each adjacent step is visible
    assert(ChangeFeed.betweenVersions(spark, root, 2L, 3L, Seq("k")).count() == 3)
  }

  test("betweenVersions: null key components pair null-safely") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdf-null").toString + "/store"
    VersionedStore.commit(spark, root,
      Seq((Option.empty[String], 1), (Some("a"), 2)).toDF("k", "n"))
    VersionedStore.commit(spark, root,
      Seq((Option.empty[String], 1), (Some("a"), 3)).toDF("k", "n"))
    val feed = ChangeFeed.betweenVersions(spark, root, 1L, 2L, Seq("k"))
    // the null-keyed row is unchanged: it must NOT surface as delete+insert
    val got = feed.select("k", "n", "_change_type")
      .as[(Option[String], Int, String)].collect().toSet
    assert(got == Set(
      (Some("a"), 2, "update_preimage"), (Some("a"), 3, "update_postimage")))
  }
}
