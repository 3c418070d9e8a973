package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.temporal.{Bitemporal, VersionedStore}

/** Bitemporal pins over VersionedStore + SCD2 intervals: retroactive
  * restatement visibility, pin isolation, interval boundary semantics,
  * and the retroDiff belief classification. */
class BitemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"bitemp_$tag").toString
    new java.io.File(p).delete(); p
  }

  // (key, valid_from, valid_to (null = open), balance)
  private def iv(rows: (Long, String, String, Double)*) =
    rows.toDF("id", "valid_from", "valid_to", "bal")
      .withColumn("valid_to",
        when(col("valid_to") === "", null).otherwise(col("valid_to")))

  private def pinMap(root: String, tv: Long, v: String): Map[Long, Double] =
    Bitemporal.asKnownAt(spark, root, tv, lit(v))
      .select("id", "bal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("a retroactive correction changes the past only in the new version") {
    val root = freshRoot("retro")
    // v1 belief: id 1 earned 10.0 through 1995, then 20.0 onward
    VersionedStore.commit(spark, root, iv(
      (1L, "1994-01-01", "1995-01-01", 10.0),
      (1L, "1995-01-01", "", 20.0)), "v1")
    // v2: restate the 1994 interval to 7.5 (the past was wrong)
    VersionedStore.commit(spark, root, iv(
      (1L, "1994-01-01", "1995-01-01", 7.5),
      (1L, "1995-01-01", "", 20.0)), "v2")
    assert(pinMap(root, 1L, "1994-06-15") == Map(1L -> 10.0)) // old belief
    assert(pinMap(root, 2L, "1994-06-15") == Map(1L -> 7.5))  // restated
    // the present is unaffected by the restatement in both versions
    assert(pinMap(root, 1L, "1996-01-01") == Map(1L -> 20.0))
    assert(pinMap(root, 2L, "1996-01-01") == Map(1L -> 20.0))
  }

  test("interval boundaries: from-inclusive, to-exclusive, open tail") {
    val root = freshRoot("bounds")
    VersionedStore.commit(spark, root, iv(
      (1L, "1994-01-01", "1995-01-01", 1.0),
      (1L, "1995-01-01", "", 2.0)), "v1")
    assert(pinMap(root, 1L, "1994-01-01") == Map(1L -> 1.0)) // from incl
    assert(pinMap(root, 1L, "1994-12-31") == Map(1L -> 1.0))
    assert(pinMap(root, 1L, "1995-01-01") == Map(1L -> 2.0)) // to excl
    assert(pinMap(root, 1L, "2099-01-01") == Map(1L -> 2.0)) // open
    assert(pinMap(root, 1L, "1993-12-31").isEmpty)           // before birth
  }

  test("retroDiff classifies RESTATED / LEARNED / FORGOTTEN / UNCHANGED") {
    val root = freshRoot("diff")
    VersionedStore.commit(spark, root, iv(
      (1L, "1994-01-01", "", 10.0),   // will be restated
      (2L, "1994-01-01", "", 20.0),   // will be forgotten (about 1994)
      (3L, "1994-01-01", "", 30.0)),  // unchanged
      "v1")
    VersionedStore.commit(spark, root, iv(
      (1L, "1994-01-01", "", 11.0),
      (2L, "1995-01-01", "", 20.0),   // now only true FROM 1995
      (3L, "1994-01-01", "", 30.0),
      (4L, "1994-01-01", "", 40.0)),  // newly learned about 1994
      "v2")
    val got = Bitemporal.retroDiff(spark, root, 1L, 2L,
        lit("1994-06-15"), Seq("id"), Seq("bal"))
      .select("id", "belief").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "RESTATED", 2L -> "FORGOTTEN",
      3L -> "UNCHANGED", 4L -> "LEARNED"))
  }

  test("a v1 pin taken before later commits still reads v1 afterwards") {
    val root = freshRoot("iso")
    VersionedStore.commit(spark, root, iv((1L, "1994-01-01", "", 1.0)), "v1")
    val pinned = Bitemporal.asKnownAt(spark, root, 1L, lit("1994-06-15"))
    VersionedStore.commit(spark, root, iv((1L, "1994-01-01", "", 99.0)), "v2")
    VersionedStore.commit(spark, root, iv((1L, "1994-01-01", "", 98.0)), "v3")
    assert(pinned.select("bal").collect().map(_.getDouble(0)).toSeq == Seq(1.0))
  }
}
