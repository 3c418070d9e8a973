package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Expectations.Expectation
import graft.temporal.{VersionedStore, Wap}

/** Write-audit-publish over VersionedStore: gate decisions, abort
  * hygiene, publish-by-rename, and audit-reads-staged-bytes. */
class WapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String = {
    val p = java.nio.file.Files.createTempDirectory("wap").toString
    new java.io.File(p).delete(); p
  }

  private val posQty = Expectation("positive_qty", col("qty") > 0, "drop")
  private val shortName =
    Expectation("short_name", length(col("name")) <= 5, "warn")

  private def rows(xs: (Long, Int, String)*) = xs.toDF("id", "qty", "name")

  test("clean batch publishes; store reads exactly the staged rows") {
    val root = freshRoot()
    val out = Wap.writeAuditPublish(spark, root,
      rows((1L, 5, "a"), (2L, 3, "b")), Seq(posQty, shortName))
    assert(out.published.contains(1L))
    assert(VersionedStore.read(spark, root)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("gating violation aborts all-or-nothing; store untouched") {
    val root = freshRoot()
    Wap.writeAuditPublish(spark, root, rows((1L, 5, "a")), Seq(posQty))
    val out = Wap.writeAuditPublish(spark, root,
      rows((2L, 0, "b"), (3L, 4, "c")), Seq(posQty))
    assert(out.published.isEmpty)
    assert(out.metrics.exists(m => m._1 == "positive_qty" && m._3 == 1L))
    assert(out.quarantineSample.length == 1)
    // the clean row 3 did NOT slip in: publish is whole-or-nothing
    assert(VersionedStore.read(spark, root)
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(VersionedStore.versions(spark, root) == Seq(1L))
  }

  test("abort leaves no staged debris under _wap") {
    val root = freshRoot()
    Wap.writeAuditPublish(spark, root, rows((1L, 0, "x")), Seq(posQty))
    val wap = new java.io.File(s"$root/_wap")
    assert(!wap.exists() || wap.listFiles().isEmpty)
  }

  test("warn violations count but never block the publish") {
    val root = freshRoot()
    val out = Wap.writeAuditPublish(spark, root,
      rows((1L, 2, "a-very-long-name")), Seq(posQty, shortName))
    assert(out.published.contains(1L))
    assert(out.metrics.exists(m => m._1 == "short_name" && m._3 == 1L))
  }

  test("publish is by rename: audited staged files ARE the version files") {
    val root = freshRoot()
    val out = Wap.writeAuditPublish(spark, root,
      rows((1L, 1, "a"), (2L, 2, "b")), Seq(posQty))
    // no _wap leftovers and v1 contains plain parquet part files
    val v1 = new java.io.File(f"$root/v${out.published.get}%012d")
    assert(v1.exists() && v1.listFiles().exists(_.getName.endsWith(".parquet")))
    assert(!new java.io.File(s"$root/_wap").exists() ||
      new java.io.File(s"$root/_wap").listFiles().isEmpty)
  }

  test("sequential WAP batches append versions like normal commits") {
    val root = freshRoot()
    Wap.writeAuditPublish(spark, root, rows((1L, 1, "a")), Seq(posQty))
    Wap.writeAuditPublish(spark, root, rows((2L, 2, "b")), Seq(posQty))
    assert(VersionedStore.versions(spark, root) == Seq(1L, 2L))
    assert(VersionedStore.readVersion(spark, root, 1L).count() == 1)
    assert(VersionedStore.read(spark, root).count() == 1) // latest pin
  }
}
