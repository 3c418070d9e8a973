package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.temporal.DeletionVectors

/** The merge-on-read contract: a delete never rewrites a data file
  * (byte-identical file list before/after), reads exclude exactly the
  * marked positions, deletes accumulate and are idempotent, appends
  * after a delete stay fully live, and materialize rewrites survivors
  * and clears the sidecar with no row drift. */
class DeletionVectorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-dv-$tag").toString + "/data"

  private def table(dir: String): Unit =
    (0 until 1000).map(i => (i.toLong, s"r$i")).toDF("k", "s")
      .repartition(8).write.parquet(dir)

  /** (path, size, mtime) of data files — the no-rewrite evidence. */
  private def fileState(dir: String): Set[(String, Long, Long)] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    val out = Set.newBuilder[(String, Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath.toUri.getPath
      if (f.getPath.getName.endsWith(".parquet") && !p.contains("/_dv/"))
        out += ((p, f.getLen, f.getModificationTime))
    }
    out.result()
  }

  test("delete marks rows without rewriting any data file; read excludes them") {
    val dir = freshDir("mark")
    table(dir)
    val before = fileState(dir)
    val n = DeletionVectors.delete(spark, dir, col("k") % 7 === 0)
    assert(n == 143, s"expected 143 marks, got $n")
    assert(fileState(dir) == before, "a delete must never touch a data file")
    val got = DeletionVectors.read(spark, dir).select("k").as[Long].collect().toSet
    assert(got == (0L until 1000L).filter(_ % 7 != 0).toSet)
    assert(DeletionVectors.read(spark, dir).columns.toSeq == Seq("k", "s"))
  }

  test("deletes accumulate and re-deleting is idempotent") {
    val dir = freshDir("acc")
    table(dir)
    DeletionVectors.delete(spark, dir, col("k") % 7 === 0)
    DeletionVectors.delete(spark, dir, col("k") >= 900)
    // re-issue the first delete: read() re-derives from live rows, so
    // the %7 rows are already gone; duplicates in the sidecar (replay
    // of the SAME marks) are harmless by anti-join semantics either way
    DeletionVectors.delete(spark, dir, col("k") % 7 === 0)
    val got = DeletionVectors.read(spark, dir).select("k").as[Long].collect().toSet
    assert(got == (0L until 900L).filter(_ % 7 != 0).toSet)
  }

  test("rows appended after a delete are fully live") {
    val dir = freshDir("ap")
    table(dir)
    DeletionVectors.delete(spark, dir, col("k") < 500)
    Seq((100L, "fresh")).toDF("k", "s")
      .coalesce(1).write.mode("append").parquet(dir)
    val got = DeletionVectors.read(spark, dir)
      .filter(col("k") === 100L).select("s").as[String].collect().toSet
    assert(got == Set("fresh"),
      "an appended file has no sidecar rows — its rows must all be live")
  }

  test("materialize rewrites survivors, clears the sidecar, keeps rows exact") {
    val dir = freshDir("mat")
    table(dir)
    DeletionVectors.delete(spark, dir, col("k") % 3 === 0)
    val want = DeletionVectors.read(spark, dir).select("k").as[Long].collect().toSet
    DeletionVectors.materialize(spark, dir, targetFiles = 2)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_dv")),
      "materialize must clear the sidecar")
    assert(spark.read.parquet(dir).select("k").as[Long].collect().toSet == want)
    assert(DeletionVectors.read(spark, dir).count() == want.size.toLong,
      "read() over a materialized dir is a plain read")
  }
}
