package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.ZoneMap

/** The sidecar-pruning contract: a pruned read is row-identical to the
  * full-scan filter while planning strictly fewer files on a clustered
  * column; files the sidecar doesn't cover (appends, all-null stats)
  * are conservatively included; an interval outside the table prunes
  * everything but keeps the schema; partition columns survive the
  * path-list read. */
class ZoneMapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-zm-$tag").toString + "/data"

  /** 0..999 clustered into 8 range files on k. */
  private def clustered(dir: String): Unit = {
    (0 until 1000).map(i => (i.toLong, s"r$i")).toDF("k", "s")
      .repartitionByRange(8, col("k"))
      .write.parquet(dir)
    ZoneMap.build(spark, dir, Seq("k"))
  }

  test("interval prune: row-identical to full scan, strictly fewer files") {
    val dir = freshDir("iv")
    clustered(dir)
    val pr = ZoneMap.prune(spark, dir, "k", Some(lit(300L)), Some(lit(420L)))
    assert(pr.filesTotal == 8)
    assert(pr.filesSelected < 8 && pr.filesSelected >= 1,
      s"a 12% interval on a range-clustered layout must skip files, selected ${pr.filesSelected}")
    val got = pr.df.filter(col("k").between(300, 420)).select("k")
      .as[Long].collect().toSet
    assert(got == (300L to 420L).toSet)
  }

  test("point lookup selects at most the covering file(s)") {
    val dir = freshDir("pt")
    clustered(dir)
    val pr = ZoneMap.prune(spark, dir, "k", Some(lit(777L)), Some(lit(777L)))
    assert(pr.filesSelected <= 2, s"point lookup planned ${pr.filesSelected} files")
    assert(pr.df.filter(col("k") === 777L).count() == 1)
  }

  test("append after build: unindexed file is conservatively included") {
    val dir = freshDir("ap")
    clustered(dir)
    // late-arriving rows OUTSIDE every indexed range, appended unindexed
    Seq((5000L, "late")).toDF("k", "s").write.mode("append").parquet(dir)
    val pr = ZoneMap.prune(spark, dir, "k", Some(lit(4000L)), Some(lit(6000L)))
    assert(pr.df.filter(col("k") === 5000L).count() == 1,
      "rows in an unindexed file must never be pruned away")
    // stale sidecar rows for 8 indexed files prune; the new file rides along
    assert(pr.filesSelected == 1)
  }

  test("interval outside the table prunes every file, schema intact") {
    val dir = freshDir("none")
    clustered(dir)
    val pr = ZoneMap.prune(spark, dir, "k", Some(lit(100000L)), None)
    assert(pr.filesSelected == 0 && pr.filesTotal == 8)
    assert(pr.df.count() == 0)
    assert(pr.df.columns.toSeq == Seq("k", "s"))
  }

  test("all-null stats include the file") {
    val dir = freshDir("null")
    Seq((Some(1L), "a"), (Some(2L), "b")).toDF("k", "s")
      .coalesce(1).write.parquet(dir)
    Seq((Option.empty[Long], "n")).toDF("k", "s")
      .coalesce(1).write.mode("append").parquet(dir)
    ZoneMap.build(spark, dir, Seq("k"))
    val pr = ZoneMap.prune(spark, dir, "k", Some(lit(2L)), Some(lit(2L)))
    assert(pr.filesSelected == 2, "a file with only-null stats proves nothing — keep it")
    assert(pr.df.count() == 3)
  }

  test("z-order layout: conjunctive pruneAll skips on BOTH columns at once") {
    val dir = freshDir("zord")
    // x and y independent: a single-column sort can be tight on one of
    // them only; the z-ordered layout is tight on both.
    val df = (0 until 4096).map { i =>
      (i.toLong % 64, (i.toLong * 37) % 64, s"r$i")
    }.toDF("x", "y", "s")
    graft.operators.Layout.zorderWriteRange(df, "x", "y", dir,
      nFiles = 16, bits = 6)
    ZoneMap.build(spark, dir, Seq("x", "y"))
    val both = ZoneMap.pruneAll(spark, dir, Seq(
      ("x", Some(lit(8L)), Some(lit(15L))),
      ("y", Some(lit(8L)), Some(lit(15L)))))
    val xOnly = ZoneMap.prune(spark, dir, "x", Some(lit(8L)), Some(lit(15L)))
    val yOnly = ZoneMap.prune(spark, dir, "y", Some(lit(8L)), Some(lit(15L)))
    assert(xOnly.filesSelected < 16 && yOnly.filesSelected < 16,
      s"z-order must give BOTH columns per-file locality, " +
        s"selected x=${xOnly.filesSelected} y=${yOnly.filesSelected}")
    assert(both.filesSelected <= math.min(xOnly.filesSelected, yOnly.filesSelected),
      "conjunctive prune can never plan more files than either column alone")
    val got = both.df
      .filter(col("x").between(8, 15) && col("y").between(8, 15))
      .select("s").as[String].collect().toSet
    val want = (0 until 4096)
      .filter(i => (i % 64) >= 8 && (i % 64) <= 15 &&
        ((i * 37) % 64) >= 8 && ((i * 37) % 64) <= 15)
      .map(i => s"r$i").toSet
    assert(got == want, "pruned+filtered read must be row-identical to the truth")
  }

  test("pruneAll with an unbounded predicate degrades to the bounded one") {
    val dir = freshDir("degrade")
    clustered(dir)
    val one = ZoneMap.prune(spark, dir, "k", Some(lit(300L)), Some(lit(420L)))
    val both = ZoneMap.pruneAll(spark, dir, Seq(
      ("k", Some(lit(300L)), Some(lit(420L))),
      ("k", None, None)))
    assert(both.filesSelected == one.filesSelected)
  }

  test("partitioned layout: partition columns survive the pruned read") {
    val dir = freshDir("part")
    (0 until 400).map(i => (i.toLong, i % 4, s"r$i")).toDF("k", "p", "s")
      .repartitionByRange(8, col("k"))
      .write.partitionBy("p").parquet(dir)
    ZoneMap.build(spark, dir, Seq("k"))
    val pr = ZoneMap.prune(spark, dir, "k", Some(lit(100L)), Some(lit(150L)))
    assert(pr.filesSelected < pr.filesTotal)
    val got = pr.df.filter(col("k").between(100, 150))
      .groupBy("p").count().as[(Int, Long)].collect().toMap
    assert(got.values.sum == 51L && got.keySet == Set(0, 1, 2, 3))
  }
}
