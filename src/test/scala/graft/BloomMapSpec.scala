package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.BloomMap

/** The Bloom-sidecar contract: a pruned point lookup on an UNCLUSTERED
  * key is row-identical to the full-scan filter (false positives read
  * extra files, never drop rows) while planning far fewer files;
  * unindexed appends are conservatively included; all-null files stay
  * indexed (sentinel) and prunable; an absent value prunes to ~nothing
  * with the schema intact. */
class BloomMapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-bm-$tag").toString + "/data"

  /** 4000 rows over 1000 keys, round-robin scattered into 16 files —
    * every file's key [min,max] spans ~the full range, so zone maps
    * would prune nothing here. */
  private def scattered(dir: String): Unit = {
    (0 until 4000).map(i => (i.toLong % 1000, s"r$i")).toDF("k", "s")
      .repartition(16)
      .write.parquet(dir)
    BloomMap.build(spark, dir, "k")
  }

  test("point lookup: row-identical to full scan, files skipped") {
    val dir = freshDir("pt")
    scattered(dir)
    val pr = BloomMap.prune(spark, dir, "k", Seq("777"))
    assert(pr.filesTotal == 16)
    assert(pr.filesSelected < 16,
      s"a 1-of-1000 key must skip files, selected ${pr.filesSelected}")
    val got = pr.df.filter(col("k") === 777L).select("s")
      .as[String].collect().toSet
    assert(got == Set("r777", "r1777", "r2777", "r3777"))
  }

  test("prune never drops a matching row, across many probe values") {
    val dir = freshDir("sweep")
    scattered(dir)
    val full = spark.read.parquet(dir)
    for (v <- Seq(0L, 13L, 499L, 500L, 999L)) {
      val pr = BloomMap.prune(spark, dir, "k", Seq(v.toString))
      val got = pr.df.filter(col("k") === v).count()
      val want = full.filter(col("k") === v).count()
      assert(got == want, s"value $v: pruned read lost rows ($got != $want)")
    }
  }

  test("IN-list: union of per-value candidates, still row-identical") {
    val dir = freshDir("in")
    scattered(dir)
    val vals = Seq(3L, 512L, 998L)
    val pr = BloomMap.prune(spark, dir, "k", vals.map(_.toString))
    val got = pr.df.filter(col("k").isin(vals: _*)).count()
    assert(got == 12L)
  }

  test("append after build: unindexed file conservatively included") {
    val dir = freshDir("ap")
    scattered(dir)
    Seq((424242L, "late")).toDF("k", "s").write.mode("append").parquet(dir)
    val pr = BloomMap.prune(spark, dir, "k", Seq("424242"))
    assert(pr.df.filter(col("k") === 424242L).count() == 1,
      "rows in an unindexed file must never be pruned away")
  }

  test("absent value prunes to (near) nothing, schema survives") {
    val dir = freshDir("none")
    scattered(dir)
    val pr = BloomMap.prune(spark, dir, "k", Seq("123456789"))
    // Bloom false positives may keep a stray file; they may not keep many
    assert(pr.filesSelected <= 2,
      s"absent value kept ${pr.filesSelected} of ${pr.filesTotal} files")
    assert(pr.df.filter(col("k") === 123456789L).count() == 0)
    assert(pr.df.columns.toSeq == Seq("k", "s"))
  }

  test("all-null file stays indexed via sentinel and is prunable") {
    val dir = freshDir("nulls")
    Seq((Some(1L), "a"), (Some(2L), "b")).toDF("k", "s")
      .coalesce(1).write.parquet(dir)
    Seq((Option.empty[Long], "n")).toDF("k", "s")
      .coalesce(1).write.mode("append").parquet(dir)
    BloomMap.build(spark, dir, "k")
    val pr = BloomMap.prune(spark, dir, "k", Seq("1"))
    assert(pr.filesTotal == 2 && pr.filesSelected == 1,
      "the all-null file can never contain the probe — prune it")
    assert(pr.df.filter(col("k") === 1L).count() == 1)
  }
}
