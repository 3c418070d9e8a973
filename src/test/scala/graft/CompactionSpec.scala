package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.temporal.Compaction

/** Compaction must drop file counts to the size-derived target and be
  * read-equivalent — for flat swap-protocol state dirs (coalesce path)
  * and Hive-partitioned layouts (single-shuffle salted bin-pack). */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-compact-$tag").toString + "/state"

  private def parquetFiles(path: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(path))
  }

  test("flat: 32 small files bin-pack to 1, rows identical, then no-op") {
    val path = fresh("flat")
    val data = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    data.repartition(32).write.parquet(path)
    assert(parquetFiles(path).size == 32)
    val stats = Compaction.compactPath(spark, path)
    assert(stats.exists(s => s.filesBefore == 32 && s.filesAfter == 1))
    assert(parquetFiles(path).size == 1)
    assert(spark.read.parquet(path).as[(Long, String)].collect().toSet ==
      (1 to 500).map(i => (i.toLong, s"v$i")).toSet)
    assert(Compaction.compactPath(spark, path).isEmpty, "already compact -> None")
  }

  test("flat: refuses a partitioned layout") {
    val path = fresh("guard")
    Seq((1L, "a"), (2L, "b")).toDF("k", "p")
      .write.partitionBy("p").parquet(path)
    val e = intercept[IllegalArgumentException](
      Compaction.compactPath(spark, path))
    assert(e.getMessage.contains("compactPartitionedPath"))
  }

  test("partitioned: bin-packs within each partition in one pass") {
    val path = fresh("part")
    val data = (1 to 900).map(i => (i.toLong, s"v$i", s"d${i % 3}"))
      .toDF("k", "s", "d")
    data.repartition(8).write.partitionBy("d").parquet(path)
    val before = parquetFiles(path).size
    assert(before == 24, s"8 tasks x 3 partitions, got $before")
    val stats = Compaction.compactPartitionedPath(spark, path, Seq("d"))
    assert(stats.exists(_.filesBefore == 24))
    val perPart = (0 to 2).map(p => parquetFiles(s"$path/d=d$p").size)
    assert(perPart.forall(_ == 1), s"one file per partition, got $perPart")
    assert(spark.read.parquet(path).as[(Long, String, String)].collect().toSet ==
      (1 to 900).map(i => (i.toLong, s"v$i", s"d${i % 3}")).toSet,
      "partition values must survive the rewrite")
    assert(Compaction.compactPartitionedPath(spark, path, Seq("d")).isEmpty)
  }

  test("partitioned: per-partition targets split oversized partitions") {
    val path = fresh("split")
    // one hot partition ~10x the others; a tiny target forces >1 file
    // for the hot partition while small ones still pack to 1
    val hot = (1 to 20000).map(i => (i.toLong, "x" * 50, "hot"))
    val cold = (1 to 200).map(i => (i.toLong, "y", "cold"))
    (hot ++ cold).toDF("k", "s", "d")
      .repartition(16).write.partitionBy("d").parquet(path)
    val hotBytes = parquetFiles(s"$path/d=hot").map(_.length()).sum
    val target = hotBytes / 3 // hot should land ~3-4 files, cold 1
    Compaction.compactPartitionedPath(spark, path, Seq("d"), targetBytes = target)
    val hotFiles = parquetFiles(s"$path/d=hot").size
    val coldFiles = parquetFiles(s"$path/d=cold").size
    assert(coldFiles == 1, s"cold partition should pack to 1, got $coldFiles")
    assert(hotFiles > 1 && hotFiles <= 4,
      s"hot partition should split near its target, got $hotFiles")
    assert(spark.read.parquet(path).count() == 20200)
  }
}
