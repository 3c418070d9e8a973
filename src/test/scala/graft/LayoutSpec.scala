package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order storage layout: Morton code arithmetic + the clustered-write
  * contract (disjoint per-file code ranges, content preserved). */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int = 8): Long =
    (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("mortonCode matches the bit-interleave reference on a value grid") {
    val pairs = for { x <- 0L to 16L; y <- 0L to 16L } yield (x, y)
    val got = pairs.toDF("x", "y")
      .withColumn("z", Layout.mortonCode(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- pairs)
      assert(got((x, y)) == mortonRef(x, y), s"morton($x, $y)")
    // canonical anchor: interleave(0b1111, 0) = 0b01010101
    assert(got((15L, 0L)) == 0x55L)
    assert(got((0L, 15L)) == 0xAAL)
  }

  test("zorderWrite: files cover disjoint code ranges and content round-trips") {
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val df = (1L to 4000L).map(i => (i, i * 7 % 997, i * 13 % 991))
      .toDF("id", "a", "b")
    Layout.zorderWrite(df, "a", "b", s"$base/z", nFiles = 8)
    val back = spark.read.parquet(s"$base/z")
    assert(back.count() == 4000L)
    assert(back.select(sum("id")).as[Long].head() ==
      df.select(sum("id")).as[Long].head())
    // per-FILE morton ranges must be disjoint (that is the clustering
    // contract that makes both columns' min/max stats selective)
    val ranges = back
      .withColumn("z", Layout.mortonCode(
        pmod(col("a"), lit(256L)).cast("long"),
        pmod(col("b"), lit(256L)).cast("long")))
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    for (Array((_, hi), (lo, _)) <- ranges.sliding(2))
      assert(hi <= lo, s"file code ranges overlap: $ranges")
  }
}
