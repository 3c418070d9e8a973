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

  test("zorderWrite actually prunes: range scans on EITHER column read fewer rows") {
    // Round-7 verdict #6: disjoint code ranges are the mechanism; this
    // pins the EFFECT. The same rows are written z-ordered and plainly
    // repartitioned; a range filter on each interleaved column must
    // then READ measurably fewer rows from the z-ordered layout (the
    // parquet reader drops whole row groups whose min/max exclude the
    // predicate — FileSourceScan's numOutputRows counts rows actually
    // produced by the reader, before Spark's own Filter). Data stays
    // inside the 2^bits domain so raw-column stats align with the
    // interleaved low bits. If zorderWrite ever degrades to an
    // unsorted write, both scans read everything and this fails.
    val base = java.nio.file.Files.createTempDirectory("graft-zprune").toString
    val df = (1L to 4000L).map(i => (i, i * 7 % 256, i * 13 % 256))
      .toDF("id", "a", "b")
    Layout.zorderWrite(df, "a", "b", s"$base/z", nFiles = 8)
    df.repartition(8).write.parquet(s"$base/flat")
    def rowsScanned(path: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
      val q = spark.read.parquet(path).filter(pred)
      val selected = q.collect().length.toLong
      val scan = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
      (scan.metrics("numOutputRows").value, selected)
    }
    for (pred <- Seq(col("a") < 32, col("b") < 32)) {
      val (zScan, zRows) = rowsScanned(s"$base/z", pred)
      val (fScan, fRows) = rowsScanned(s"$base/flat", pred)
      assert(zRows == fRows && zRows > 0, s"$pred: selected rows differ")
      // plain repartition scrambles values across files -> no pruning;
      // the z-ordered layout must skip a sizable share (8 files fix one
      // x-bit and two y-bits of the code prefix). RangePartitioner
      // boundaries are SAMPLED with an RDD-id-dependent seed, so the
      // exact skip rate wobbles run to run (observed 50-63% read) —
      // the bound is 0.7 to assert real pruning without riding that
      // sampling variance; ZOSCALE artifacts carry the measured rates.
      assert(fScan == 4000L, s"$pred: flat layout unexpectedly pruned ($fScan)")
      assert(zScan * 10 <= fScan * 7,
        s"$pred: z-ordered scan read $zScan of $fScan rows — layout not pruning")
    }
  }

  /** Classic iterative xy2d (reflection by the full grid size n-1). */
  private def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = (1L << bits) - 1 - x; y = (1L << bits) - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertCode matches xy2d and is a unit-step bijection (full 2^8 grid)") {
    val n = 256
    val got = spark.range(0, n.toLong * n).selectExpr(
        s"id div $n AS x", s"id % $n AS y")
      .withColumn("h", Layout.hilbertCode("x", "y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == n * n)
    // exact agreement with the independent Scala xy2d on every cell
    for ((x, y, h) <- got)
      assert(h == hilbertRef(8, x, y), s"hilbert($x, $y)")
    // bijection onto [0, n^2) ...
    val byCode = got.map { case (x, y, h) => h -> (x, y) }.toMap
    assert(byCode.size == n * n)
    assert(byCode(0L) == (0L, 0L))
    // ... where consecutive codes are always GRID-ADJACENT cells — the
    // unit-step locality property Morton lacks (x_hilbert_code's claim)
    for (c <- 0L until (n.toLong * n - 1)) {
      val (x1, y1) = byCode(c); val (x2, y2) = byCode(c + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"codes $c -> ${c + 1} jump from ($x1,$y1) to ($x2,$y2)")
    }
  }
}
