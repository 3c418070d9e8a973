package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: how a 100 TB table gets WRITTEN decides
  * what every later scan pays. Parquet prunes row groups by per-column
  * min/max stats, but stats only help if the layout clusters each
  * filter column — and a plain sort clusters exactly one. Z-ordering
  * (Morton interleave of the filter columns' bits) gives every
  * interleaved column locality at once: a range predicate on ANY of
  * them hits a bounded band of the code space, so most files fail the
  * min/max test without being read.
  *
  * Reference scope: the reference pipeline rewrites its state tables
  * wholesale per run (loaders write full snapshots); at cluster scale
  * those rewrites are exactly where layout is decided, so this is the
  * missing "how should the sink write" half of the S10-S15 sink family.
  */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of x lands at position 2i,
    * bit i of y at 2i+1. Pure integer Column arithmetic — identical on
    * any engine, usable directly as a sort or range-partition key. */
  def mortonCode(x: Column, y: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Write `df` z-ordered on two integer-like columns: rows get the
    * Morton code of (xCol % 2^bits, yCol % 2^bits), are range-
    * partitioned into `nFiles` splits of the code space, sorted within
    * each split, and written. Files then cover disjoint code ranges,
    * so both columns' parquet min/max stats are tight per file and a
    * filter on either column prunes most files.
    *
    * One range-exchange (with its sampling pass) + a local sort —
    * the same cost as any global sort-write, paid once at write time. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, outDir: String,
      nFiles: Int = 8, bits: Int = 8): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val coded = df.withColumn("__z",
      mortonCode(pmod(col(xCol), lit(1L << bits)).cast("long"),
        pmod(col(yCol), lit(1L << bits)).cast("long"), bits))
    coded
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
