package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over the driver's parquet tables
  * plus (when SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Conventions that make the driver's hash-compare deterministic:
  *  - every output column is explicitly aliased, same name on both sides;
  *  - every query ends in a total ORDER BY;
  *  - doubles that result from arithmetic are round()-ed (2dp for money,
  *    4dp for ratios) on both sides;
  *  - timestamps are rendered as 'yyyy-MM-dd HH:mm:ss' strings on both
  *    sides (truncating semantics match between date_format and strftime);
  *  - integer sums are BIGINT on both sides (DuckDB needs an explicit cast
  *    because its sum(int) returns HUGEINT).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Read one of the driver-generated tables (see TESTDATA.md).
    *
    * `events.ts` has shipped under two physical types across driver data
    * generations, so normalize it to a session-zoned TimestampType here and
    * let every catalog query assume that one shape:
    *  - INT64 TIMESTAMP(NANOS): Spark's parquet reader rejects it outright
    *    (PARQUET_TYPE_ILLEGAL); read it as a long via the legacy nanosAsLong
    *    conf and convert with exact integer arithmetic (`div`, not `/` — ns
    *    since epoch exceeds the 2^53 double-exact range);
    *  - TIMESTAMP(MICROS) without isAdjustedToUTC: arrives as
    *    TIMESTAMP_NTZ; cast to TimestampType (the UTC session zone keeps the
    *    wall clock identical to DuckDB's naive rendering of the same file).
    */
  /** Deterministic scratch root for catalog queries that exercise the
    * on-disk state machinery (VersionedStore / Compaction): keyed by
    * (query, data dir) so concurrent Verify runs over different SFs
    * never collide, and CLEARED on every call so the query is
    * idempotent under the bench's repeated invocations. The VALUES such
    * a query returns derive only from the sf tables — the scratch dir
    * is plumbing, never an input. */
  def scratch(s: SparkSession, dir: String, name: String): String = {
    val key = java.util.UUID.nameUUIDFromBytes(dir.getBytes("UTF-8"))
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_state/${name}_$key"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) require(fs.delete(p, true), s"scratch: clear $root failed")
    root
  }

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = {
      if (name == "events")
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(s"$dir/$name.parquet")
    }
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType =>
          df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
        case _ => df // already TimestampType
      }
    } else df
  }
}
