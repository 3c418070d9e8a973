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
    * `events.ts` is physically INT64 TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright (PARQUET_TYPE_ILLEGAL). We read it as a long via
    * the legacy nanosAsLong conf and convert to a microsecond TimestampType
    * with exact integer arithmetic (`div`, not `/` — ns since epoch exceeds
    * the 2^53 double-exact range).
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = {
      if (name == "events")
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(s"$dir/$name.parquet")
    }
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
