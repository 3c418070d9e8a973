package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is represented by one
  * entry in [[queries]]; SQL-expressible ones carry a DuckDB oracle in
  * [[oracleSql]] (the driver hash-compares both at sf0.01).
  */
object SparkEntry {

  private def catalogs: Seq[Q] =
    RelationalCatalog.all ++ AggWindowCatalog.all ++ TextCatalog.all ++
      VectorCatalog.all ++ GraphCatalog.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalogs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
