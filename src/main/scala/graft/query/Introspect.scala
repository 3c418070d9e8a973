package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S16 — schema introspection over the transformed graph
  * (reference get_schema.py:19-98: node labels + properties, relationship
  * types). Table/column metadata comes straight from the Catalyst schema
  * (no job); the relationship inventory is a real distributed aggregate
  * over the edge table.
  */
object Introspect {

  private def tables(g: GraphTables): Seq[(String, DataFrame)] = Seq(
    "users" -> g.users, "contacts" -> g.contacts, "companies" -> g.companies,
    "deals" -> g.deals, "activities" -> g.activities, "campaigns" -> g.campaigns,
    "web_pages" -> g.webPages, "email_opens" -> g.opens,
    "email_clicks" -> g.clicks, "form_submissions" -> g.forms, "edges" -> g.edges)

  /** One row per (table, column) with its type — the "node labels and
    * their properties" view (get_schema.py:19-60). */
  def tableSchemas(g: GraphTables): DataFrame = {
    val spark = g.users.sparkSession
    import spark.implicits._
    tables(g).flatMap { case (name, df) =>
      df.schema.fields.map(f => (name, f.name, f.dataType.simpleString, f.nullable))
    }.toDF("table_name", "column_name", "data_type", "nullable")
  }

  /** Relationship-type inventory with endpoint types and counts
    * (get_schema.py:62-98). */
  def relationshipTypes(g: GraphTables): DataFrame =
    g.edges.groupBy("rel_type", "src_type", "dst_type")
      .agg(count(lit(1)).as("n_edges"))
      .orderBy("rel_type", "src_type", "dst_type")

  /** Property coverage for one table: non-null counts per column in a
    * single pass (the reference inspects sampled nodes per label;
    * this is exact and one job). */
  def columnCoverage(g: GraphTables, tableName: String): DataFrame = {
    val df = tables(g).collectFirst { case (`tableName`, d) => d }
      .getOrElse(sys.error(s"unknown table $tableName"))
    val counts = df.select(
      count(lit(1)).as("n_rows") +:
        df.columns.toSeq.map(c => count(col(c)).as(c)): _*)
    val spark = df.sparkSession
    import spark.implicits._
    val row = counts.collect()(0)
    val n = row.getLong(0)
    df.columns.toSeq.zipWithIndex.map { case (c, i) =>
      (tableName, c, row.getLong(i + 1), n)
    }.toDF("table_name", "column_name", "n_non_null", "n_rows")
  }
}
