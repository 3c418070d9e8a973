package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{Components, GraphAlgos}

/** Graph questions over the pipeline's materialized edge set — the
  * queries a reference user would have written in Cypher once
  * neo4j_loader.py had loaded the graph (influence ranking, community
  * structure, k-hop neighborhoods). Nodes are (entity_type, entity_id)
  * pairs; internally they travel as one composite key so the generic
  * operators ([[graft.operators.GraphAlgos]],
  * [[graft.operators.Components]]) stay single-column, and are split
  * back on output.
  */
object GraphQueries {

  /** "|" never occurs in HubSpot type names or numeric-ish ids; the
    * split on output uses the FIRST separator only, so ids containing
    * the char still round-trip. */
  private def nodeKey(t: Column, id: Column): Column = concat_ws("|", t, id)

  /** Split the composite key back; the operators all emit it as `node`. */
  private def splitNode: Seq[Column] = Seq(
    substring_index(col("node"), "|", 1).as("entity_type"),
    expr("substring(node, instr(node, '|') + 1)").as("entity_id"))

  private def scoped(edges: DataFrame, relType: Option[String]): DataFrame =
    relType.fold(edges)(t => edges.filter(col("rel_type") === t))

  /** PageRank influence over the (optionally rel-type-scoped) entity
    * graph, highest first. Parallel edges between the same endpoints
    * collapse into an edge weight, so a contact with three deals at a
    * company pulls three times the mass along that relationship.
    * With `from`, ranks are personalized to that entity — influence
    * relative to it, not global. */
  def influenceRanking(edges: DataFrame, relType: Option[String] = None,
      topK: Int = 50, from: Option[(String, String)] = None): DataFrame = {
    val e = scoped(edges, relType)
      .groupBy(nodeKey(col("src_type"), col("src_id")).as("src"),
        nodeKey(col("dst_type"), col("dst_id")).as("dst"))
      .agg(count(lit(1)).cast("double").as("weight"))
    val ranked = from match {
      case Some((t, id)) => GraphAlgos.personalizedPageRank(e, s"$t|$id")
      case None => GraphAlgos.pageRank(e)
    }
    ranked
      .select(splitNode :+ round(col("rank"), 6).as("rank"): _*)
      .orderBy(desc("rank"), col("entity_type"), col("entity_id"))
      .limit(topK)
  }

  /** Connected components of the (optionally scoped) entity graph:
    * every entity labeled with its community and the community's size,
    * largest communities first. The component label is the
    * lexicographically smallest member key — stable across runs. */
  def communities(edges: DataFrame, relType: Option[String] = None): DataFrame = {
    val e = scoped(edges, relType).select(
      nodeKey(col("src_type"), col("src_id")).as("s"),
      nodeKey(col("dst_type"), col("dst_id")).as("d"))
    val labeled = Components.connectedComponents(e, "s", "d")
    val sizes = labeled.groupBy("comp").agg(count(lit(1)).as("community_size"))
    labeled.join(sizes, "comp")
      .select(splitNode :+ col("comp").as("community_id")
        :+ col("community_size"): _*)
      .orderBy(desc("community_size"), col("community_id"),
        col("entity_type"), col("entity_id"))
  }

  /** Entities reachable from one entity within `hops` relationship
    * steps (any direction), nearest first — Cypher's
    * `(a)-[*..k]-(b)` neighborhood. */
  def neighborhood(edges: DataFrame, entityType: String, entityId: String,
      hops: Int = 2): DataFrame = {
    val e = edges.select(
      nodeKey(col("src_type"), col("src_id")).as("s"),
      nodeKey(col("dst_type"), col("dst_id")).as("d"))
    GraphAlgos.bfsHops(e, s"$entityType|$entityId", maxHops = hops)
      .select(splitNode :+ col("hops"): _*)
      .orderBy(col("hops"), col("entity_type"), col("entity_id"))
  }
}
