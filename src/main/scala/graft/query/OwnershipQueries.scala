package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's point-lookup ownership surface
  * (query_ownership.py:24-152), one DataFrame function per Cypher query.
  *
  * Shapes: P6 point filters + J1 FK equi-joins. `users` is always the
  * broadcast side — it is the smallest dimension in every CRM portal —
  * and the fact side keeps its partitioning, so each lookup is one
  * shuffle-free broadcast-hash-join pass at any scale.
  */
object OwnershipQueries {

  private def ownerName: Column = concat_ws(" ", col("first_name"), col("last_name"))

  /** Users projected to the broadcastable owner dimension. */
  private def ownerDim(users: DataFrame): DataFrame =
    broadcast(users.select(col("hubspot_id").as("owner_key"),
      col("email").as("owner_email"),
      col("first_name").as("owner_first_name"),
      col("last_name").as("owner_last_name")))

  /** Owner of one contact by exact email (query_ownership.py:24-37). */
  def contactOwner(g: GraphTables, email: String): DataFrame =
    g.contacts.filter(col("email") === email)
      .select(col("first_name"), col("last_name"), col("email"), col("owner_id"))
      .join(ownerDim(g.users), col("owner_id") === col("owner_key"))
      .select(col("first_name"), col("last_name"), col("email"),
        col("owner_email"), col("owner_first_name"), col("owner_last_name"))

  /** Owner of companies matching a name substring (query_ownership.py:39-52). */
  def companyOwner(g: GraphTables, nameNeedle: String): DataFrame =
    g.companies.filter(col("name").contains(nameNeedle))
      .select(col("name"), col("domain"), col("owner_id"))
      .join(ownerDim(g.users), col("owner_id") === col("owner_key"))
      .select(col("name"), col("domain"),
        col("owner_email"), col("owner_first_name"), col("owner_last_name"))
      .orderBy("name")

  /** Owner of deals matching a name substring (query_ownership.py:54-68). */
  def dealOwner(g: GraphTables, nameNeedle: String): DataFrame =
    g.deals.filter(col("name").contains(nameNeedle))
      .select(col("name"), col("amount"), col("stage"), col("owner_id"))
      .join(ownerDim(g.users), col("owner_id") === col("owner_key"))
      .select(col("name"), col("amount"), col("stage"),
        col("owner_email"), col("owner_first_name"), col("owner_last_name"))
      .orderBy("name")

  /** Everything one user owns: rosters + counts + pipeline value
    * (query_ownership.py:70-89). */
  def userOwnership(g: GraphTables, userEmail: String): DataFrame = {
    val u = g.users.filter(col("email") === userEmail)
      .select(col("hubspot_id").as("owner_key"), ownerName.as("owner"),
        col("email"))
    u.join(g.contacts.select(col("email").as("c_email"), col("owner_id").as("c_own")),
        col("c_own") === col("owner_key"), "left")
      .join(g.companies.select(col("name").as("co_name"), col("hubspot_id").as("co_id"),
        col("owner_id").as("co_own")), col("co_own") === col("owner_key"), "left")
      .join(g.deals.select(col("name").as("d_name"), col("hubspot_id").as("d_id"),
        col("amount"), col("owner_id").as("d_own")),
        col("d_own") === col("owner_key"), "left")
      .groupBy("owner_key", "owner", "email")
      .agg(
        sort_array(collect_set(col("c_email"))).as("contacts"),
        sort_array(collect_set(col("co_name"))).as("companies"),
        sort_array(collect_set(col("d_name"))).as("deals"),
        countDistinct("c_email").as("contact_count"),
        countDistinct("co_id").as("company_count"),
        countDistinct("d_id").as("deal_count"),
        sum("amount").as("total_deal_value"))
      .drop("owner_key")
  }

  /** Ownership summary for every user, by pipeline value
    * (query_ownership.py:91-108). */
  def allOwnerships(g: GraphTables): DataFrame = {
    val u = g.users.select(col("hubspot_id").as("owner_key"), ownerName.as("owner"),
      col("email"))
    u.join(g.contacts.select(col("hubspot_id").as("c_id"), col("owner_id").as("c_own")),
        col("c_own") === col("owner_key"), "left")
      .join(g.companies.select(col("hubspot_id").as("co_id"), col("owner_id").as("co_own")),
        col("co_own") === col("owner_key"), "left")
      .join(g.deals.select(col("hubspot_id").as("d_id"), col("amount"),
        col("owner_id").as("d_own")), col("d_own") === col("owner_key"), "left")
      .groupBy("owner_key", "owner", "email")
      .agg(countDistinct("c_id").as("contacts"),
        countDistinct("co_id").as("companies"),
        countDistinct("d_id").as("deals"),
        sum("amount").as("total_pipeline_value"))
      .orderBy(desc_nulls_last("total_pipeline_value"), col("owner_key"))
      .drop("owner_key")
  }

  /** All contacts with their owners (query_ownership.py:110-123). */
  def contactsWithOwners(g: GraphTables, limit: Int = 100): DataFrame =
    g.contacts
      .join(broadcast(g.users.select(col("hubspot_id").as("owner_key"),
        ownerName.as("owner"))), col("owner_id") === col("owner_key"))
      .select(ownerName.as("contact_name"), col("email"), col("owner"),
        col("hubspot_id").as("contact_id"))
      .orderBy("contact_id")
      .limit(limit)

  /** All companies with their owners (query_ownership.py:125-137). */
  def companiesWithOwners(g: GraphTables, limit: Int = 100): DataFrame =
    g.companies
      .join(broadcast(g.users.select(col("hubspot_id").as("owner_key"),
        ownerName.as("owner"))), col("owner_id") === col("owner_key"))
      .select(col("name"), col("domain"), col("industry"), col("owner"),
        col("hubspot_id").as("company_id"))
      .orderBy("company_id")
      .limit(limit)

  /** Top deals with their owners, by amount (query_ownership.py:139-152). */
  def dealsWithOwners(g: GraphTables, limit: Int = 100): DataFrame =
    g.deals
      .join(broadcast(g.users.select(col("hubspot_id").as("owner_key"),
        ownerName.as("owner"))), col("owner_id") === col("owner_key"))
      .select(col("name"), col("amount"), col("stage"), col("close_date"), col("owner"),
        col("hubspot_id").as("deal_id"))
      .orderBy(desc_nulls_last("amount"), col("deal_id"))
      .limit(limit)
}
