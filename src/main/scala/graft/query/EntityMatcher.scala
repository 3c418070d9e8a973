package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Clean.cleanEmail

/** J7 — prioritized entity-resolution cascade producing SAME_AS edges
  * (reference loaders/entity_matcher.py:54-96): match on linkedin_url
  * first; email only for rows the first stage left unmatched; report the
  * still-unmatched remainder.
  *
  * Both key joins are broadcast-friendly (the person side is a dimension);
  * the cascade is join → anti-join survivors → join → union, the
  * distributable form of the reference's two sequential Cypher MERGEs.
  */
object EntityMatcher {

  /** users(hubspot_id, email, linkedin_url?) × persons(person_id,
    * linkedin_url?, email?) → (hubspot_id, person_id, matched_by). */
  def matchUsers(users: DataFrame, persons: DataFrame): DataFrame = {
    val u = users.select(col("hubspot_id"),
      cleanEmail(col("email")).as("u_email"),
      lower(trim(col("linkedin_url"))).as("u_li"))
    val p = broadcast(persons.select(col("person_id"),
      cleanEmail(col("email")).as("p_email"),
      lower(trim(col("linkedin_url"))).as("p_li")))

    val byLi = u.filter(col("u_li").isNotNull)
      .join(p.filter(col("p_li").isNotNull), col("u_li") === col("p_li"))
      .select(col("hubspot_id"), col("person_id"), lit("linkedin_url").as("matched_by"))

    val remaining = u.join(byLi.select("hubspot_id"), Seq("hubspot_id"), "left_anti")

    val byEmail = remaining.filter(col("u_email").isNotNull)
      .join(p.filter(col("p_email").isNotNull), col("u_email") === col("p_email"))
      .select(col("hubspot_id"), col("person_id"), lit("email").as("matched_by"))

    val unmatched = remaining
      .join(byEmail.select("hubspot_id"), Seq("hubspot_id"), "left_anti")
      .select(col("hubspot_id"), lit(null).cast("string").as("person_id"),
        lit("unmatched").as("matched_by"))

    byLi.unionByName(byEmail).unionByName(unmatched)
  }

  /** The SAME_AS edge rows for matched users (entity_matcher.py:76). */
  def sameAsEdges(matches: DataFrame): DataFrame =
    matches.filter(col("matched_by") =!= "unmatched")
      .select(lit("SAME_AS").as("rel_type"),
        lit("HUBSPOT_User").as("src_type"), col("hubspot_id").as("src_id"),
        lit(null).cast("string").as("src_email"),
        lit("Person").as("dst_type"), col("person_id").as("dst_id"),
        map(lit("matched_by"), col("matched_by")).as("props"))
}
