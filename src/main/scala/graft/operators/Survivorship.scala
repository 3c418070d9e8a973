package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survivorship / golden-record merge — the step after entity
  * resolution (the J7 match cascade, x_dedup_clusters): every cluster
  * of records describing one real-world entity collapses to a single
  * best composite, FIELD BY FIELD (Talend/Informatica MDM
  * "survivorship rules"; the Dedupe/Zingg merge step).
  *
  * Rule semantics per field: the surviving value is the argmax over
  * records with that field NON-NULL of (priority, recency, -record id)
  * — "most trusted source wins; within a source the freshest; ties
  * break on the stable id". Fields survive INDEPENDENTLY (the whole
  * point: the golden record may splice name from the CRM and phone
  * from the web form), and every survivor carries provenance.
  *
  * One `groupBy(cluster)` with one `max(struct(...))` aggregate PER
  * FIELD does all of it: null fields contribute NULL structs (max
  * ignores them), priority/recency/tie order lexicographically in the
  * struct, and the winning value + its source ride along in the same
  * struct — single shuffle, map-side partial aggregation, no windows,
  * no per-field joins. Scale: linear in records, output sized by
  * clusters.
  */
object Survivorship {

  /** One survivorship-governed field: `value` survives by the rule;
    * provenance lands in `<name>_src`. */
  final case class FieldRule(name: String, value: Column)

  /** Collapse `records` to one golden row per `cluster`. `priority`:
    * higher = more trusted; `recency`: higher = fresher; `tieId`:
    * stable per-record id (lower wins ties); `source`: the label that
    * lands in each survivor's `<field>_src` provenance column. */
  def golden(records: DataFrame, cluster: Column, fields: Seq[FieldRule],
      priority: Column, recency: Column, tieId: Column,
      source: Column): DataFrame = {
    require(fields.nonEmpty, "no survivorship fields")
    val aggs = fields.map { f =>
      max(when(f.value.isNotNull,
        struct(priority.as("p"), recency.as("r"), (-tieId).as("nt"),
          f.value.as("v"), col("_surv_src").as("s")))).as(s"_w_${f.name}")
    }
    val out = records
      .withColumn("_surv_src", source.cast("string"))
      .groupBy(cluster.as("cluster"))
      .agg(aggs.head, aggs.tail: _*)
    fields.foldLeft(out) { (df, f) =>
      df.withColumn(f.name, col(s"_w_${f.name}.v"))
        .withColumn(s"${f.name}_src", col(s"_w_${f.name}.s"))
        .drop(s"_w_${f.name}")
    }
  }
}
