package graft.temporal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bitemporal queries — valid time x transaction time (Snodgrass;
  * SQL:2011 temporal tables), composed from the two axes the repo
  * already maintains separately: [[ScdLoader]]-shaped valid-time
  * intervals (`valid_from`/`valid_to`, null = open) INSIDE a
  * [[VersionedStore]] transaction log. A row then carries two
  * independent time lines:
  *
  *  - **valid time**: when the fact was true in the world;
  *  - **transaction time**: when the warehouse believed it (the store
  *    version that contains the row).
  *
  * The question only this composition can answer: "as KNOWN at commit
  * T, what was true EFFECTIVE at time V" — the regulated-deployment
  * audit (what did we report last quarter about last year, before the
  * restatement?). A retroactive correction is just a new store version
  * whose rows REVISE a past valid interval: the old version still pins
  * the old belief (snapshot isolation is what makes the axis real),
  * the new version answers with the corrected history.
  *
  * Scale shape: a pin is a version-resolved read + one interval
  * predicate — partition/zone-map prunable, no joins; [[retroDiff]] is
  * one key-keyed full-outer join between two pins, sized by the
  * entity set, never by history length.
  */
object Bitemporal {

  /** Rows effective at valid time `v`: valid_from <= v < valid_to,
    * null valid_to = still open. `v` compares against the columns with
    * their own types (dates, timestamps, or ISO strings all work). */
  def effectiveAt(scd: DataFrame, v: Column,
      validFrom: String = "valid_from", validTo: String = "valid_to"): DataFrame =
    scd.filter(col(validFrom) <= v &&
      (col(validTo).isNull || v < col(validTo)))

  /** The bitemporal pin: state as KNOWN at transaction version `tv`,
    * EFFECTIVE at valid time `v`. */
  def asKnownAt(spark: SparkSession, root: String, tv: Long, v: Column,
      validFrom: String = "valid_from", validTo: String = "valid_to"): DataFrame =
    effectiveAt(VersionedStore.readVersion(spark, root, tv), v,
      validFrom, validTo)

  /** What transaction versions `tvA` -> `tvB` changed about the belief
    * for valid time `v`: per entity key, RESTATED (same key, different
    * row for the same valid instant), LEARNED (key gained a fact about
    * v), FORGOTTEN (fact about v removed), UNCHANGED. The audit face:
    * "what did the warehouse learn about the past between commits". */
  def retroDiff(spark: SparkSession, root: String, tvA: Long, tvB: Long,
      v: Column, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    def pin(tv: Long, tag: String) =
      asKnownAt(spark, root, tv, v)
        .select((keyCols ++ compareCols).map(col): _*)
        .withColumn(tag, lit(true))
    val a = pin(tvA, "_in_a")
      .withColumnsRenamed(compareCols.map(c => c -> s"${c}_a").toMap)
    val b = pin(tvB, "_in_b")
      .withColumnsRenamed(compareCols.map(c => c -> s"${c}_b").toMap)
    val same = compareCols
      .map(c => col(s"${c}_a") <=> col(s"${c}_b"))
      .reduce(_ && _)
    a.join(b, keyCols, "full_outer")
      .withColumn("belief",
        when(col("_in_a").isNull, lit("LEARNED"))
          .when(col("_in_b").isNull, lit("FORGOTTEN"))
          .when(!same, lit("RESTATED"))
          .otherwise(lit("UNCHANGED")))
      .drop("_in_a", "_in_b")
  }
}
