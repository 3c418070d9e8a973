package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — Delta Lake CHECK
  * constraints / Delta Live Tables expectations / Great Expectations,
  * re-expressed as one codegen'd pass: a rule set of named boolean
  * Columns evaluated per row, splitting the batch into pass rows and a
  * quarantine table while emitting per-rule violation metrics.
  *
  * Modes follow the DLT ladder:
  *  - `warn`: violations are COUNTED but the row stays in `pass`
  *    (DLT `expect`);
  *  - `drop`: violating rows move to `quarantine`, annotated with
  *    every rule they broke (DLT `expect_or_drop`);
  *  - `fail`: like `drop` for the split, but [[enforce]] refuses the
  *    whole batch when any such row exists (DLT `expect_or_fail` /
  *    Delta's transaction-aborting CHECK constraint).
  *
  * Null semantics are SQL CHECK semantics: a rule is violated only
  * when its predicate evaluates to FALSE — NULL (unknown) passes,
  * exactly as `CHECK` behaves in the standard and in Delta. Rules that
  * must reject nulls say so explicitly (`col.isNotNull`).
  *
  * Scale shape: [[annotate]] is a single projection (the rule array is
  * a codegen'd expression — no UDFs, no second scan), the split is two
  * filters over it, and metrics are ONE aggregate with map-side
  * combine producing a rule-count-sized row — nothing here is ever
  * sized by the data beyond the one pass every audit must pay.
  * [[enforce]]'s only driver-side materialization is that rule-sized
  * metrics row.
  */
object Expectations {

  /** `check` is the predicate that must HOLD (the CHECK constraint
    * body); `mode` is one of warn | drop | fail. */
  final case class Expectation(name: String, check: Column, mode: String) {
    require(Seq("warn", "drop", "fail").contains(mode),
      s"expectation $name: unknown mode $mode")
  }

  /** The split audit: `pass` rows satisfy every drop/fail rule (warn
    * violations remain, that is the mode's contract); `quarantine`
    * rows broke at least one drop/fail rule and carry the full list of
    * broken rule names in `_violations`; `metrics` is one row per rule
    * (rule, mode, violations) plus `_pass_`/`_quarantine_` row counts,
    * all computed lazily from the same annotated plan. */
  final case class Audit(pass: DataFrame, quarantine: DataFrame,
      metrics: DataFrame)

  val ViolCol = "_violations"

  /** Adds `_violations`: array of the names of every rule (any mode)
    * whose check is FALSE for the row. One projection, codegen'd. */
  def annotate(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val names = rules.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate expectation names in ${names.mkString(",")}")
    require(rules.nonEmpty, "empty rule set")
    df.withColumn(ViolCol, array_compact(array(rules.map { r =>
      when(not(coalesce(r.check, lit(true))), lit(r.name))
    }: _*)))
  }

  /** Full audit over one batch; see [[Audit]]. Nothing is executed
    * until the caller acts on the returned frames. */
  def audit(df: DataFrame, rules: Seq[Expectation]): Audit = {
    val ann = annotate(df, rules)
    val gating = rules.filter(_.mode != "warn").map(_.name)
    val quarantined: Column =
      if (gating.isEmpty) lit(false)
      else arrays_overlap(col(ViolCol), array(gating.map(lit): _*))
    val pass = ann.filter(!quarantined).drop(ViolCol)
    val quarantine = ann.filter(quarantined)
    val wide = ann.agg(count(lit(1)).as("_rows"),
      (sum(quarantined.cast("long")).as("_quarantined") +:
        rules.map(r => sum(array_contains(col(ViolCol), r.name)
          .cast("long")).as(r.name))): _*)
    val metrics = rules.map { r =>
      wide.select(lit(r.name).as("rule"), lit(r.mode).as("mode"),
        coalesce(col(r.name), lit(0L)).as("violations"))
    }.reduce(_ unionByName _)
      .unionByName(wide.select(lit("_pass_").as("rule"),
        lit("rows").as("mode"),
        (col("_rows") - coalesce(col("_quarantined"), lit(0L)))
          .as("violations")))
      .unionByName(wide.select(lit("_quarantine_").as("rule"),
        lit("rows").as("mode"),
        coalesce(col("_quarantined"), lit(0L)).as("violations")))
    Audit(pass, quarantine, metrics)
  }

  /** The gate: runs the metrics aggregate (the ONLY action here, a
    * rule-count-sized collect) and throws if any fail-mode rule has
    * violations — the whole batch is refused, Delta CHECK style.
    * Returns the audit for the caller to write pass/quarantine. */
  def enforce(df: DataFrame, rules: Seq[Expectation]): Audit = {
    val a = audit(df, rules)
    val failNames = rules.filter(_.mode == "fail").map(_.name).toSet
    if (failNames.nonEmpty) {
      val broken = a.metrics.collect()
        .filter(r => failNames(r.getString(0)) && r.getLong(2) > 0)
      require(broken.isEmpty, "expectations failed: " + broken
        .map(r => s"${r.getString(0)}=${r.getLong(2)}").mkString(", "))
    }
    a
  }
}
