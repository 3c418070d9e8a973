package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Column-function equivalents of the reference's row-wise helper zoo
  * (SURVEY.md §2.8; reference transformers/graph_transformer.py:577-630,
  * extractors/form_submissions.py:213-231, utils/change_detector.py:22-41).
  *
  * Everything here is a pure Catalyst expression composition — no UDFs —
  * so every call stays inside whole-stage codegen.
  */
object Clean {

  /** F1 — lower + trim (graph_transformer.py:580-584). */
  def cleanEmail(c: Column): Column = lower(trim(c))

  /** F2 — lower, trim, strip leading "www." (graph_transformer.py:586-593). */
  def cleanDomain(c: Column): Column =
    regexp_replace(lower(trim(c)), "^www\\.", "")

  /** F3 — URL host/path (urlparse at graph_transformer.py:483-489). */
  def urlDomain(c: Column): Column = cleanDomain(parse_url(c, lit("HOST")))
  def urlPath(c: Column): Column = parse_url(c, lit("PATH"))

  /** F4 — the reference's lenient timestamp parser
    * (graph_transformer.py:595-612, :519-527): epoch millis arrive as
    * numbers or numeric strings; everything else is tried as ISO-8601;
    * unparseable values become null (the reference keeps the raw string —
    * callers that need it keep the source column alongside).
    */
  def parseHubspotTs(c: Column): Column = {
    // All-numeric values are epoch MILLIS — the reference's convention for
    // every numeric date it sees (graph_transformer.py:519-527, 595-612).
    val s = trim(c.cast("string"))
    when(c.isNull, lit(null).cast(TimestampType))
      .when(s.rlike("^-?[0-9]+$"), timestamp_millis(s.cast("long")))
      .otherwise(try_to_timestamp(s))
  }

  /** F5 — null/garbage → 0 / 0.0 (graph_transformer.py:614-630). */
  def safeInt(c: Column): Column =
    coalesce(c.try_cast("long"), c.try_cast("double").try_cast("long"), lit(0L))
  def safeDouble(c: Column): Column =
    coalesce(c.try_cast("double"), lit(0.0))

  /** F6 — string boolean parse (graph_transformer.py:239). */
  def parseBool(c: Column): Column =
    lower(coalesce(c.cast("string"), lit("false"))) === "true"

  /** F10 — pull an email out of a form's values array
    * (form_submissions.py:213-231): first value whose lower(name) is an
    * email-ish field name and whose value contains '@'.
    */
  def emailFromValues(values: Column): Column = {
    val hit = filter(values, v =>
      lower(v.getField("name")).isin("email", "e-mail", "e_mail", "emailaddress", "email_address")
        && v.getField("value").contains("@"))
    // try_element_at: ANSI mode (Spark 4 default) makes element_at THROW
    // on an empty match array; we want null.
    cleanEmail(try_element_at(hit, lit(1)).getField("value"))
  }

  /** F16/A13 — snapshot hash: sha256 over canonical JSON of the sorted,
    * non-temporal columns (utils/change_detector.py:22-41). to_json drops
    * null fields, matching the reference's "skip None values"; sorting the
    * column list fixes field order. Hash VALUES differ from the Python
    * implementation (different JSON encoder) but hash EQUALITY behaves
    * identically, which is all the SCD pipeline needs.
    */
  val TemporalCols: Set[String] =
    Set("valid_from", "valid_to", "is_current", "is_deleted", "snapshot_hash", "last_modified")

  def snapshotHash(columns: Seq[String]): Column = {
    val stable = columns.filterNot(TemporalCols).sorted
    sha2(to_json(struct(stable.map(col): _*)), 256)
  }
}
