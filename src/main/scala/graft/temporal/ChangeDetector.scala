package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Clean

/** Hash-diff change detection (SURVEY.md T1/J10/J11;
  * reference utils/change_detector.py:22-244).
  *
  * The reference fetches the whole DB into driver memory and diffs dicts
  * row by row; here both snapshots stay distributed and the diff is one
  * full-outer shuffle join on the entity key — the shape that survives
  * 100 TB (key-partitioned, no driver materialization).
  */
object ChangeDetector {

  /** Classify an incoming snapshot against current state on `hubspot_id`:
    * new / updated (hash differs) / unchanged / deleted (missing from the
    * incoming snapshot). Both inputs must carry `snapshot_hash`
    * (Clean.snapshotHash over their stable columns). */
  def compareSnapshots(current: DataFrame, incoming: DataFrame): DataFrame = {
    val cur = current.select(col("hubspot_id").as("cur_id"),
      col("snapshot_hash").as("cur_hash"),
      coalesce(col("is_deleted"), lit(false)).as("cur_deleted"))
    val inc = incoming.select(col("hubspot_id").as("inc_id"),
      col("snapshot_hash").as("inc_hash"))
    cur.join(inc, col("cur_id") === col("inc_id"), "full_outer")
      .select(
        coalesce(col("inc_id"), col("cur_id")).as("hubspot_id"),
        changeType(col("cur_id"), col("inc_id"), col("cur_deleted"),
          col("cur_hash"), col("inc_hash")).as("change_type"))
  }

  /** The snapshot classification rule, as a column expression — shared by
    * [[compareSnapshots]] and the single-join [[ScdLoader.applyScd]] so
    * the two can never drift. `curDeleted` must already be null-coalesced. */
  private[temporal] def changeType(curKey: org.apache.spark.sql.Column,
      incKey: org.apache.spark.sql.Column, curDeleted: org.apache.spark.sql.Column,
      curHash: org.apache.spark.sql.Column,
      incHash: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(curKey.isNull, "new")
      .when(incKey.isNull && !curDeleted, "deleted")
      .when(incKey.isNull && curDeleted, "already_deleted")
      .when(curDeleted, "resurrected")
      .when(curHash =!= incHash, "updated")
      .otherwise("unchanged")

  /** Per-class counts (change_detector.py:120-127). */
  def changeStats(classified: DataFrame): DataFrame =
    classified.groupBy("change_type").agg(count(lit(1)).as("n")).orderBy("change_type")

  /** Edge-set diff on (src, rel_type, dst) — added/removed, immutable event
    * edges excluded (T4/J11; change_detector.py:153-244,
    * config/settings.py:76-86).
    *
    * ONE full-outer join on the 5-part edge key instead of two `except`s:
    * except = distinct + anti-join per direction (4 shuffles of both
    * inputs); here each side is distinct'd once and the join reuses that
    * hash partitioning — 2 shuffles total, same row set.
    *
    * The join keys use null-safe equality (`<=>`), because EXCEPT compares
    * null-safely: an edge with a NULL key component present on both sides
    * must be suppressed, not reported as both "added" and "removed" the way
    * plain `=` (which never matches NULL) would. `<=>` is still an ordinary
    * equi-join key to the planner — same hash-partitioned SMJ shape. */
  def diffEdges(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val key = Seq("rel_type", "src_type", "src_id", "dst_type", "dst_id")
    def trackable(df: DataFrame, prefix: String) =
      df.filter(!col("rel_type").isin(graft.model.CrmSchema.ImmutableEdgeTypes.toSeq: _*))
        .select(key.map(col): _*).distinct()
        .toDF(key.map(prefix + _): _*)
    val ex = trackable(existing, "ex_").withColumn("in_existing", lit(true))
    val inc = trackable(incoming, "inc_").withColumn("in_incoming", lit(true))
    val cond = key.map(k => col(s"ex_$k") <=> col(s"inc_$k")).reduce(_ && _)
    ex.join(inc, cond, "full_outer")
      .filter(col("in_existing").isNull || col("in_incoming").isNull)
      .select(key.map(k => coalesce(col(s"inc_$k"), col(s"ex_$k")).as(k)) :+
        when(col("in_existing").isNull, "added").otherwise("removed")
          .as("change_type"): _*)
  }

  /** Recompute snapshot hashes for a node table whose stable columns are
    * everything except the SCD bookkeeping set. */
  def rehash(nodes: DataFrame): DataFrame = {
    val stable = nodes.columns.filterNot(Clean.TemporalCols)
    nodes.withColumn("snapshot_hash", Clean.snapshotHash(stable.toSeq))
  }
}
