package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.temporal.{ChangeDetector, ScdLoader}
import graft.transform.GraphTransform

/** SCD-4 loader invariants (SURVEY.md §2.9/T1-T5 + §5):
  *  - idempotence: reloading an identical snapshot yields ZERO changes
  *    (the reference's #1 invariant, docs/TESTING_QUICK_REFERENCE.md:17-35)
  *  - the 8 named change scenarios of
  *    tests/test_temporal_scenarios.py:222-233. */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
  private val t1 = lit("2024-02-01 00:00:00").cast("timestamp")

  private def snap(rows: Seq[(String, String, String, String)]): DataFrame =
    GraphTransform.withTemporal(
      rows.toDF("hubspot_id", "name", "stage", "owner_id"), t0)

  private val baseline = snap(Seq(
    ("c1", "Alice", "lead", "u1"),
    ("c2", "Bob", "customer", "u1"),
    ("c3", "Carol", "lead", "u2")))

  test("idempotence: same snapshot twice -> zero changes, no history") {
    val r1 = ScdLoader.applyScd(baseline, snap(Seq(
      ("c1", "Alice", "lead", "u1"),
      ("c2", "Bob", "customer", "u1"),
      ("c3", "Carol", "lead", "u2"))), t1)
    val stats = ChangeDetector.changeStats(r1.changes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.getOrElse("unchanged", 0L) == 3L)
    assert(!stats.contains("updated") && !stats.contains("new") && !stats.contains("deleted"))
    assert(r1.historyAppend.count() == 0)
    assert(r1.current.count() == 3)
  }

  test("scenarios: rename, ownership transfer, stage change, new, soft delete") {
    val modified = snap(Seq(
      ("c1", "Alicia", "lead", "u1"),      // rename
      ("c2", "Bob", "customer", "u2"),     // ownership transfer
      ("c4", "Dave", "lead", "u1")))       // new contact; c3 missing -> soft delete
    val r = ScdLoader.applyScd(baseline, modified, t1)

    val byType = r.changes.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byType("c1") == "updated")
    assert(byType("c2") == "updated")
    assert(byType("c4") == "new")
    assert(byType("c3") == "deleted")

    // history got the superseded versions of c1,c2 and a terminal c3 snapshot
    val hist = r.historyAppend.collect().map(_.getString(0)).sorted
    assert(hist.toSeq == Seq("c1", "c2", "c3"))
    assert(r.historyAppend.filter(col("valid_to").isNull).count() == 0)
    assert(r.historyAppend.filter(col("is_current")).count() == 0)

    // current state: c1 updated, c3 soft-deleted but retained
    val cur = r.current.collect().map(x => x.getString(0) -> x).toMap
    assert(cur.size == 4)
    assert(cur("c1").getString(cur("c1").fieldIndex("name")) == "Alicia")
    assert(cur("c3").getBoolean(cur("c3").fieldIndex("is_deleted")))
    assert(!cur("c3").getBoolean(cur("c3").fieldIndex("is_current")))
    assert(cur("c4").getTimestamp(cur("c4").fieldIndex("valid_from")).toString
      .startsWith("2024-02-01"))

    // re-apply the SAME modified snapshot on the new state -> idempotent,
    // except the soft-deleted row stays deleted (already_deleted)
    val r2 = ScdLoader.applyScd(r.current, modified, t1)
    val stats2 = ChangeDetector.changeStats(r2.changes)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(stats2.getOrElse("unchanged", 0L) == 3L)
    assert(stats2.getOrElse("already_deleted", 0L) == 1L)
    assert(r2.historyAppend.count() == 0)
  }

  test("HAS_HISTORY edges: one per superseded version, keyed id@valid_to") {
    val modified = snap(Seq(
      ("c1", "Alicia", "lead", "u1"),      // update -> history row
      ("c2", "Bob", "customer", "u1")))    // unchanged; c3 missing -> delete
    val r = ScdLoader.applyScd(baseline, modified, t1)
    val edges = ScdLoader.hasHistoryEdges(r.historyAppend).collect()
      .map(e => e.getString(e.fieldIndex("src_id")) -> e).toMap
    assert(edges.keySet == Set("c1", "c3")) // updated + deleted, NOT unchanged c2
    assert(edges("c1").getString(edges("c1").fieldIndex("dst_id"))
      == "c1@2024-02-01 00:00:00")
    assert(edges.values.forall(_.getString(2) == "HAS_HISTORY"))
  }

  test("resurrection: deleted entity reappearing becomes current again") {
    val del = ScdLoader.applyScd(baseline, snap(Seq(
      ("c1", "Alice", "lead", "u1"),
      ("c2", "Bob", "customer", "u1"))), t1) // c3 deleted
    val back = ScdLoader.applyScd(del.current, snap(Seq(
      ("c1", "Alice", "lead", "u1"),
      ("c2", "Bob", "customer", "u1"),
      ("c3", "Carol", "lead", "u2"))), t1)
    val c3 = back.current.filter(col("hubspot_id") === "c3").collect()(0)
    assert(!c3.getBoolean(c3.fieldIndex("is_deleted")))
    assert(c3.getBoolean(c3.fieldIndex("is_current")))
  }

  test("edge CDC: added/removed per trackable type; immutable types excluded") {
    def edges(rows: (String, String, String)*): DataFrame =
      rows.toDF("rel_type", "src_id", "dst_id")
        .withColumn("src_type", lit("HUBSPOT_Contact"))
        .withColumn("dst_type", lit("HUBSPOT_Deal"))
    val before = edges(("ASSOCIATED_WITH", "c1", "d1"), ("PERFORMED", "c1", "ev1"))
    val after = edges(("ASSOCIATED_WITH", "c2", "d1"), ("PERFORMED", "c9", "ev9"))
    val changes = ScdLoader.edgeChanges(before, after, t1)
    val got = changes.collect()
      .map(r => (r.getString(r.fieldIndex("change_type")),
        r.getString(r.fieldIndex("from_entity_id")))).toSet
    assert(got == Set(("added", "c2"), ("removed", "c1"))) // PERFORMED ignored
  }

  test("edge CDC carries the edge's properties on the change row") {
    // removed edges resolve props against the PREVIOUS set, added edges
    // against the incoming one (temporal_loader.py stores
    // relationship_properties on every HUBSPOT_RelationshipChange)
    def edges(rows: (String, String, String, Map[String, String])*): DataFrame =
      rows.toDF("rel_type", "src_id", "dst_id", "props")
        .withColumn("src_type", lit("HUBSPOT_Contact"))
        .withColumn("dst_type", lit("HUBSPOT_Deal"))
    val before = edges(("CUSTOM_REL", "c1", "d1", Map("weight" -> "3")))
    val after = edges(("CUSTOM_REL", "c2", "d1", Map("weight" -> "7")))
    val got = ScdLoader.edgeChanges(before, after, t1).collect()
      .map(r => r.getString(r.fieldIndex("change_type")) ->
        r.getMap[String, String](r.fieldIndex("relationship_properties")).toMap)
      .toMap
    assert(got == Map("removed" -> Map("weight" -> "3"),
      "added" -> Map("weight" -> "7")))
    // inputs without a props column still diff, with a null map
    def bare(rows: (String, String, String)*): DataFrame =
      rows.toDF("rel_type", "src_id", "dst_id")
        .withColumn("src_type", lit("HUBSPOT_Contact"))
        .withColumn("dst_type", lit("HUBSPOT_Deal"))
    val nullProps = ScdLoader.edgeChanges(
      bare(("CUSTOM_REL", "c1", "d1")), bare(("CUSTOM_REL", "c2", "d1")), t1).collect()
    assert(nullProps.length == 2 &&
      nullProps.forall(_.isNullAt(nullProps(0).fieldIndex("relationship_properties"))))
  }

  test("edge diff is null-safe: a null-keyed edge on both sides is unchanged") {
    // EXCEPT semantics: NULL key components compare equal, so an edge with a
    // null dst_id present in both snapshots must be suppressed — not emitted
    // as both "added" and "removed" (plain `=` join keys would do that).
    def edges(rows: (String, String, Option[String])*): DataFrame =
      rows.toDF("rel_type", "src_id", "dst_id")
        .withColumn("src_type", lit("HUBSPOT_Contact"))
        .withColumn("dst_type", lit("HUBSPOT_Deal"))
    val both = edges(("ASSOCIATED_WITH", "c1", None), ("ASSOCIATED_WITH", "c2", Some("d1")))
    val diff = ChangeDetector.diffEdges(both, both)
    assert(diff.count() == 0)
    val removedOnly = ChangeDetector.diffEdges(both, edges(("ASSOCIATED_WITH", "c2", Some("d1"))))
      .collect()
    assert(removedOnly.length == 1
      && removedOnly(0).getString(removedOnly(0).fieldIndex("change_type")) == "removed"
      && removedOnly(0).isNullAt(removedOnly(0).fieldIndex("dst_id")))
  }

  test("entity relationship history: matches either end of the edge") {
    def edges(rows: (String, String, String)*): DataFrame =
      rows.toDF("rel_type", "src_id", "dst_id")
        .withColumn("src_type", lit("HUBSPOT_Contact"))
        .withColumn("dst_type", lit("HUBSPOT_Deal"))
    val before = edges(("ASSOCIATED_WITH", "c1", "d1"))
    val after = edges(("ASSOCIATED_WITH", "c2", "d1"))
    val changes = ScdLoader.edgeChanges(before, after, t1)
    // from-side lookup: only c1's removal
    val c1 = graft.query.TemporalQueries
      .entityRelationshipHistory(changes, "HUBSPOT_Contact", "c1").collect()
    assert(c1.length == 1 && c1(0).getString(0) == "removed")
    // to-side lookup: d1 sees both the removal and the addition
    val d1 = graft.query.TemporalQueries
      .entityRelationshipHistory(changes, "HUBSPOT_Deal", "d1").collect()
    assert(d1.map(_.getString(0)).sorted.toSeq == Seq("added", "removed"))
    // unrelated entity sees nothing
    assert(graft.query.TemporalQueries
      .entityRelationshipHistory(changes, "HUBSPOT_Contact", "c9").count() == 0)
  }

  test("interval rebuild: lead() closes each version (W3)") {
    val hist = Seq(
      ("c1", "2024-01-01 00:00:00"), ("c1", "2024-02-01 00:00:00"),
      ("c1", "2024-03-01 00:00:00"), ("c2", "2024-01-15 00:00:00"))
      .toDF("hubspot_id", "vf")
      .withColumn("valid_from", col("vf").cast("timestamp")).drop("vf")
    val rebuilt = ScdLoader.rebuildIntervals(hist)
    assert(rebuilt.filter(col("is_current")).count() == 2)
    val c1Mid = rebuilt.filter(col("hubspot_id") === "c1" &&
      col("valid_from") === lit("2024-02-01 00:00:00").cast("timestamp")).collect()(0)
    assert(c1Mid.getTimestamp(c1Mid.fieldIndex("valid_to")).toString.startsWith("2024-03-01"))
  }
}
