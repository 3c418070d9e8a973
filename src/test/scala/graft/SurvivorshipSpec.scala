package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Survivorship
import graft.operators.Survivorship.FieldRule

/** Golden-record survivorship: per-field independence, the
  * (priority, recency, tie) rule order, null skipping, provenance. */
class SurvivorshipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (cluster, name, phone, priority, recency, id, src)
  private def recs(rows: (Long, String, String, Int, Long, Long, String)*) =
    rows.toDF("k", "name", "phone", "p", "r", "rid", "src")

  private def goldenOf(df: org.apache.spark.sql.DataFrame) =
    Survivorship.golden(df, col("k"),
      Seq(FieldRule("name", col("name")), FieldRule("phone", col("phone"))),
      col("p"), col("r"), col("rid"), col("src"))

  test("fields survive independently: the golden row splices sources") {
    val g = goldenOf(recs(
      (1L, "Alice", null, 2, 10L, 1L, "crm"),
      (1L, "alice", "555", 1, 99L, 2L, "web")))
      .select("name", "name_src", "phone", "phone_src")
      .as[(String, String, String, String)].collect().head
    assert(g == (("Alice", "crm", "555", "web")))
  }

  test("higher priority beats fresher recency") {
    val g = goldenOf(recs(
      (1L, "old-trusted", "1", 3, 1L, 1L, "a"),
      (1L, "new-untrusted", "2", 1, 999L, 2L, "b")))
      .select("name").as[String].collect().head
    assert(g == "old-trusted")
  }

  test("within a priority, recency wins; within both, lower id wins") {
    val g = goldenOf(recs(
      (1L, "stale", "1", 2, 10L, 1L, "a"),
      (1L, "fresh", "2", 2, 20L, 2L, "a"),
      (1L, "fresh-dup", "3", 2, 20L, 3L, "a")))
      .select("name").as[String].collect().head
    assert(g == "fresh") // recency 20 beats 10; id 2 beats id 3
  }

  test("an all-null field yields a null survivor with null provenance") {
    val g = goldenOf(recs((1L, null, null, 2, 10L, 1L, "a")))
      .select("name", "name_src").as[(Option[String], Option[String])]
      .collect().head
    assert(g == ((None, None)))
  }

  test("clusters collapse independently, output sized by clusters") {
    val g = goldenOf(recs(
      (1L, "x", "1", 1, 1L, 1L, "a"), (1L, "y", "2", 2, 1L, 2L, "b"),
      (2L, "z", "3", 1, 1L, 3L, "a")))
    assert(g.count() == 2)
    assert(g.filter(col("cluster") === 2L).select("name")
      .as[String].collect().head == "z")
  }
}
