package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Expectations
import graft.operators.Expectations.Expectation

/** Data-quality expectations: split partition, mode ladder (warn /
  * drop / fail), SQL CHECK null semantics, per-row violation
  * annotation, and the metrics contract. */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, qty, name) — qty 0 violates positive_qty; name null exercises
  // CHECK null semantics; name "x" violates name_len.
  private def batch = Seq(
    (1L, 5, "alpha"), (2L, 0, "beta"), (3L, 7, null),
    (4L, -2, "x"), (5L, 3, "gamma")
  ).toDF("id", "qty", "name")

  private val posQty = Expectation("positive_qty", col("qty") > 0, "drop")
  private val nameLen =
    Expectation("name_len", length(col("name")) >= 2, "warn")

  test("split is a partition: pass + quarantine = input, disjoint") {
    val a = Expectations.audit(batch, Seq(posQty, nameLen))
    val passIds = a.pass.select("id").as[Long].collect().toSet
    val quarIds = a.quarantine.select("id").as[Long].collect().toSet
    assert(passIds == Set(1L, 3L, 5L)) // drop violators 2,4 leave
    assert(quarIds == Set(2L, 4L))
    assert((passIds & quarIds).isEmpty)
    assert(!a.pass.columns.contains(Expectations.ViolCol))
  }

  test("warn violations are counted but the row stays in pass") {
    val a = Expectations.audit(batch, Seq(nameLen))
    assert(a.quarantine.count() == 0)
    assert(a.pass.count() == 5)
    val m = a.metrics.collect().map(r =>
      r.getString(0) -> r.getLong(2)).toMap
    assert(m("name_len") == 1) // only "x"; null name PASSES (CHECK)
    assert(m("_pass_") == 5 && m("_quarantine_") == 0)
  }

  test("NULL predicate passes (SQL CHECK semantics)") {
    val notNull =
      Expectation("name_set", col("name").isNotNull, "drop")
    val a = Expectations.audit(batch, Seq(nameLen, notNull))
    // name_len on the null row is NULL -> passes; name_set is FALSE.
    assert(a.quarantine.select("id").as[Long].collect().toSet == Set(3L))
    val viol = a.quarantine.select(Expectations.ViolCol)
      .as[Seq[String]].collect().head
    assert(viol == Seq("name_set"))
  }

  test("quarantined rows carry every broken rule name, warn included") {
    val a = Expectations.audit(batch, Seq(posQty, nameLen))
    val byId = a.quarantine
      .select(col("id"), col(Expectations.ViolCol))
      .as[(Long, Seq[String])].collect().toMap
    assert(byId(2L) == Seq("positive_qty"))
    assert(byId(4L) == Seq("positive_qty", "name_len"))
  }

  test("fail mode refuses the batch, naming counts; clean gate passes") {
    val failQty = posQty.copy(mode = "fail")
    val e = intercept[IllegalArgumentException] {
      Expectations.enforce(batch, Seq(failQty))
    }
    assert(e.getMessage.contains("positive_qty=2"))
    val ok = Expectations.enforce(batch,
      Seq(Expectation("id_set", col("id").isNotNull, "fail"), posQty))
    assert(ok.pass.count() == 3) // fail rule clean; drop rule still drops
  }

  test("metrics match manual counts across modes") {
    val a = Expectations.audit(batch, Seq(posQty, nameLen))
    val m = a.metrics.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(m == Set(
      ("positive_qty", "drop", 2L), ("name_len", "warn", 1L),
      ("_pass_", "rows", 3L), ("_quarantine_", "rows", 2L)))
  }

  test("empty frame yields zero metrics, not nulls") {
    val a = Expectations.audit(batch.filter(col("id") < 0),
      Seq(posQty, nameLen))
    val m = a.metrics.collect().map(r =>
      r.getString(0) -> r.getLong(2)).toMap
    assert(m.values.forall(_ == 0L))
  }

  test("duplicate rule names and empty rule sets are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.annotate(batch, Seq(posQty, posQty))
    }
    intercept[IllegalArgumentException] {
      Expectations.annotate(batch, Nil)
    }
    intercept[IllegalArgumentException] {
      Expectation("m", col("id") > 0, "quarantine")
    }
  }
}
