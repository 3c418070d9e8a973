package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.functions.Clean._

/** Unit + property tests for the column-function helpers (SURVEY.md §2.8;
  * the "timestamp zoo" is hard-part #6 in SURVEY.md §7.4). */
class CleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(colExpr: org.apache.spark.sql.Column, input: String): Any = {
    val df = Seq(Option(input)).toDF("v").select(colExpr.as("r"))
    df.collect()(0).get(0)
  }

  test("parseHubspotTs: epoch millis as number-string") {
    assert(one(parseHubspotTs(col("v")), "1718131200000").toString
      startsWith "2024-06-11")
  }
  test("parseHubspotTs: ISO with offset") {
    assert(one(parseHubspotTs(col("v")), "2011-02-02 23:51:10.185000+00:00").toString
      startsWith "2011-02-02")
  }
  test("parseHubspotTs: ISO basic and Z-suffixed") {
    assert(one(parseHubspotTs(col("v")), "2024-01-01T10:00:00Z").toString
      startsWith "2024-01-01")
    assert(one(parseHubspotTs(col("v")), "2024-01-01 10:00:00").toString
      startsWith "2024-01-01")
  }
  test("parseHubspotTs: garbage -> null, null -> null") {
    assert(one(parseHubspotTs(col("v")), "not a date") == null)
    assert(one(parseHubspotTs(col("v")), null) == null)
  }
  test("parseHubspotTs: epoch millis round-trips for arbitrary instants (property)") {
    import spark.implicits._
    // Batch the property over one DataFrame pass instead of row-at-a-time.
    val millisGen = Gen.chooseNum(0L, 4102444800000L) // 1970..2100
    val samples = Gen.listOfN(200, millisGen).sample.get
    val got = samples.map(_.toString).toDF("v")
      .select(parseHubspotTs(col("v")).cast("long").as("secs"), col("v"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getString(1).toLong / 1000L,
        s"millis ${r.getString(1)} parsed to ${r.getLong(0)}s")
    }
    // keep scalacheck engaged end-to-end on the pure predicate too
    val prop = Prop.forAll(millisGen) { m => m / 1000L * 1000L <= m }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("safeInt: garbage -> 0, float-strings truncate, ints pass") {
    assert(one(safeInt(col("v")), "42") == 42L)
    assert(one(safeInt(col("v")), "17.9") == 17L)
    assert(one(safeInt(col("v")), "garbage") == 0L)
    assert(one(safeInt(col("v")), null) == 0L)
  }
  test("safeDouble / parseBool") {
    assert(one(safeDouble(col("v")), "3.5") == 3.5)
    assert(one(safeDouble(col("v")), "x") == 0.0)
    assert(one(parseBool(col("v")), "TRUE") == true)
    assert(one(parseBool(col("v")), null) == false)
  }
  test("cleanEmail / cleanDomain") {
    assert(one(cleanEmail(col("v")), "  Alice@Example.COM ") == "alice@example.com")
    assert(one(cleanDomain(col("v")), " WWW.Example.com ") == "example.com")
    assert(one(cleanDomain(col("v")), "wwwx.example.com") == "wwwx.example.com")
  }
  test("urlDomain / urlPath") {
    assert(one(urlDomain(col("v")), "https://www.example.com/a/b?x=1") == "example.com")
    assert(one(urlPath(col("v")), "https://www.example.com/a/b?x=1") == "/a/b")
  }

  test("emailFromValues finds email-ish fields with @") {
    val df = Seq(
      (1, Seq(("firstname", "Alice"), ("email", "A@b.com"))),
      (2, Seq(("e-mail", "x@y.org"), ("email", "not-an-email"))),
      (3, Seq(("name", "bob")))
    ).toDF("id", "raw")
      .select(col("id"), expr("transform(raw, r -> struct(r._1 AS name, r._2 AS value))").as("values"))
    val got = df.select(col("id"), emailFromValues(col("values")).as("e"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(1) == "a@b.com")
    assert(got(2) == "x@y.org")
    assert(got(3) == null)
  }

  test("snapshotHash: insensitive to column order, ignores temporal cols, nulls excluded") {
    val a = Seq(("1", "x", "b@c.d")).toDF("hubspot_id", "name", "email")
      .withColumn("h", snapshotHash(Seq("hubspot_id", "name", "email")))
    val b = Seq(("1", "x", "b@c.d")).toDF("hubspot_id", "name", "email")
      .withColumn("h", snapshotHash(Seq("email", "hubspot_id", "name", "last_modified", "valid_from")))
    assert(a.select("h").collect()(0) == b.select("h").collect()(0))
  }
}
