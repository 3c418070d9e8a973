package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every SparkEntry query runs at sf0.001 and yields a sane result.
  * (Value-level correctness is the driver's DuckDB gate + scripts/check.py.) */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose result can be legitimately empty at tiny scale. */
  private val mayBeEmpty = Set("x_minhash_lsh", "x_ngram_jaccard", "j5_anti_no_big_p")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching oracle-naming discipline") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      assert(df.columns.nonEmpty)
    }
  }
}
