package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Seasonal

/** Additive seasonal decomposition: trend recovery, seasonal index
  * extraction, gap alignment, integer-exactness. */
class SeasonalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series(xs: (Long, Long)*) = xs.toDF("slot", "y")

  test("a pure linear trend detrends to near-zero residuals") {
    // y = 10 * slot: centered window mean = 10 * slot exactly
    val s = series((0L to 48L).map(i => (i, i * 10)): _*)
    val det = Seasonal.detrend(s, 4, 2)
      .select("slot", "resid_e4").as[(Long, Long)].collect().toMap
    // interior slots: window is symmetric, trend = y, resid = 0
    (2L to 46L).foreach(i => assert(det(i) == 0L, s"slot $i"))
    // edges: shrunken window biases the trend, resid nonzero
    assert(det(0L) != 0L)
  }

  test("a pure periodic signal lands in the seasonal index") {
    // period 4, amplitude pattern (0, 100, 0, -100), zero trend;
    // 80 slots so edge effects dilute
    val pat = Seq(0L, 100L, 0L, -100L)
    val s = series((0L to 79L).map(i => (i, 1000L + pat((i % 4).toInt))): _*)
    val idx = Seasonal.seasonalIndex(Seasonal.detrend(s, 4, 2))
      .select("phase", "seasonal_e4").as[(Long, Long)].collect().toMap
    // phase means sit near the pattern (1e-4 units; edge slots skew
    // a few units, floor truncates)
    assert(math.abs(idx(1L) - 100L * 10000L) < 300000L)
    assert(math.abs(idx(3L) + 100L * 10000L) < 300000L)
    assert(math.abs(idx(0L)) < 300000L && math.abs(idx(2L)) < 300000L)
  }

  test("gaps shrink the window instead of misaligning it") {
    // slots 0..20 with 10..12 missing: RANGE frame at slot 13 must
    // average actual neighbors only
    val s = series(((0L to 9L) ++ (13L to 20L)).map(i => (i, 100L)): _*)
    val det = Seasonal.detrend(s, 4, 2)
      .select("slot", "trend_e4").as[(Long, Long)].collect().toMap
    assert(det(13L) == 100L * 10000L) // constant series: trend exact
    assert(det.size == 18)
  }

  test("phase column is slot modulo period") {
    val s = series((0L to 9L).map(i => (i, 1L)): _*)
    val ph = Seasonal.detrend(s, 3, 1)
      .select("slot", "phase").as[(Long, Long)].collect().toMap
    assert(ph(7L) == 1L && ph(9L) == 0L)
  }
}
