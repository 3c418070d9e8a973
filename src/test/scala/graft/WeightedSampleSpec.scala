package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Margin audit for the x_weighted_sample double-parity claim (round-8
  * verdict #4 / advice #5): the Efraimidis-Spirakis key is floored to
  * e8 micro-ints on BOTH engines, so hash parity needs every doc's
  * `key*1e8 + 0.5` to sit far enough from an integer boundary that a
  * ~1-ulp JVM-Math.log vs DuckDB-libm-ln divergence cannot flip the
  * floor — and the 20th/21st ordered keys to differ by at least one
  * e8 unit so top-20 membership cannot flip either. This spec MEASURES
  * both margins on the real fixtures instead of assuming them (the
  * v_pca_power audit pattern).
  */
class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Propagated error bound on the scaled key: ln carries ~1 ulp of
    * relative error between libm implementations; the divide, the 1e8
    * multiply and the u derivation add a few more. 4 relative ulps of
    * the scaled value is generous — the audit then demands the actual
    * margin beat even 1000x that. */
  private val RelUlps = 4 * math.ulp(1.0) // 4 * 2^-52

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"A-ES e8 floor margins at $sf dwarf the cross-engine ln() ulp bound") {
      val docs = graft.catalog.Q.t(spark, s"/root/testdata/$sf", "documents")
      // the EXACT production key arithmetic (TextCatalog x_weighted_sample)
      val v = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("double")
      val u = (v + lit(0.5)) / lit(16777216.0)
      val x = (-log(u) / col("n_chars")) * lit(1e8) + lit(0.5)
      val audited = docs.select(col("doc_id"), x.as("x"))
        .withColumn("frac", col("x") - floor(col("x")))
        .withColumn("margin", least(col("frac"), lit(1.0) - col("frac")))
        .withColumn("bound", lit(RelUlps) * abs(col("x")))
      val worst = audited
        .select(min(col("margin") / col("bound")).as("worst_ratio"),
          min("margin").as("min_margin"), count(lit(1)).as("n"))
        .head()
      val ratio = worst.getDouble(0)
      info(f"$sf: ${worst.getLong(2)} docs, min floor margin " +
        f"${worst.getDouble(1)}%.3e = $ratio%.0f x the 4-ulp bound")
      // >1000x headroom: a flip needs a divergence three orders beyond
      // anything libm implementations actually exhibit
      assert(ratio > 1000.0,
        f"floor-flip margin too thin: min margin is only $ratio%.1f x the ulp bound")
      // top-20 membership margin: the 20th and 21st e8 keys (with the
      // doc_id tiebreak) must differ by >= 1 micro-unit — then membership
      // can only change if some key's floor itself flips, excluded above
      val ordered = audited
        .select(floor(col("x")).cast("long").as("k"), col("doc_id"))
        .orderBy(col("k"), col("doc_id"))
        .limit(21)
        .collect()
      if (ordered.length == 21) {
        val gap = ordered(20).getLong(0) - ordered(19).getLong(0)
        info(s"$sf: 20th->21st e8 key gap = $gap micro-units")
        assert(gap >= 1,
          s"20th and 21st A-ES keys tie at e8 precision (gap $gap): " +
            "sample membership rests on the doc_id tiebreak only")
      }
    }
  }
}
