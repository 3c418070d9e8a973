package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969),
  * the unsupervised EM parameter fit of Winkler 1988 — the model behind
  * Splink / the classic deduplication stacks: candidate pairs carry a
  * vector of binary field-agreement comparisons gamma, and the model
  * learns, WITHOUT labels, the probability lambda that a candidate pair
  * is a true match plus per-field agreement rates m_i = P(gamma_i=1 | M)
  * and u_i = P(gamma_i=1 | U); the posterior under conditional
  * independence is the naive-Bayes ratio. This is the statistical
  * upgrade of the reference's deterministic entity-match cascade
  * (hubspot-neo4j-pipeline's email/name J7 rules): instead of a
  * hand-ranked rule list, the data itself weighs each field.
  *
  * Distribution insight (what makes this 100 TB-shaped): the E-step
  * responsibility depends ONLY on the gamma pattern, never the pair —
  * so after ONE corpus-sized aggregation (pattern -> count), EM runs
  * entirely on a frame of at most 2^k rows. No iteration ever touches
  * the pair set again, and the pair set itself comes from capped
  * blocking, never all-pairs.
  *
  * Determinism discipline (the hash-compare contract): all parameters
  * live as INTEGER ppm. The E-step posterior is ONE fixed IEEE
  * expression tree over those integers (left-associated products of
  * correctly-rounded /1e6 factors — both engines compute bit-identical
  * doubles, the v_mmr_rerank discipline) quantized back to ppm with
  * floor(x*1e6+0.5) and clamped to [1, 999999]; the M-step is pure
  * BIGINT arithmetic (sums of count*ppm products, integer division);
  * parameters clamp to [1000, 999000] ppm (bounded away from the 0/1
  * degeneracies, as Splink does). Quantize -> sum -> divide is exact in
  * any aggregation order, so a 1000-executor run and the DuckDB oracle
  * land on identical parameters at every iteration.
  */
object RecordLinkage {

  /** One EM iteration's E-step posterior, as a Column over a pattern
    * frame crossed with the 1-row param frame. Fixed expression tree:
    *   fm = (lam/1e6) * prod_i (g_i ? m_i/1e6 : (1e6-m_i)/1e6)
    *   fu = ((1e6-lam)/1e6) * prod_i (g_i ? u_i/1e6 : (1e6-u_i)/1e6)
    *   r_ppm = clamp(floor(1e6 * fm/(fm+fu) + 0.5), 1, 999999)
    * The clamp keeps every M-step denominator strictly positive. */
  private def rPpm(gammas: Seq[String]): Column = {
    def side(p: String, first: String) = {
      val factors = gammas.map(g =>
        s"(CASE WHEN $g = 1 THEN ${p}_$g ELSE 1000000 - ${p}_$g END / 1.0e6)")
      (first +: factors).mkString("(", " * ", ")")
    }
    val fm = side("m", "(lam / 1.0e6)")
    val fu = side("u", "((1000000 - lam) / 1.0e6)")
    expr(s"greatest(1L, least(999999L, " +
      s"CAST(floor(1000000 * ($fm / ($fm + $fu)) + 0.5) AS BIGINT)))")
  }

  /** The M-step: fold the pattern frame (with r_ppm) back into a 1-row
    * param frame. Integer-exact; every ratio is a single BIGINT div. */
  private def mStep(e: DataFrame, gammas: Seq[String]): DataFrame = {
    def clamp(x: String) = s"greatest(1000L, least(999000L, $x))"
    val lam = expr(clamp("sum(n * r_ppm) div sum(n)")).as("lam")
    val ms = gammas.map(g => expr(clamp(
      s"(1000000 * sum(n * r_ppm * $g)) div sum(n * r_ppm)")).as(s"m_$g"))
    val us = gammas.map(g => expr(clamp(
      s"(1000000 * sum(n * (1000000 - r_ppm) * $g)) div " +
        s"sum(n * (1000000 - r_ppm))")).as(s"u_$g"))
    e.agg(lam, (ms ++ us): _*)
  }

  /** Run `iters` EM iterations over an aggregated gamma-pattern frame.
    *
    * @param patterns one row per distinct comparison vector: the gamma
    *                 columns (INT 0/1) plus `n` (BIGINT pair count).
    * @param gammas   the gamma column names, e.g. Seq("g1","g2","g3","g4").
    * @return the pattern frame with the final posterior `r_ppm` plus the
    *         final parameters as constant columns (`lam`, `m_<g>`,
    *         `u_<g>`) — everything BIGINT ppm.
    *
    * Inits are the Winkler folk constants: lambda 0.1, m 0.9, u 0.1.
    * The pattern frame has at most 2^k rows, so the iterations are
    * driver-planned but executor-cheap: each is one broadcast cross
    * join + one aggregate over <= 2^k rows.
    */
  def emPpm(patterns: DataFrame, gammas: Seq[String], iters: Int): DataFrame = {
    require(iters >= 1, s"emPpm: iters must be >= 1, got $iters")
    val init = Seq(lit(100000L).as("lam")) ++
      gammas.map(g => lit(900000L).as(s"m_$g")) ++
      gammas.map(g => lit(100000L).as(s"u_$g"))
    val spark = patterns.sparkSession
    import spark.implicits._
    var params = Seq(1).toDF("__one").select(init: _*)
    (1 to iters).foreach { _ =>
      val e = patterns.crossJoin(broadcast(params))
        .withColumn("r_ppm", rPpm(gammas))
      params = mStep(e, gammas)
    }
    // Report the posterior UNDER the final parameters (one extra
    // E-step), so r_ppm and the published lam/m/u columns agree.
    patterns.crossJoin(broadcast(params))
      .withColumn("r_ppm", rPpm(gammas))
  }
}
