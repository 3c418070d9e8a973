package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Lineage.CutOps

/** Markov-chain marketing attribution by removal effect (Anderl et al.
  * 2014) — the data-driven answer to "which touchpoint actually drives
  * conversions" that first/last-touch heuristics fake: user journeys
  * become a first-order Markov chain over touchpoint states with two
  * absorbing states (CONV on first purchase, NULL on journey end), and
  * a channel's credit is its REMOVAL EFFECT — how much the start-to-
  * conversion probability drops when visits to that channel are
  * redirected to NULL.
  *
  * Distribution shape (the whole point at 100 TB): the corpus is
  * touched exactly ONCE — journey extraction + transition counting is
  * one window pass and one map-side-combinable aggregate pivoted into
  * a SINGLE row of counts over the fixed state vocabulary. Absorption
  * probabilities then run on that 1-row frame: K fixed value-iteration
  * rounds, each a crossJoin of two 1-row frames (the join is the
  * barrier that stops projection collapse from exponentially inlining
  * the recurrence), all five chain variants (base + four removals)
  * iterated side by side in the same row.
  *
  * Determinism: probabilities are integer ppm; each round's update
  *   p'_s = (sum_t n_st * p_t + n_sP * 1e6) div d_s
  * is pure BIGINT (numerators non-negative, so truncating div is floor
  * on both engines); K rounds of value iteration converge monotonically
  * from below to the absorption probability (published K is a
  * documented lower-bound truncation — identical on both engines).
  * The oracle replays the identical recurrence from the same generated
  * term lists (only the div dialect differs).
  */
object Attribution {

  /** Touchpoint states (excluding the absorbers): view, click, signup,
    * error; purchase is CONV. Fixed vocabulary = fixed pivot columns. */
  private val Chans = Seq("v", "k", "g", "e")
  private val StateOf = Map("view" -> "v", "click" -> "k",
    "signup" -> "g", "error" -> "e", "purchase" -> "P")
  /** Variants: base chain + one removal per channel. */
  private val Variants: Seq[(String, Option[String])] =
    ("b", None) +: Chans.map(c => (s"r$c", Some(c)))

  /** The state an event_type maps to, as a SQL CASE (both dialects). */
  private def stateCase(col: String): String =
    "CASE " + StateOf.map { case (t, s) => s"WHEN $col = '$t' THEN '$s'" }
      .mkString(" ") + " END"

  /** Numerator of the value-iteration update for source state `s`
    * under `removed`, over param columns named p_<variant>_<state>. */
  private def numer(v: String, s: String, removed: Option[String]): String =
    (Chans.filterNot(removed.contains)
      .map(t => s"n_$s$t * p_${v}_$t") :+ s"n_${s}P * 1000000")
      .mkString(" + ")

  /** Out-degree of source state `s` (all six targets — removal
    * REDIRECTS mass to NULL, it never renormalizes). */
  private def dsum(s: String): String =
    (Chans.map(t => s"n_$s$t") ++ Seq(s"n_${s}P", s"n_${s}N"))
      .mkString("greatest(1L, ", " + ", ")")

  private def dsumDuck(s: String): String =
    (Chans.map(t => s"n_$s$t") ++ Seq(s"n_${s}P", s"n_${s}N"))
      .mkString("greatest(1, ", " + ", ")")

  /** All (variant, state) param columns. */
  private def paramCols: Seq[(String, String)] = for {
    (v, removed) <- Variants
    s <- Chans if !removed.contains(s)
  } yield (v, s)

  /** One row of transition counts n_<src><dst> over the fixed
    * vocabulary (src in S,v,k,g,e; dst in v,k,g,e,P,N). */
  def transitionCounts(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wU = Window.partitionBy("user_id")
    val seqd = events
      .select(col("user_id"), col("ts"), col("event_id"),
        expr(stateCase("event_type")).as("st"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("cut", min(when(col("st") === "P", col("rn"))).over(wU))
      .filter(col("cut").isNull || col("rn") <= col("cut"))
    val seq2 = seqd
      .withColumn("prev", lag("st", 1).over(wOrd))
      .withColumn("last_rn", max("rn").over(wU))
    val steps = seq2.select(coalesce(col("prev"), lit("S")).as("src"),
      col("st").as("dst"))
    val terminal = seq2.filter(col("cut").isNull && col("rn") === col("last_rn"))
      .select(col("st").as("src"), lit("N").as("dst"))
    val trans = steps.unionByName(terminal)
    val cols = for {
      s <- "S" +: Chans
      t <- Chans ++ Seq("P", "N")
    } yield sum(when(col("src") === s && col("dst") === t, 1L)
      .otherwise(0L)).as(s"n_$s$t")
    trans.agg(cols.head, cols.tail: _*)
  }

  /** Removal-effect attribution over `iters` value-iteration rounds.
    * Output: one row per channel — (channel, conv_base_ppm,
    * conv_removed_ppm, re_ppm, share_ppm). */
  def markovAttribution(events: DataFrame, iters: Int): DataFrame = {
    val counts = transitionCounts(events).cutLineage()
    var params = counts.select(
      paramCols.map { case (v, s) => lit(0L).as(s"p_${v}_$s") }: _*)
    (1 to iters).foreach { _ =>
      params = params.crossJoin(broadcast(counts)).select(
        paramCols.map { case (v, s) =>
          val removed = Variants.find(_._1 == v).get._2
          expr(s"(${numer(v, s, removed)}) div ${dsum(s)}")
            .as(s"p_${v}_$s")
        }: _*)
    }
    val conv = params.crossJoin(broadcast(counts)).select(
      Variants.map { case (v, removed) =>
        expr(s"(${numer(v, "S", removed)}) div ${dsum("S")}")
          .as(s"conv_$v")
      }: _*)
    val re = conv.select(
      (conv.columns.map(col).toSeq ++
        Chans.map(c => greatest(lit(0L), col("conv_b") - col(s"conv_r$c"))
          .as(s"re_$c"))): _*)
      .withColumn("re_total",
        Chans.map(c => col(s"re_$c")).reduce(_ + _))
    val chanName = Map("v" -> "view", "k" -> "click", "g" -> "signup",
      "e" -> "error")
    re.select(explode(array(Chans.map(c => struct(
        lit(chanName(c)).as("channel"),
        col("conv_b").as("conv_base_ppm"),
        col(s"conv_r$c").as("conv_removed_ppm"),
        col(s"re_$c").as("re_ppm"),
        when(col("re_total") > 0,
          expr(s"1000000 * re_$c div re_total")).otherwise(0L)
          .as("share_ppm"))): _*)).as("r"))
      .select("r.channel", "r.conv_base_ppm", "r.conv_removed_ppm",
        "r.re_ppm", "r.share_ppm")
      .orderBy("channel")
  }

  /** DuckDB oracle for [[markovAttribution]], generated from the SAME
    * term lists (dialect: `//` for `div`; numerators are non-negative,
    * so both truncations are floors). */
  def duckSql(iters: Int): String = {
    val countCols = (for {
      s <- "S" +: Chans
      t <- Chans ++ Seq("P", "N")
    } yield s"CAST(sum(CASE WHEN src = '$s' AND dst = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$s$t")
      .mkString(",\n                 ")
    def numerD(v: String, s: String, removed: Option[String]): String =
      (Chans.filterNot(removed.contains)
        .map(t => s"n_$s$t * p_${v}_$t") :+ s"n_${s}P * 1000000")
        .mkString(" + ")
    val p0 = paramCols.map { case (v, s) => s"CAST(0 AS BIGINT) AS p_${v}_$s" }
      .mkString(", ")
    val itersSql = (1 to iters).map { i =>
      val cols = paramCols.map { case (v, s) =>
        val removed = Variants.find(_._1 == v).get._2
        s"CAST((${numerD(v, s, removed)}) // ${dsumDuck(s)} AS BIGINT) AS p_${v}_$s"
      }.mkString(",\n                 ")
      s"p$i AS (SELECT $cols FROM p${i - 1}, cnts)"
    }.mkString(",\n               ")
    val convCols = Variants.map { case (v, removed) =>
      s"CAST((${numerD(v, "S", removed)}) // ${dsumDuck("S")} AS BIGINT) AS conv_$v"
    }.mkString(",\n                 ")
    val reCols = Chans.map(c =>
      s"CAST(greatest(0, conv_b - conv_r$c) AS BIGINT) AS re_$c")
      .mkString(", ")
    val reTotal = Chans.map(c => s"re_$c").mkString(" + ")
    val rows = Chans.map { c =>
      val name = Map("v" -> "view", "k" -> "click", "g" -> "signup",
        "e" -> "error")(c)
      s"""SELECT '$name' AS channel, conv_b AS conv_base_ppm,
            conv_r$c AS conv_removed_ppm, re_$c AS re_ppm,
            CASE WHEN re_total > 0
              THEN CAST(1000000 * re_$c // re_total AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS share_ppm
          FROM re"""
    }.mkString("\n               UNION ALL ")
    s"""WITH s0 AS (
           SELECT user_id, ts, event_id, ${stateCase("event_type")} AS st,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
           FROM events),
         seqd AS (
           SELECT *, min(CASE WHEN st = 'P' THEN rn END)
             OVER (PARTITION BY user_id) AS cut
           FROM s0),
         kept AS (
           SELECT user_id, ts, event_id, st, rn, cut,
             lag(st) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev,
             max(rn) OVER (PARTITION BY user_id) AS last_rn
           FROM seqd WHERE cut IS NULL OR rn <= cut),
         trans AS (
           SELECT coalesce(prev, 'S') AS src, st AS dst FROM kept
           UNION ALL
           SELECT st, 'N' FROM kept
           WHERE cut IS NULL AND rn = last_rn),
         cnts AS (SELECT $countCols FROM trans),
         p0 AS (SELECT $p0),
         $itersSql,
         conv AS (SELECT $convCols FROM p$iters, cnts),
         re AS (SELECT *, CAST($reTotal AS BIGINT) AS re_total
                FROM (SELECT *, $reCols FROM conv))
         SELECT channel, conv_base_ppm, conv_removed_ppm, re_ppm, share_ppm
         FROM ($rows)
         ORDER BY channel"""
  }
}
