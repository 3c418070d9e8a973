package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Lineage.CutOps

/** Exact repeated-substring detection by distributed prefix doubling —
  * the suffix-array construction discipline (Manber-Myers doubling, as
  * distributed by Flick & Aluru 2015) specialised to the dedup question
  * Lee et al. 2022 ask of a training corpus: which positions start a
  * token K-gram that occurs more than once corpus-wide?
  *
  * Where `x_repeated_spans` answers this with xxhash64 fingerprints (a
  * collision could silently merge two distinct grams), this operator is
  * EXACT: position ids are canonical representatives (the minimum global
  * position among equal contexts), and each doubling round widens the
  * identified context from k to 2k tokens with one self-join + one
  * aggregate. After log2(K) rounds two positions share an id iff their
  * K-token contexts are literally equal.
  *
  * The classic construction ranks suffixes (ORDER matters for the final
  * array); dedup only needs EQUALITY, which is why no global sort — the
  * scale bottleneck of distributed suffix arrays — appears anywhere:
  * canonicalisation is `groupBy(pair).agg(min(gid))` + a hash join back,
  * both map-side-combinable corpus-sized shuffles on uniformly
  * distributed keys. Cost: log2(K) rounds x O(n) rows carrying one
  * 8-byte id, vs the fingerprint path's single shuffle — the price of
  * exactness, and still embarrassingly sublinear in rounds (K=32 is 5).
  *
  * Truncated-suffix semantics (positions near the end of a doc, where
  * the 2k-token context runs off the edge) follow the sentinel rule:
  * a missing partner contributes `-rem` (tokens remaining, negated) to
  * the pair, so two truncated contexts compare equal only when their
  * token content AND their truncation length agree. The invariant, by
  * induction over rounds: `id_k[i] == id_k[j]` iff the first
  * `min(k, rem)` tokens match and (`rem_i == rem_j` or both >= k).
  * Positions with `rem >= K` therefore carry exact full-K context ids,
  * which is all the span queries consume.
  */
object SuffixDedup {

  /** Bits reserved for the token position inside the packed global id:
    * supports docs up to 2^22 (~4.2M) tokens and doc_ids up to 2^41.
    * The guard in [[tokenTable]] raises on longer docs rather than
    * silently colliding. */
  val PosBits = 22

  /** Explode `docs` into one row per token position:
    * (doc_id, pos 0-based, rem tokens remaining incl. current, gid
    * packed global position, tok). `normSql` is the shared
    * normalisation expression (Curation.NormSql for the catalog). */
  def tokenTable(docs: DataFrame, normSql: String): DataFrame = {
    val lim = 1L << PosBits
    docs
      .select(col("doc_id"), expr(s"split($normSql, ' ')").as("a"))
      // the raise_error branch keeps the packed-gid bound honest: a doc
      // past 2^22 tokens must fail loudly, not alias another position
      .withColumn("len",
        when(size(col("a")) < lim, size(col("a")).cast("long"))
          .otherwise(expr(s"raise_error('SuffixDedup: doc exceeds $lim tokens')")))
      .select(col("doc_id"), col("len"),
        posexplode(col("a")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"),
        (col("len") - col("pos")).as("rem"),
        (col("doc_id") * lim + col("pos")).as("gid"), col("tok"))
  }

  /** One canonicalisation: rows sharing (ka, kb) get id = min(gid) over
    * the group. groupBy + join-back (not a window min): the aggregate
    * partial-combines map-side and the join streams hot keys, so a
    * stop-word-sized group (5% of the corpus on one key at k=1) never
    * buffers in a single task the way a window partition would. */
  private def canonize(df: DataFrame): DataFrame = {
    val canon = df.groupBy("ka", "kb").agg(min("gid").as("id"))
    df.join(canon, Seq("ka", "kb"))
      .select("doc_id", "pos", "rem", "gid", "id")
  }

  /** The doubling ladder: Seq of (k, ids) for k = 1, 2, 4, ..., K with
    * schema (doc_id, pos, rem, gid, id). Each rung is lineage-cut (the
    * next rung reads it twice: as itself and as its own partner side).
    * K must be a power of two. */
  def contextIdLadder(tokens: DataFrame, K: Int): Seq[(Int, DataFrame)] = {
    require(K >= 1 && (K & (K - 1)) == 0, s"K must be a power of two, got $K")
    val base = canonize(tokens
      .select(col("doc_id"), col("pos"), col("rem"), col("gid"),
        col("tok").as("ka"), lit(0L).as("kb"))).cutLineage()
    var ladder = Vector(1 -> base)
    var k = 1
    while (k < K) {
      val cur = ladder.last._2
      // partner view: the id that sits k positions to the right, keyed
      // back to THIS position (join on (doc_id, pos), both sides from
      // the same cut frame — no recompute)
      val partner = cur.select(col("doc_id"),
        (col("pos") - k).as("pos"), col("id").as("pid"))
      val paired = cur.join(partner, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("rem"), col("gid"),
          col("id").as("ka"),
          coalesce(col("pid"), -col("rem")).as("kb"))
      k *= 2
      ladder = ladder :+ (k -> canonize(paired).cutLineage())
    }
    ladder
  }

  /** Positions whose K-token context repeats corpus-wide (count >= 2
    * among full-length positions), given the ladder's K rung. */
  def repeatedStarts(idsK: DataFrame, K: Int): DataFrame = {
    val full = idsK.filter(col("rem") >= K)
    val dup = full.groupBy("id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("id")
    full.join(dup, Seq("id"), "left_semi")
  }

  /** Maximal per-doc spans of repeated-K-gram start positions — the
    * exact twin of the fingerprint-based repeatedSpanTable: runs of
    * consecutive marked positions merge into (doc_id, span_start,
    * span_end) islands, span_end covering the final gram's K tokens. */
  def repeatedSpans(idsK: DataFrame, K: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    repeatedStarts(idsK, K)
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("span_start"),
        (max(col("pos")) + lit(K - 1)).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }
}
