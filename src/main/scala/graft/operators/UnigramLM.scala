package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece) tokenizer training as bounded aggregate
  * rounds — Kudo 2018's EM loop re-expressed for hash-exact distributed
  * execution, the complement of the BPE pair (`x_bpe_train` learns
  * merges; this learns a PIECE VOCABULARY with per-piece usage).
  *
  * The loop: seed a vocabulary (all single chars + the most frequent
  * multi-char substrings), Viterbi-segment every DISTINCT word against
  * it (E-step, row-local over a broadcast vocab), count piece usage
  * weighted by word frequency (M-step, one grouped sum), prune unused
  * pieces, repeat with re-derived piece costs. The corpus-sized work is
  * exactly one hash join of the token stream against the encoded vocab —
  * the same O(corpus tokens), never O(corpus x rounds) shape as
  * x_bpe_encode, because EM runs on the frequency-weighted distinct-word
  * table (the reason SentencePiece trains on a counted vocab too).
  *
  * Determinism (the property that lets a DuckDB oracle hash-match):
  * real unigram-LM maximises a product of float probabilities, and an
  * argmax over engine-rounded doubles can flip — so piece costs here are
  * the DYADIC quantisation of the log-probability: cost(p) =
  * 1 + floor(log2 T) - floor(log2 c_p), an integer computed EXACTLY in
  * both engines as length(bin(x)) - 1 (Shannon-style integer code
  * lengths; the +1 keeps every piece cost positive). Viterbi then
  * minimises the composite integer `cost * 32 + pieces` — lexicographic
  * (total cost, piece count), well-defined even when multiple
  * segmentations tie, because the OUTPUTS only ever read the minimum
  * composite (token count = total % 32) or the on-SOME-optimal-path
  * predicate f[i] + score + b[j] == total, both tie-invariant. No
  * chosen-path reconstruction, no tie-break rule, no floats anywhere.
  *
  * Bounds that keep the DP row-local and the oracle finite: words
  * truncate to [[MaxLen]] chars, pieces cap at [[MaxPiece]] chars, and
  * a word's piece count <= MaxLen < 32 keeps the composite exact.
  */
object UnigramLM {

  /** Max word length fed to the DP (longer words truncate — both the
    * Spark side and any oracle must truncate identically). */
  val MaxLen = 16

  /** Max piece length considered for the vocabulary. */
  val MaxPiece = 4

  /** Multi-char vocabulary budget (top-N by weighted substring count,
    * ties broken lexicographically). */
  val TopMulti = 48

  /** Composite base: dp = cost * PieceBase + pieceCount. Safe because
    * pieceCount <= MaxLen < PieceBase. */
  val PieceBase = 32

  /** (doc_id, w): one row per word OCCURRENCE, lowercase-ascii words
    * truncated to MaxLen. The corpus-sized table — everything else
    * derives from its distinct-word rollup. */
  def wordsPerDoc(docs: DataFrame, normSql: String): DataFrame =
    docs
      .withColumn("az",
        expr(s"regexp_replace($normSql, '[^\\\\x00-\\\\x7f]', '')"))
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(az, '[a-z]+', 0)")).as("w0"))
      .select(col("doc_id"), expr(s"substring(w0, 1, $MaxLen)").as("w"))

  /** Frequency-weighted distinct words: (w, freq, L). */
  def wordTable(wpd: DataFrame): DataFrame =
    wpd.groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("L", length(col("w")))

  /** Every substring occurrence of every distinct word:
    * (w, freq, L, start 1-based, plen 1..MaxPiece, piece). Bounded
    * fan-out: <= MaxLen * MaxPiece rows per distinct word. */
  def occurrences(words: DataFrame): DataFrame =
    words.select(col("w"), col("freq"), col("L"),
      explode(expr(
        s"""flatten(transform(sequence(1, L), st ->
              transform(sequence(1, least($MaxPiece, L - st + 1)), pl ->
                struct(st AS start, pl AS plen,
                  substring(w, st, pl) AS piece))))""")).as("o"))
      .select(col("w"), col("freq"), col("L"),
        col("o.start").as("start"), col("o.plen").as("plen"),
        col("o.piece").as("piece"))

  /** Seed vocabulary: all single chars (coverage guarantee — Viterbi is
    * always feasible) + top [[TopMulti]] multi-char substrings by
    * weighted occurrence count. (piece, plen, cnt). */
  def initVocab(occ: DataFrame): DataFrame = {
    val counts = occ.groupBy("piece", "plen").agg(sum("freq").as("cnt"))
    counts.filter(col("plen") === 1).unionByName(
      counts.filter(col("plen") > 1)
        .orderBy(col("cnt").desc, col("piece").asc).limit(TopMulti))
      .select("piece", "plen", "cnt")
  }

  /** Dyadic integer scores for a vocab round: score = (1 + FL2(T) -
    * FL2(cnt)) * PieceBase + 1 with FL2(x) = length(bin(x)) - 1, exact
    * on both engines. The total T rides in as a broadcast 1-row frame
    * (in-plan scalar — no driver fetch). */
  def scored(vocab: DataFrame): DataFrame =
    vocab.crossJoin(broadcast(vocab.agg(sum("cnt").as("T"))))
      .withColumn("score",
        ((lit(1) + (length(expr("bin(T)")) - lit(1))
          - (length(expr("bin(cnt)")) - lit(1)))
          * PieceBase + 1).cast("long"))
      .select("piece", "plen", "score")

  /** E-step: per distinct word, forward dp `f` (f[j] = min composite
    * over segmentations of the first j chars), backward dp `g` (g[r] =
    * same for the last r chars) and the word total — all computed
    * ROW-LOCALLY with one `aggregate` fold per direction over the
    * word's vocab matches (collected after one broadcast join). Output:
    * (w, freq, L, ms, f, g, total). */
  def viterbi(occ: DataFrame, scores: DataFrame): DataFrame =
    occ.join(broadcast(scores), Seq("piece", "plen"))
      .groupBy("w", "freq", "L")
      .agg(collect_list(
        struct(col("start"), col("plen"), col("score"), col("piece")))
        .as("ms"))
      // f: acc(i) holds f[i-1]; piece (start, plen) ends at j when
      // start + plen - 1 = j and contributes f[start-1] + score
      .withColumn("f", expr(
        """aggregate(sequence(1, L), array(0L),
             (acc, j) -> acc || array(array_min(transform(
               filter(ms, m -> m.start + m.plen - 1 = j),
               m -> element_at(acc, m.start) + m.score))))"""))
      // g: acc(i) holds g[i-1]; for suffix length r the candidate
      // pieces start at L - r + 1 and leave a suffix of r - plen
      .withColumn("g", expr(
        """aggregate(sequence(1, L), array(0L),
             (acc, r) -> acc || array(array_min(transform(
               filter(ms, m -> m.start = L - r + 1 AND m.plen <= r),
               m -> m.score + element_at(acc, r - m.plen + 1)))))"""))
      .withColumn("total", expr("element_at(f, L + 1)"))

  /** M-step: weighted usage of every piece occurrence lying on SOME
    * optimal segmentation — f[start-1] + score + g[suffix] == total.
    * Tie-invariant by construction (see object doc). */
  def usage(vit: DataFrame): DataFrame =
    vit.select(col("freq"), col("total"), col("f"), col("g"), col("L"),
      explode(col("ms")).as("m"))
      .filter(expr(
        """element_at(f, m.start) + m.score
             + element_at(g, L - m.start - m.plen + 2) = total"""))
      .groupBy(col("m.piece").as("piece"), col("m.plen").as("plen"))
      .agg(sum("freq").as("use"))

  /** Prune + re-count for the next round: multi-char pieces survive on
    * use >= 1 with cnt = use; single chars always survive with cnt =
    * use + 1 (add-one smoothing keeps FL2 defined and coverage intact
    * when a char's every occurrence got absorbed into multi pieces). */
  def nextVocab(vocab: DataFrame, use: DataFrame): DataFrame = {
    val j = vocab.select("piece", "plen")
      .join(use, Seq("piece", "plen"), "left")
      .withColumn("use", coalesce(col("use"), lit(0L)))
    j.filter(col("plen") === 1).withColumn("cnt", col("use") + 1)
      .unionByName(
        j.filter(col("plen") > 1 && col("use") >= 1)
          .withColumn("cnt", col("use")))
      .select("piece", "plen", "cnt")
  }

  /** Per-word token count under a round's scores: total % PieceBase. */
  def tokenCounts(vit: DataFrame): DataFrame =
    vit.select(col("w"), (col("total") % PieceBase).as("n_tok"))
}
