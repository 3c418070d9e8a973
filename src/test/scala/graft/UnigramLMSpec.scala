package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.UnigramLM

/** Unigram-LM tokenizer training: the distributed EM loop against a
  * brute-force oracle that enumerates EVERY segmentation of every word
  * (feasible at test sizes), plus the tie-invariance, truncation and
  * smoothing edge cases the integer design hinges on. */
class UnigramLMSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Norm = "text" // pre-normalised test docs

  // ---- brute-force twin (independent reimplementation) ----

  private def fl2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)

  private def bruteScores(vocab: Map[String, Long]): Map[String, Long] = {
    val t = vocab.values.sum
    vocab.map { case (p, c) => p -> ((1 + fl2(t) - fl2(c)) * 32L + 1) }
  }

  /** All segmentations as (piece, 1-based start) lists. */
  private def segs(w: String, vocab: Set[String], at: Int = 1): Seq[List[(String, Int)]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(UnigramLM.MaxPiece, w.length)).flatMap { pl =>
      val p = w.substring(0, pl)
      if (vocab(p)) segs(w.substring(pl), vocab, at + pl).map((p, at) :: _)
      else Seq.empty
    }

  /** (minimal composite total, pieces-on-some-optimal-path as (piece, start)). */
  private def bruteViterbi(w: String, scores: Map[String, Long]): (Long, Set[(String, Int)]) = {
    val all = segs(w, scores.keySet)
      .map(sg => sg -> sg.map { case (p, _) => scores(p) }.sum)
    val best = all.map(_._2).min
    (best, all.filter(_._2 == best).flatMap(_._1).toSet)
  }

  private def bruteInitVocab(words: Map[String, Long]): Map[String, Long] = {
    val occ = for {
      (w, f) <- words.toSeq; st <- 1 to w.length
      pl <- 1 to math.min(UnigramLM.MaxPiece, w.length - st + 1)
    } yield (w.substring(st - 1, st - 1 + pl), f)
    val counts = occ.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val singles = counts.filter(_._1.length == 1)
    val multis = counts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(UnigramLM.TopMulti)
    singles ++ multis
  }

  private def bruteUsage(words: Map[String, Long], vocab: Map[String, Long]): Map[String, Long] = {
    val sc = bruteScores(vocab)
    words.toSeq.flatMap { case (w, f) =>
      bruteViterbi(w, sc)._2.toSeq.map { case (p, _) => p -> f }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
  }

  private def bruteNext(vocab: Map[String, Long], use: Map[String, Long]): Map[String, Long] =
    vocab.collect {
      case (p, _) if p.length == 1 => p -> (use.getOrElse(p, 0L) + 1)
      case (p, _) if p.length > 1 && use.getOrElse(p, 0L) >= 1 => p -> use(p)
    }

  // ---- Spark pipeline driver ----

  private def stages(docs: (Long, String)*) = {
    val wpd = UnigramLM.wordsPerDoc(docs.toDF("doc_id", "text"), Norm)
    val words = UnigramLM.wordTable(wpd)
    val occ = UnigramLM.occurrences(words)
    val v0 = UnigramLM.initVocab(occ)
    (wpd, words, occ, v0)
  }

  private def vocabMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("full two-round EM matches the exhaustive-enumeration oracle") {
    val docs = Seq[(Long, String)](
      1L -> "banana bandana ban banana",
      2L -> "an abandoned banana brand and a bandana",
      3L -> "nab an ana and banana bananas")
    val (_, words, occ, v0) = stages(docs: _*)
    val bWords = docs.flatMap(_._2.split(' ')).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val bV0 = bruteInitVocab(bWords)
    assert(vocabMap(v0) == bV0)

    val u1 = UnigramLM.usage(UnigramLM.viterbi(occ, UnigramLM.scored(v0)))
    val bU1 = bruteUsage(bWords, bV0)
    assert(u1.collect().map(r => r.getString(0) -> r.getLong(2)).toMap == bU1)

    val v1 = UnigramLM.nextVocab(v0, u1)
    val bV1 = bruteNext(bV0, bU1)
    assert(vocabMap(v1) == bV1)

    val vit2 = UnigramLM.viterbi(occ, UnigramLM.scored(v1))
    val bSc2 = bruteScores(bV1)
    val gotTok = UnigramLM.tokenCounts(vit2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wantTok = bWords.keys.map { w =>
      w -> bruteViterbi(w, bSc2)._1 % UnigramLM.PieceBase
    }.toMap
    assert(gotTok == wantTok)
  }

  test("tied optimal segmentations: token count is well-defined, usage counts all tied paths") {
    // 'ababa' is 5 chars (no single-piece option at MaxPiece 4) in a
    // reversal-symmetric corpus, so every asymmetric optimal
    // segmentation has a distinct equal-cost mirror twin — ties are
    // structural. Spark must agree with the enumeration oracle on both
    // the (tie-invariant) token count and the union-over-optimal-paths
    // usage.
    val docs = Seq[(Long, String)](1L -> "ababa babab ab ba")
    val (_, _, occ, v0) = stages(docs: _*)
    val bWords = docs.flatMap(_._2.split(' ')).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val bV0 = bruteInitVocab(bWords)
    val bSc = bruteScores(bV0)
    val all = segs("ababa", bSc.keySet)
      .map(sg => sg -> sg.map { case (p, _) => bSc(p) }.sum)
    val best = all.map(_._2).min
    assert(all.count(_._2 == best) >= 2, "test premise: ties must exist")
    val vit = UnigramLM.viterbi(occ, UnigramLM.scored(v0))
    val tok = UnigramLM.tokenCounts(vit).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tok("ababa") == best % UnigramLM.PieceBase)
    val u = UnigramLM.usage(vit).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(u == bruteUsage(bWords, bV0))
  }

  test("words truncate to MaxLen before everything (both freq and DP)") {
    val long = "abcdefghijklmnopqrstuvwxyz" // 26 chars -> truncates to 16
    val docs = Seq[(Long, String)](1L -> s"$long $long")
    val (_, words, _, _) = stages(docs: _*)
    val got = words.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((long.take(UnigramLM.MaxLen), 2L, UnigramLM.MaxLen)))
  }

  test("single-char smoothing keeps round 2 feasible when multis absorb everything") {
    // corpus of pure 'ab' repetitions: round 1 segments every word with
    // the 'ab' piece, chars get zero usage — smoothing must keep them
    // alive (cnt = 1) and the round-2 DP feasible for every word
    val docs = Seq[(Long, String)](1L -> "ab abab ab abab ababab")
    val (_, _, occ, v0) = stages(docs: _*)
    val u1 = UnigramLM.usage(UnigramLM.viterbi(occ, UnigramLM.scored(v0)))
    val v1 = UnigramLM.nextVocab(v0, u1)
    val v1m = vocabMap(v1)
    assert(v1m("a") == 1 && v1m("b") == 1) // use 0 + smoothing
    val vit2 = UnigramLM.viterbi(occ, UnigramLM.scored(v1))
    val tok2 = UnigramLM.tokenCounts(vit2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'abab' is itself a piece (MaxPiece = 4); 'ababab' needs two
    assert(tok2 == Map("ab" -> 1L, "abab" -> 1L, "ababab" -> 2L))
  }

  test("composite bound holds: every word's piece count stays under PieceBase") {
    // the total % 32 trick requires n_pieces < 32 — MaxLen 16 enforces
    // it structurally; assert on the worst case (all single chars)
    val docs = Seq[(Long, String)](1L -> "qwertyuiopasdfgh zxcvbnmqwertyui")
    val (_, _, occ, v0) = stages(docs: _*)
    val vit = UnigramLM.viterbi(occ, UnigramLM.scored(v0))
    val toks = UnigramLM.tokenCounts(vit).collect().map(_.getLong(1))
    assert(toks.forall(t => t >= 1 && t < UnigramLM.PieceBase))
  }
}
