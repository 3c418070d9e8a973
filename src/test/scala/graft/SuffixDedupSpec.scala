package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SuffixDedup

/** Prefix-doubling exact substring dedup: context-id equality semantics
  * (including the truncated-suffix sentinel rule), span extraction
  * against a brute-force oracle, and the amortised tier ladder. */
class SuffixDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the catalog's normalisation is irrelevant here — feed pre-normalised
  // space-separated text and split on it directly
  private val Norm = "text"

  private def toks(docs: (Long, String)*) =
    SuffixDedup.tokenTable(docs.toDF("doc_id", "text"), Norm)

  /** Brute-force oracle: repeated K-gram start positions by literal
    * string grouping, merged into maximal islands per doc. */
  private def bruteSpans(k: Int, docs: (Long, String)*): Set[(Long, Int, Int)] = {
    val grams = for {
      (id, text) <- docs
      a = text.split(' ')
      i <- 0 to a.length - k
    } yield (id, i, a.slice(i, i + k).toSeq)
    val dup = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
    val marked = grams.filter(g => dup(g._3)).map(g => (g._1, g._2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
    marked.flatMap { case (id, ps) =>
      // split sorted positions into consecutive runs
      ps.foldLeft(List.empty[List[Int]]) {
        case (acc @ (run @ (h :: _)) :: rest, p) if p == h + 1 =>
          (p :: run) :: rest
        case (acc, p) => List(p) :: acc
      }.map(run => (id, run.min, run.max + k - 1))
    }.toSet
  }

  private def gotSpans(k: Int, docs: (Long, String)*): Set[(Long, Int, Int)] = {
    val ids = SuffixDedup.contextIdLadder(toks(docs: _*), k).last._2
    SuffixDedup.repeatedSpans(ids, k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
  }

  test("a phrase repeated across two docs yields one maximal span each") {
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val got = gotSpans(8,
      1L -> s"a b c $shared x y z",
      2L -> s"$shared p q r s t u v w")
    // doc 1: positions 3..10 hold the gram; doc 2: positions 0..7
    assert(got == Set((1L, 3, 10), (2L, 0, 7)))
  }

  test("overlapping repeated grams merge into one island") {
    // a 10-token phrase repeated -> 3 consecutive 8-gram starts merge
    val phrase = (1 to 10).map(i => s"p$i").mkString(" ")
    val got = gotSpans(8, 1L -> s"$phrase mid $phrase")
    assert(got == Set((1L, 0, 9), (1L, 11, 20)))
  }

  test("equal 7-token tails do NOT create 8-token spans (sentinel rule)") {
    // two docs sharing their last 7 tokens only: an id-equality bug that
    // ignored truncation lengths would mark these as repeated 8-grams
    val tail = (1 to 7).map(i => s"t$i").mkString(" ")
    val got = gotSpans(8, 1L -> s"a $tail", 2L -> s"b $tail")
    assert(got.isEmpty)
  }

  test("equal truncated suffixes of equal length still match at full K") {
    // identical 8-gram with NOTHING after it in either doc: rem == K
    // exactly, partner absent at every doubling round on the tail side
    val g = (1 to 8).map(i => s"e$i").mkString(" ")
    val got = gotSpans(8, 1L -> s"x $g", 2L -> s"y $g")
    assert(got == Set((1L, 1, 8), (2L, 1, 8)))
  }

  test("spans match the brute-force oracle on a repetitive mixed corpus") {
    val docs = Seq[(Long, String)](
      1L -> "the quick brown fox jumps over the lazy dog again and again and again",
      2L -> "once the quick brown fox jumps over the lazy dog stopped",
      3L -> "and again and again and again and again and again",
      4L -> "completely unrelated words that never repeat anywhere in this corpus",
      5L -> "short doc")
    for (k <- Seq(4, 8))
      assert(gotSpans(k, docs: _*) == bruteSpans(k, docs: _*), s"K=$k")
  }

  test("context-id equality is exactly context equality (ladder invariant)") {
    // every rung: id_k[i] == id_k[j] iff min(k,rem)-prefix AND
    // truncation length agree — checked exhaustively on a corpus dense
    // with shared prefixes/suffixes of many lengths
    val docs = Seq[(Long, String)](
      1L -> "a b c d a b c d a b",
      2L -> "b c d a b c a b",
      3L -> "a b c d e f g",
      4L -> "a a a a a a")
    val byPos = docs.flatMap { case (id, t) =>
      val a = t.split(' '); a.indices.map(i => (id, i) -> a.drop(i).toSeq)
    }.toMap
    for ((k, ids) <- SuffixDedup.contextIdLadder(toks(docs: _*), 8)) {
      val got = ids.collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(4)).toMap
      def key(p: (Long, Int)) = { val s = byPos(p); (s.take(k), s.length.min(k)) }
      for (p <- got.keys; q <- got.keys)
        assert((got(p) == got(q)) == (key(p) == key(q)),
          s"k=$k $p vs $q: ids ${got(p)}/${got(q)} keys ${key(p)}/${key(q)}")
    }
  }

  test("the doubling ladder agrees with the xxhash64 fingerprint path") {
    // cross-check the two dedup constructions on the same corpus: any
    // difference is a hash collision (or a doubling bug)
    val docs = (1L to 20L).map { i =>
      val base = (1 to 12).map(j => s"w${(i * 7 + j) % 9}").mkString(" ")
      i -> s"doc $i says $base end"
    }
    val exact = gotSpans(8, docs: _*)
    // fingerprint twin, inline (the repeatedSpanTable shape)
    val grams = docs.toDF("doc_id", "text")
      .withColumn("a", split(col("text"), " "))
      .filter(size(col("a")) >= 8)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(a) - 8)," +
          " i -> xxhash64(concat_ws(' ', slice(a, i + 1, 8))))"))
        .as(Seq("pos", "h")))
    val dup = grams.groupBy("h").count().filter(col("count") >= 2).select("h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val hashSpans = grams.join(dup, Seq("h"), "left_semi")
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("s"), (max(col("pos")) + lit(7)).as("e"))
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).toSet
    assert(exact == hashSpans)
  }

  test("repeatedStarts counts only full-length positions and the tier ladder nests") {
    val phrase16 = (1 to 16).map(i => s"q$i").mkString(" ")
    val docs = Seq[(Long, String)](
      1L -> s"$phrase16 filler one two three",
      2L -> s"lead in $phrase16")
    val ladder = SuffixDedup.contextIdLadder(toks(docs: _*), 16).toMap
    val n8 = SuffixDedup.repeatedStarts(ladder(8), 8).count()
    val n16 = SuffixDedup.repeatedStarts(ladder(16), 16).count()
    // 16-token repeat => 9 repeated 8-gram starts per doc, 1 16-start
    assert(n8 == 18 && n16 == 2)
  }
}
