package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** FastSS deletion-neighborhood blocking + levenshtein verify: the
  * final pair set must equal brute-force all-pairs edit distance <= 2,
  * including the false-candidate and near-miss traps. */
class EditDistancePairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(ws: Seq[String]): Set[(String, String, Int)] =
    (for {
      a <- ws; b <- ws if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d)).toSet

  private def got(ws: Seq[String]): Set[(String, String, Int)] =
    Dedup.editDistancePairs(ws.toDF("w")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("pair set equals brute-force all-pairs on a trap-rich vocabulary") {
    val ws = Seq(
      "cat", "car", "cart", "carts", "cast", "cost", "coast",
      "ab", "ba", "abc", "bca", "a", "b", "abcd",
      "kitten", "sitten", "sitting", "mitten", "mittens",
      "hello", "hallo", "hell", "help", "yellow",
      "xyzzy", "unrelated")
    assert(got(ws) == brute(ws))
  }

  test("rotation-shaped pairs land exactly where levenshtein puts them") {
    // 'ab'/'ba' -> ed 2 (two substitutions); 'abc'/'bca' -> ed 2 too
    // (delete front 'a', append 'a') — both must appear WITH the
    // distance levenshtein assigns, matching brute force exactly
    val ws = Seq("ab", "ba", "abc", "bca")
    val g = got(ws)
    assert(g.contains(("ab", "ba", 2)) && g.contains(("abc", "bca", 2)))
    assert(g == brute(ws))
  }

  test("distance >= 3 vocabularies produce no pairs at all") {
    val ws = Seq("aaaa", "bbbb", "cccc", "dddd")
    assert(brute(ws).isEmpty && got(ws).isEmpty)
  }

  test("single-char and empty-variant words behave (all short words pair)") {
    val ws = Seq("a", "b", "ab", "xy", "x")
    assert(got(ws) == brute(ws))
  }
}
