package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Attribution

/** Markov removal-effect attribution (operators/Attribution) — pinned
  * on hand-built journeys where the chain is computable by inspection:
  * transition counting (cut at first purchase, terminal NULL), the
  * removal semantics (redirect, not renormalize), and the bottleneck
  * property (a channel on EVERY converting path owns the whole
  * conversion probability). */
class AttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Int, String)*) =
    rows.map { case (u, i, t) =>
      (u, java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$i%02d"), i.toLong, t)
    }.toDF("user_id", "ts", "event_id", "event_type")

  private def attrib(df: org.apache.spark.sql.DataFrame) =
    Attribution.markovAttribution(df, iters = 24)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("bottleneck channel owns the conversion; absent channel gets zero") {
    // every converting journey passes through 'click'; 'signup' never
    // occurs. user 1: view->click->purchase; user 2: click->purchase;
    // user 3: view->error (no conversion).
    val df = ev(
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
      (2L, 1, "click"), (2L, 2, "purchase"),
      (3L, 1, "view"), (3L, 2, "error"))
    val a = attrib(df)
    val base = a("click")._1
    assert(base > 0)
    // removing click: no path reaches CONV at all
    assert(a("click")._2 == 0L)
    assert(a("click")._3 == base, "click's removal effect = whole base")
    // signup never appears: removal changes nothing
    assert(a("signup")._2 == base)
    assert(a("signup")._3 == 0L && a("signup")._4 == 0L)
  }

  test("journeys cut at the FIRST purchase; post-purchase events are ignored") {
    // user 1 purchases then errors around afterwards: the error state
    // must receive no transitions, so removing it changes nothing.
    val df = ev(
      (1L, 1, "click"), (1L, 2, "purchase"), (1L, 3, "error"),
      (1L, 4, "error"),
      (2L, 1, "click"), (2L, 2, "purchase"))
    val a = attrib(df)
    assert(a("error")._3 == 0L, "post-purchase error must carry no credit")
    assert(a("click")._1 == 1000000L, "every journey converts via click")
  }

  test("removal redirects to NULL (no renormalization)") {
    // user 1: view->purchase. user 2: view->click->purchase.
    // Removing click: user 2's mass at view that went to click now
    // dies; view->purchase mass survives. conv_base = 1.0; removing
    // click must land strictly between 0 and base.
    val df = ev(
      (1L, 1, "view"), (1L, 2, "purchase"),
      (2L, 1, "view"), (2L, 2, "click"), (2L, 3, "purchase"))
    val a = attrib(df)
    assert(a("view")._2 == 0L) // view starts every journey: bottleneck
    val clickRemoved = a("click")._2
    assert(clickRemoved > 0L && clickRemoved < a("click")._1)
  }

  test("shares sum to ~1e6 when any effect exists and are partition-invariant") {
    val rnd = new scala.util.Random(3)
    val types = Array("view", "click", "signup", "error", "purchase")
    val rows = for (u <- 1L to 40L; i <- 1 to 8) yield
      (u, i, types(rnd.nextInt(types.length)))
    val df = ev(rows: _*)
    val a = attrib(df)
    val shareSum = a.values.map(_._4).sum
    assert(shareSum >= 999990L && shareSum <= 1000000L,
      s"floored shares must sum to just under 1e6, got $shareSum")
    val b = attrib(df.repartition(13))
    assert(a == b)
  }
}
