package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{IncrementalPipeline, SdEvent, SdState}

/** The exact sliding-window DISTINCT fold: equality with brute-force
  * window recomputes at every arrival, batching invariance, the
  * state-floor claim (persisted entries == distinct values alive, no
  * stale markers), staleness, re-arrival resurrection. */
class SlidingDistinctSpec extends AnyFunSuite {

  private def drive(events: Seq[SdEvent], w: Long,
      cuts: Seq[Int]): (SdState, Seq[Long]) = {
    var st = SdState(Long.MinValue, Nil)
    val outs = scala.collection.mutable.ArrayBuffer.empty[Long]
    var rest = events
    (cuts :+ Int.MaxValue).foreach { c =>
      val (batch, tail) = rest.splitAt(c)
      if (batch.nonEmpty) {
        val (st1, out) = IncrementalPipeline.sdStep(w)("g", st, batch)
        st = st1
        outs ++= out.map(_.win_distinct)
      }
      rest = tail
    }
    (st, outs.toSeq)
  }

  private def mkEvents(n: Int, card: Int, seed: Long): Seq[SdEvent] = {
    val rnd = new Random(seed)
    var ts = 0L
    (1 to n).map { i =>
      ts += 1 + rnd.nextInt(5)
      SdEvent("g", i.toLong, ts, rnd.nextInt(card).toLong)
    }
  }

  test("exactly equals brute-force window distinct at every arrival") {
    for (seed <- 1 to 5; w <- Seq(13L, 200L); card <- Seq(7, 500)) {
      val events = mkEvents(1200, card, seed.toLong)
      val (_, got) = drive(events, w, cuts = Seq.empty)
      events.zipWithIndex.foreach { case (e, i) =>
        val want = events.take(i + 1)
          .filter(x => x.ts > e.ts - w).map(_.v).distinct.length.toLong
        assert(got(i) == want, s"seed=$seed w=$w card=$card seq=${e.seq}")
      }
    }
  }

  test("batching invariance: any split yields identical outputs and state") {
    val events = mkEvents(900, 40, 11L)
    val whole = drive(events, 90L, Seq.empty)
    val rnd = new Random(3L)
    for (_ <- 1 to 4) {
      val cuts = Seq.fill(6)(1 + rnd.nextInt(250))
      assert(drive(events, 90L, cuts) == whole, s"cuts=$cuts")
    }
  }

  test("persisted state is exactly the distinct-alive floor") {
    val events = mkEvents(3000, 25, 42L)
    val (st, _) = drive(events, 60L, Seq(700, 700, 700))
    val last = events.last
    val alive = events.filter(x => x.ts > last.ts - 60L)
      .groupBy(_.v).map { case (v, es) => (v, es.map(_.ts).max) }
    assert(st.entries.map(e => (e.v, e.ts)).toMap == alive)
    assert(st.entries.length == alive.size) // no stale markers persisted
    assert(st.entries == st.entries.sortBy(e => (e.ts, e.v))) // ts-ascending
  }

  test("re-arrival resurrects a value for a full window") {
    val events = Seq(
      SdEvent("g", 1L, 10L, 7L),
      SdEvent("g", 2L, 100L, 8L), // 7 expired (w=50)
      SdEvent("g", 3L, 110L, 7L), // 7 back
      SdEvent("g", 4L, 149L, 9L)) // 7 and 8 still alive (strict edge)
    val (_, got) = drive(events, 50L, Seq.empty)
    assert(got == Seq(1L, 1L, 2L, 3L))
  }

  test("stale and replayed seqs are ignored") {
    val events = mkEvents(200, 10, 7L)
    val whole = drive(events, 40L, Seq.empty)
    val (st1, out1) = IncrementalPipeline.sdStep(40L)("g",
      SdState(Long.MinValue, Nil), events)
    // replay the tail: nothing emits, state unchanged
    val (st2, out2) = IncrementalPipeline.sdStep(40L)("g", st1,
      events.takeRight(50))
    assert(out2.isEmpty && st2 == st1 && out1.map(_.win_distinct) == whole._2)
  }

  test("rejects a non-positive window") {
    intercept[IllegalArgumentException] {
      IncrementalPipeline.sdStep(0L)("g", SdState(Long.MinValue, Nil),
        Seq(SdEvent("g", 1L, 1L, 1L)))
    }
  }
}
