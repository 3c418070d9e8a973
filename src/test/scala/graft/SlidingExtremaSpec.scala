package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{IncrementalPipeline, SxEvent, SxState}

/** The monotonic-deque extrema fold: EXACT equality with brute-force
  * window recomputes at every arrival, batching invariance, state
  * bounds, staleness. */
class SlidingExtremaSpec extends AnyFunSuite {

  private def drive(events: Seq[SxEvent], w: Long,
      cuts: Seq[Int]): (SxState, Seq[(Long, Long)]) = {
    var st = SxState(Long.MinValue, Nil, Nil)
    val outs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var rest = events
    (cuts :+ Int.MaxValue).foreach { c =>
      val (batch, tail) = rest.splitAt(c)
      if (batch.nonEmpty) {
        val (st1, out) = IncrementalPipeline.sxStep(w)("g", st, batch)
        st = st1
        outs ++= out.map(o => (o.win_max, o.win_min))
      }
      rest = tail
    }
    (st, outs.toSeq)
  }

  private def mkEvents(n: Int, seed: Long): Seq[SxEvent] = {
    val rnd = new Random(seed)
    var ts = 0L
    (1 to n).map { i =>
      ts += 1 + rnd.nextInt(7)
      SxEvent("g", i.toLong, ts, rnd.nextInt(2000) - 1000L)
    }
  }

  test("exactly equals brute-force window extrema at every arrival") {
    for (seed <- 1 to 5; w <- Seq(17L, 250L)) {
      val events = mkEvents(1500, seed.toLong)
      val (_, got) = drive(events, w, cuts = Seq.empty)
      events.zipWithIndex.foreach { case (e, i) =>
        val win = events.take(i + 1).filter(x => x.ts > e.ts - w).map(_.v)
        assert(got(i) == ((win.max, win.min)),
          s"seed=$seed w=$w at seq=${e.seq}")
      }
    }
  }

  test("batching invariance: any split yields identical outputs") {
    val events = mkEvents(1000, 11L)
    val whole = drive(events, 100L, Seq.empty)
    val rnd = new Random(3L)
    for (_ <- 1 to 4) {
      val cuts = Seq.fill(6)(1 + rnd.nextInt(300))
      assert(drive(events, 100L, cuts) == whole, s"cuts=$cuts")
    }
  }

  test("state stays at the prefix-extrema count, not the window size") {
    // random data: expected deque size ~ O(log W), far under W
    val events = mkEvents(5000, 42L)
    val (st, _) = drive(events, 1000L, Seq.empty)
    assert(st.maxDq.length + st.minDq.length < 80,
      s"deques ${st.maxDq.length}+${st.minDq.length}")
    // monotone increasing stream = the stated worst case for the MIN
    // deque (older smaller values are never dominated); each arrival
    // dominates everything for max, so the max deque stays a singleton
    val mono = (1 to 300).map(i => SxEvent("g", i.toLong, i.toLong, i.toLong))
    val (st2, got2) = drive(mono, 100L, Seq.empty)
    assert(st2.minDq.length > 50) // holds ~the whole window
    assert(st2.maxDq.length == 1)
    assert(got2.last == ((300L, 201L)))
  }

  test("ties keep the newest entry; stale seqs are no-ops") {
    val ties = Seq(SxEvent("g", 1, 1, 5L), SxEvent("g", 2, 2, 5L),
      SxEvent("g", 3, 3, 5L))
    val (st, got) = drive(ties, 100L, Seq.empty)
    assert(got.forall(_ == ((5L, 5L))))
    assert(st.maxDq.length == 1 && st.minDq.length == 1)
    val (st2, out2) = IncrementalPipeline.sxStep(100L)("g", st, ties)
    assert(st2 == st && out2.isEmpty)
  }
}
