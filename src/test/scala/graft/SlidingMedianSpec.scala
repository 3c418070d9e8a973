package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{IncrementalPipeline, SmEvent, SmState}

/** The two-heap lazy-deletion median fold: equality with brute-force
  * sorted-window medians at every arrival (both parities), batching
  * invariance, the multiset state floor, staleness, W > 0. */
class SlidingMedianSpec extends AnyFunSuite {

  private def drive(events: Seq[SmEvent], w: Long,
      cuts: Seq[Int]): (SmState, Seq[(Long, Int)]) = {
    var st = SmState(Long.MinValue, Nil)
    val outs = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var rest = events
    (cuts :+ Int.MaxValue).foreach { c =>
      val (batch, tail) = rest.splitAt(c)
      if (batch.nonEmpty) {
        val (st1, out) = IncrementalPipeline.smStep(w)("g", st, batch)
        st = st1
        outs ++= out.map(o => (o.med2, o.n_window))
      }
      rest = tail
    }
    (st, outs.toSeq)
  }

  private def mkEvents(n: Int, card: Int, seed: Long): Seq[SmEvent] = {
    val rnd = new Random(seed)
    var ts = 0L
    (1 to n).map { i =>
      ts += 1 + rnd.nextInt(5)
      SmEvent("g", i.toLong, ts, rnd.nextInt(card) - card / 2L)
    }
  }

  private def bruteMed2(win: Seq[Long]): Long = {
    val s = win.sorted
    val n = s.length
    if (n % 2 == 1) 2L * s(n / 2) else s(n / 2 - 1) + s(n / 2)
  }

  test("exactly equals brute-force sorted-window medians at every arrival") {
    for (seed <- 1 to 5; w <- Seq(13L, 200L); card <- Seq(9, 4000)) {
      val events = mkEvents(1200, card, seed.toLong)
      val (_, got) = drive(events, w, cuts = Seq.empty)
      events.zipWithIndex.foreach { case (e, i) =>
        val win = events.take(i + 1).filter(x => x.ts > e.ts - w).map(_.v)
        assert(got(i) == ((bruteMed2(win), win.length)),
          s"seed=$seed w=$w card=$card seq=${e.seq}")
      }
    }
  }

  test("batching invariance: any split yields identical outputs and state") {
    val events = mkEvents(900, 50, 11L)
    val whole = drive(events, 90L, Seq.empty)
    val rnd = new Random(3L)
    for (_ <- 1 to 4) {
      val cuts = Seq.fill(6)(1 + rnd.nextInt(250))
      assert(drive(events, 90L, cuts) == whole, s"cuts=$cuts")
    }
  }

  test("persisted state is exactly the window multiset, ts-ordered") {
    val events = mkEvents(3000, 30, 42L)
    val (st, _) = drive(events, 60L, Seq(700, 700, 700))
    val last = events.last
    val alive = events.filter(x => x.ts > last.ts - 60L).map(x => (x.ts, x.v))
    assert(st.entries.map(e => (e.ts, e.v)) == alive) // every occurrence
  }

  test("odd and even parities both exact on a hand-built series") {
    // w=100 keeps everything alive: windows grow 1,2,3,4
    val events = Seq(
      SmEvent("g", 1L, 1L, 10L), // {10} -> med2 20
      SmEvent("g", 2L, 2L, 2L),  // {2,10} -> 12
      SmEvent("g", 3L, 3L, 6L),  // {2,6,10} -> 12
      SmEvent("g", 4L, 4L, 4L))  // {2,4,6,10} -> 10
    val (_, got) = drive(events, 100L, Seq.empty)
    assert(got.map(_._1) == Seq(20L, 12L, 12L, 10L))
  }

  test("stale and replayed seqs are ignored") {
    val events = mkEvents(200, 12, 7L)
    val (st1, _) = IncrementalPipeline.smStep(40L)("g",
      SmState(Long.MinValue, Nil), events)
    val (st2, out2) = IncrementalPipeline.smStep(40L)("g", st1,
      events.takeRight(50))
    assert(out2.isEmpty && st2 == st1)
  }

  test("rejects a non-positive window") {
    intercept[IllegalArgumentException] {
      IncrementalPipeline.smStep(0L)("g", SmState(Long.MinValue, Nil),
        Seq(SmEvent("g", 1L, 1L, 1L)))
    }
  }
}
