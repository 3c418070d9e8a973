package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{IncrementalPipeline, MoEvent, MoState}

/** The count-bucket mode fold: equality with brute-force window mode
  * (highest count, smallest value) at every arrival, batching
  * invariance, the multiset state floor, staleness, W > 0. */
class SlidingModeSpec extends AnyFunSuite {

  private def drive(events: Seq[MoEvent], w: Long,
      cuts: Seq[Int]): (MoState, Seq[(Long, Long, Int)]) = {
    var st = MoState(Long.MinValue, Nil)
    val outs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    var rest = events
    (cuts :+ Int.MaxValue).foreach { c =>
      val (batch, tail) = rest.splitAt(c)
      if (batch.nonEmpty) {
        val (st1, out) = IncrementalPipeline.moStep(w)("g", st, batch)
        st = st1
        outs ++= out.map(o => (o.mode, o.mode_count, o.n_window))
      }
      rest = tail
    }
    (st, outs.toSeq)
  }

  private def mkEvents(n: Int, card: Int, seed: Long): Seq[MoEvent] = {
    val rnd = new Random(seed)
    var ts = 0L
    (1 to n).map { i =>
      ts += 1 + rnd.nextInt(5)
      MoEvent("g", i.toLong, ts, rnd.nextInt(card).toLong)
    }
  }

  private def bruteMode(win: Seq[Long]): (Long, Long) = {
    val byV = win.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val mc = byV.values.max
    (byV.filter(_._2 == mc).keys.min, mc)
  }

  test("exactly equals brute-force window mode at every arrival") {
    for (seed <- 1 to 5; w <- Seq(13L, 200L); card <- Seq(4, 60)) {
      val events = mkEvents(1200, card, seed.toLong)
      val (_, got) = drive(events, w, cuts = Seq.empty)
      events.zipWithIndex.foreach { case (e, i) =>
        val win = events.take(i + 1).filter(x => x.ts > e.ts - w).map(_.v)
        val (bm, bc) = bruteMode(win)
        assert(got(i) == ((bm, bc, win.length)),
          s"seed=$seed w=$w card=$card seq=${e.seq}")
      }
    }
  }

  test("batching invariance: any split yields identical outputs and state") {
    val events = mkEvents(900, 8, 11L)
    val whole = drive(events, 90L, Seq.empty)
    val rnd = new Random(3L)
    for (_ <- 1 to 4) {
      val cuts = Seq.fill(6)(1 + rnd.nextInt(250))
      assert(drive(events, 90L, cuts) == whole, s"cuts=$cuts")
    }
  }

  test("persisted state is exactly the window multiset, ts-ordered") {
    val events = mkEvents(3000, 10, 42L)
    val (st, _) = drive(events, 60L, Seq(700, 700, 700))
    val last = events.last
    val alive = events.filter(x => x.ts > last.ts - 60L).map(x => (x.ts, x.v))
    assert(st.entries.map(e => (e.ts, e.v)) == alive)
  }

  test("tie-break: smallest value among maximal counts, expiry flips it") {
    val events = Seq(
      MoEvent("g", 1L, 1L, 9L),  // {9} -> (9,1)
      MoEvent("g", 2L, 2L, 3L),  // {9,3} tie -> (3,1)
      MoEvent("g", 3L, 3L, 9L),  // {9x2,3} -> (9,2)
      MoEvent("g", 4L, 60L, 3L)) // 9s at ts 1,3 expire (w=50): {3x2}... ts=3 alive? 3 > 60-50=10? no -> {3,3}? ts2=2 expired too -> {3@60} -> (3,1)
    val (_, got) = drive(events, 50L, Seq.empty)
    assert(got == Seq((9L, 1L, 1), (3L, 1L, 2), (9L, 2L, 3), (3L, 1L, 1)))
  }

  test("stale and replayed seqs are ignored") {
    val events = mkEvents(200, 6, 7L)
    val (st1, _) = IncrementalPipeline.moStep(40L)("g",
      MoState(Long.MinValue, Nil), events)
    val (st2, out2) = IncrementalPipeline.moStep(40L)("g", st1,
      events.takeRight(50))
    assert(out2.isEmpty && st2 == st1)
  }

  test("rejects a non-positive window") {
    intercept[IllegalArgumentException] {
      IncrementalPipeline.moStep(0L)("g", MoState(Long.MinValue, Nil),
        Seq(MoEvent("g", 1L, 1L, 1L)))
    }
  }
}
