package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EsEvent, EsState, IncrementalPipeline}

/** The value-weighted DGIM fold: batching invariance, the per-bit
  * error bound against an exact windowed recount, and state bounds. */
class EhSlidingSumSpec extends AnyFunSuite {

  private def drive(events: Seq[EsEvent], w: Long, k: Int,
      cuts: Seq[Int]): (EsState, Seq[Long]) = {
    var st = EsState(Long.MinValue, Map.empty)
    val ests = scala.collection.mutable.ArrayBuffer.empty[Long]
    var rest = events
    val sizes = cuts :+ Int.MaxValue
    sizes.foreach { c =>
      val (batch, tail) = rest.splitAt(c)
      if (batch.nonEmpty) {
        val (st1, out) = IncrementalPipeline.esStep(w, k)("g", st, batch)
        st = st1
        ests ++= out.map(_.est)
      }
      rest = tail
    }
    (st, ests.toSeq)
  }

  private def mkEvents(n: Int, seed: Long, vmax: Int): Seq[EsEvent] = {
    val rnd = new Random(seed)
    var ts = 0L
    (1 to n).map { i =>
      ts += 1 + rnd.nextInt(5)
      EsEvent("g", i.toLong, ts, rnd.nextInt(vmax + 1).toLong)
    }
  }

  test("batching invariance: any batch split yields identical estimates") {
    val events = mkEvents(1200, seed = 5L, vmax = 200)
    val (stW, estW) = drive(events, w = 300, k = 4, cuts = Seq.empty)
    val rnd = new Random(9L)
    for (_ <- 1 to 4) {
      val cuts = Seq.fill(5)(1 + rnd.nextInt(400))
      val (stS, estS) = drive(events, w = 300, k = 4, cuts = cuts)
      assert(estS == estW && stS == stW, s"cuts=$cuts")
    }
  }

  test("estimate within the per-bit DGIM bound of the exact windowed sum") {
    for (seed <- 1 to 5; k <- Seq(3, 6)) {
      val vmax = 500
      val events = mkEvents(2000, seed = seed.toLong, vmax = vmax)
      var st = EsState(Long.MinValue, Map.empty)
      events.foreach { e =>
        val (st1, out) = IncrementalPipeline.esStep(400L, k)("g", st, Seq(e))
        st = st1
        val exact = events.filter(x => x.seq <= e.seq &&
          x.ts > e.ts - 400L && x.ts <= e.ts).map(_.v).sum
        val est = out.head.est
        // each bit-stream errs by at most half its straddling bucket;
        // that bucket is <= ~(bit count)/(k-1), so weighted: relative
        // 1/(k-1) of the exact sum plus the absolute v_max/2 floor
        val bound = exact / (k - 1) + vmax
        assert(math.abs(est - exact) <= bound,
          s"seed=$seed k=$k seq=${e.seq} est=$est exact=$exact")
      }
      // state bound: <= (k+1) buckets per size class per set bit
      val nBuckets = st.perBit.valuesIterator.map(_.length).sum
      assert(nBuckets <= 9 * (k + 1) * 12,
        s"state blew up: $nBuckets buckets")
    }
  }

  test("empty window and zero values behave") {
    val events = Seq(EsEvent("g", 1, 10, 0L), EsEvent("g", 2, 11, 7L),
      EsEvent("g", 3, 1000, 3L))
    val (st, ests) = drive(events, w = 50, k = 3, cuts = Seq.empty)
    assert(ests.head == 0L) // only a zero arrival so far
    // at ts=1000 the ts=11 value has expired: estimate covers only v=3
    assert(ests.last == 3L)
    assert(st.lastSeq == 3L)
  }

  test("stale seqs are no-ops") {
    val events = mkEvents(50, seed = 2L, vmax = 20)
    val (st1, _) = drive(events, w = 100, k = 3, cuts = Seq.empty)
    val (st2, out2) = IncrementalPipeline.esStep(100L, 3)("g", st1, events.take(20))
    assert(st2 == st1 && out2.isEmpty)
  }
}
