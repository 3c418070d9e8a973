package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{DtEvent, DtState, IncrementalPipeline}

/** The decayed heavy-hitter fold: batching invariance (pure function of
  * the event prefix), the undercount-only error bound against an exact
  * floor-decayed recount, and the decay behavior itself (an early flood
  * ages out; plain Misra-Gries would keep it forever). */
class DecayTopkSpec extends AnyFunSuite {

  private def drive(events: Seq[DtEvent], k: Int, h: Long,
      cuts: Seq[Int]): DtState = {
    var st = DtState(Long.MinValue, 0L, Nil)
    var rest = events
    val sizes = cuts :+ Int.MaxValue
    sizes.foreach { c =>
      val (batch, tail) = rest.splitAt(c)
      if (batch.nonEmpty) {
        val (st1, _) = IncrementalPipeline.dtStep(k, h)("g", st, batch)
        st = st1
      }
      rest = tail
    }
    st
  }

  /** Exact decayed recount with the identical floor-halving epochs but
    * UNBOUNDED counters — the reference the sketch may only undercount. */
  private def exactDecayed(events: Seq[DtEvent], h: Long): Map[String, Long] = {
    val c = scala.collection.mutable.HashMap.empty[String, Long]
    var m = 0L
    events.sortBy(_.seq).foreach { e =>
      c.update(e.item, c.getOrElse(e.item, 0L) + 1)
      m += 1
      if (m % h == 0) {
        c.keys.toSeq.foreach { key =>
          val v = c(key) / 2
          if (v == 0L) c.remove(key) else c.update(key, v)
        }
      }
    }
    c.toMap
  }

  private def mkEvents(n: Int, seed: Long, vocab: Int): Seq[DtEvent] = {
    val rnd = new Random(seed)
    (1 to n).map { i =>
      // zipf-ish skew: low ids much more frequent
      val z = math.min(vocab - 1, (math.abs(rnd.nextGaussian()) * vocab / 4).toInt)
      DtEvent("g", i.toLong, s"w$z")
    }
  }

  test("batching invariance: any batch split yields the same state") {
    val events = mkEvents(5000, seed = 7L, vocab = 40)
    val whole = drive(events, k = 10, h = 512, cuts = Seq.empty)
    val rnd = new Random(3L)
    for (_ <- 1 to 5) {
      val cuts = Seq.fill(6)(1 + rnd.nextInt(1500))
      val split = drive(events, k = 10, h = 512, cuts = cuts)
      assert(split == whole, s"cuts=$cuts")
    }
  }

  test("undercount-only, within 4h/k + 2 of the exact decayed recount") {
    for (seed <- 1 to 6) {
      val k = 8
      val h = 256L
      val events = mkEvents(8000, seed = seed.toLong, vocab = 30)
      val st = drive(events, k, h, cuts = Seq(777, 1234, 2100))
      val exact = exactDecayed(events, h)
      val sketch = st.counters.toMap
      val bound = 4 * h / k + 2
      sketch.foreach { case (item, c) =>
        val ex = exact.getOrElse(item, 0L)
        assert(c <= ex, s"seed=$seed overcount $item: sketch=$c exact=$ex")
        assert(ex - c <= bound, s"seed=$seed $item: exact=$ex sketch=$c")
      }
      // superset guarantee: anything decaying above the bound is tracked
      exact.foreach { case (item, ex) =>
        if (ex > bound)
          assert(sketch.contains(item), s"seed=$seed missing heavy $item ex=$ex")
      }
    }
  }

  test("an early flood ages out; the current trend takes over") {
    val flood = (1 to 3000).map(i => DtEvent("g", i.toLong, "old_flood"))
    val trend = (3001 to 3600).map(i =>
      DtEvent("g", i.toLong, if (i % 3 == 0) "new_trend" else s"noise${i % 7}"))
    val st = drive(flood ++ trend, k = 6, h = 100, cuts = Seq(500, 1500))
    val counts = st.counters.toMap
    // 600 post-flood events = 6 halvings; 3000/2^6 < 47 vs trend ~66
    assert(counts.getOrElse("new_trend", 0L) > counts.getOrElse("old_flood", 0L),
      s"counters=${st.counters}")
  }

  test("stale and duplicate seqs are no-ops; empty batch emits nothing") {
    val events = mkEvents(100, seed = 1L, vocab = 5)
    val st1 = drive(events, k = 5, h = 50, cuts = Seq.empty)
    val (st2, out2) = IncrementalPipeline.dtStep(5, 50)("g", st1, events.take(40))
    assert(st2 == st1 && out2.isEmpty)
  }
}
