package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scc

/** Directed SCC: hand-verified decompositions, the peel-hostile shapes
  * (decreasing-id cycles, chains, one-way bridges), and the
  * distributed-fixpoint vs local-Tarjan identity — two independent
  * algorithms that must emit the unique SCC partition. */
class SccSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(local: Boolean, edges: (Long, Long)*): Map[Long, Long] =
    Scc.strongComponents(edges.toDF("src", "dst"),
      localThreshold = if (local) 1L << 20 else 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def both(edges: (Long, Long)*): Map[Long, Long] = {
    val l = run(local = true, edges: _*)
    val d = run(local = false, edges: _*)
    assert(l == d, "local Tarjan and distributed fixpoint must agree")
    l
  }

  test("two cycles joined by a one-way bridge stay separate SCCs") {
    // 1->2->3->1 and 10->11->12->10 with bridge 3->10: reachability is
    // one-way, so two components labeled by their minima
    val got = both((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("a back edge merges the cycles into one SCC") {
    val got = both((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L), (12L, 2L))
    assert(got.values.toSet == Set(1L) && got.size == 6)
  }

  test("a pure chain is all singletons (trim territory)") {
    val got = both((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(got == (1L to 5L).map(n => n -> n).toMap)
  }

  test("decreasing-id cycle with decreasing tails (peel-hostile) resolves in one pass") {
    // ids DECREASE along edge direction — the shape where naive
    // min-coloring peels one node per round; trim eats the tails and
    // the cycle is one color whose containment settles everything
    val cycle = Seq((50L, 40L), (40L, 30L), (30L, 20L), (20L, 50L))
    val tails = Seq((100L, 90L), (90L, 80L), (80L, 50L), (20L, 9L), (9L, 8L))
    val got = both(cycle ++ tails: _*)
    val want = Map(50L -> 20L, 40L -> 20L, 30L -> 20L, 20L -> 20L,
      100L -> 100L, 90L -> 90L, 80L -> 80L, 9L -> 9L, 8L -> 8L)
    assert(got == want)
  }

  test("self-loops neither create nor destroy components") {
    val got = both((1L, 1L), (1L, 2L), (2L, 1L), (3L, 3L), (3L, 4L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
  }

  test("nested cycles sharing a node are one SCC") {
    // 1->2->3->1 and 3->4->5->3 share node 3
    val got = both((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L))
    assert(got.values.toSet == Set(1L) && got.size == 5)
  }

  test("condensation DAG of several SCCs peels fully (multi-peel path)") {
    // three 2-cycles in a directed line A -> B -> C plus dangling dust:
    // forces at least structure across peels in the distributed path
    val comps = Seq(
      (1L, 2L), (2L, 1L), // A
      (10L, 11L), (11L, 10L), // B
      (20L, 21L), (21L, 20L), // C
      (2L, 10L), (11L, 20L), // bridges
      (21L, 30L), (30L, 31L)) // dust tail
    val got = both(comps: _*)
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 31L))
  }

  test("random tournament-ish graph: distributed equals Tarjan") {
    // deterministic pseudo-random digraph dense enough for a giant SCC
    // plus fringe — the realistic shape, cross-checked across paths
    val edges = for {
      i <- 0L until 60L
      j <- Seq((i * 7 + 3) % 60, (i * 13 + 5) % 60, (i + 1) % 67)
      if i != j
    } yield (i, j)
    both(edges: _*)
  }
}
