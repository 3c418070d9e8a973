package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Components

/** Connected components: chains (multi-hop merging), merging clusters,
  * isolated handling, and convergence inside the iteration cap. */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def comps(edges: (Long, Long)*): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a long chain collapses to the min id (multi-hop propagation)") {
    // 0-1-2-...-9 as a path: every node must reach label 0, which takes
    // several hops — the pointer-jumping acceleration is what keeps the
    // round count logarithmic.
    val got = comps((0L until 9L).map(i => (i, i + 1)): _*)
    assert(got == (0L to 9L).map(_ -> 0L).toMap)
  }

  test("two clusters bridged by one edge merge; separate ones do not") {
    // {1,2,3} and {10,11,12} plus bridge 3-10 -> one component labeled 1;
    // {20,21} stays its own component labeled 20.
    val got = comps((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (3L, 10L), (20L, 21L))
    assert(Seq(1L, 2L, 3L, 10L, 11L, 12L).forall(got(_) == 1L))
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got.size == 8)
  }

  test("star graph and self-contained pairs converge in few rounds") {
    val star = (1L to 6L).map(i => (100L, i))
    val got = comps(star ++ Seq((200L, 201L)): _*)
    assert((1L to 6L).forall(got(_) == 1L) && got(100L) == 1L)
    assert(got(200L) == 200L && got(201L) == 200L)
  }

  test("duplicate and reversed edges do not change the result") {
    val got = comps((5L, 6L), (6L, 5L), (5L, 6L), (6L, 7L))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("probing convergence every second round issues measurably fewer jobs") {
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val sc = spark.sparkContext
    def jobsIn(group: String)(body: => Map[Long, Long]): (Int, Map[Long, Long]) = {
      sc.setJobGroup(group, group)
      val r = try body finally sc.clearJobGroup()
      (sc.statusTracker.getJobIdsForGroup(group).length, r)
    }
    def labels(checkEvery: Int): Map[Long, Long] =
      // localThreshold = 0: force the distributed loop — this test counts
      // ITS jobs, and the size gate would route a 10-edge graph local.
      Components.connectedComponents(edges, "a", "b", checkEvery = checkEvery,
          localThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (jobsEveryRound, everyRound) = jobsIn("cc-probe-every")(labels(1))
    val (jobsEveryOther, everyOther) = jobsIn("cc-probe-other")(labels(2))
    assert(everyRound == everyOther) // identical fixpoint either way
    assert(jobsEveryOther < jobsEveryRound,
      s"expected fewer jobs with sparse probing: $jobsEveryOther vs $jobsEveryRound")
  }

  test("size-gated local union-find is row-identical to the distributed loop") {
    // chains, a merged star, singleton pair — on a randomized-ish mix the
    // local path (default gate) and the forced distributed loop must
    // agree exactly.
    val edges = ((0L until 9L).map(i => (i, i + 1)) ++
      Seq((20L, 25L), (21L, 25L), (22L, 25L), (25L, 9L), (40L, 41L))).toDF("a", "b")
    def run(threshold: Long): Map[Long, Long] =
      Components.connectedComponents(edges, "a", "b", localThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = run(1L << 20)
    val distributed = run(0L)
    assert(local == distributed)
    assert(local(25L) == 0L && local(41L) == 40L) // star merged through 9-25 bridge
  }

  test("output id type matches the input on BOTH sides of the size gate") {
    // IntegerType edges: the local path collects as longs internally but
    // must hand back the input type, or the schema would flip with data
    // volume (advice r4 #1).
    val edges = Seq((1, 2), (2, 3), (10, 11)).toDF("a", "b")
    val local = Components.connectedComponents(edges, "a", "b", localThreshold = 1L << 20)
    val dist = Components.connectedComponents(edges, "a", "b", localThreshold = 0L)
    assert(local.schema.map(_.dataType) == dist.schema.map(_.dataType))
    assert(local.schema.forall(_.dataType ==
      org.apache.spark.sql.types.IntegerType))
    assert(local.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap ==
      dist.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap)
  }

  test("keepCanonical keeps one doc per cluster and every singleton") {
    // corpus 0..9; near-dup clusters {1,2,3} (a chain) and {7,8};
    // survivors must be the cluster minima plus all untouched docs.
    val docs = (0L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val kept = graft.operators.Dedup.keepCanonical(docs, pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 4L, 5L, 6L, 7L, 9L))
  }
}
