package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Components, GraphAlgos, Lineage}

/** The reliable-checkpoint knob (round-7 verdict #4): with a checkpoint
  * dir configured, iterative operators cut lineage via durable
  * `checkpoint()` — blocks survive executor loss — and the result plan
  * genuinely no longer references the input scan. Without one they fall
  * back to `localCheckpoint()`. Same rows either way.
  */
class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edgesFromParquet() =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .limit(500)
      .select(col("l_partkey").as("u"), col("l_suppkey").as("v"))

  test("Lineage.cut is local without a dir, reliable (and on disk) with one") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "test assumes no ambient checkpoint dir")
    val df = Seq((1, 2)).toDF("a", "b")
    val local = Lineage.cut(df)
    assert(local.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    sc.setCheckpointDir(dir)
    try {
      Lineage.cut(df).count()
      // reliable mode actually persisted blocks under the configured dir
      def filesUnder(f: java.io.File): Long =
        if (f.isFile) 1L
        else Option(f.listFiles).map(_.map(filesUnder).sum).getOrElse(0L)
      assert(filesUnder(new java.io.File(dir)) > 0,
        "reliable checkpoint wrote nothing under the checkpoint dir")
    } finally sc.setCheckpointDir(null)
    assert(sc.getCheckpointDir.isEmpty)
  }

  test("iterative operators under reliable mode: lineage cut, rows identical") {
    val sc = spark.sparkContext
    val edges = edgesFromParquet()
    // baseline rows under the default local mode; localThreshold = 0
    // forces the distributed loop so the per-round cut is exercised
    val want = Components.connectedComponents(edges, "u", "v", localThreshold = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    sc.setCheckpointDir(dir)
    val got =
      try {
        val comps = Components.connectedComponents(edges, "u", "v", localThreshold = 0)
        // the returned frame's lineage must be CUT: its plan may not
        // reach back to the parquet scan (an executor replaying it
        // would need exactly that lineage — the thing reliable
        // checkpointing removes the dependence on)
        val plan = comps.queryExecution.optimizedPlan.toString
        assert(!plan.toLowerCase.contains("parquet"),
          s"reliable-mode result still references the input scan:\n$plan")
        comps.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally sc.setCheckpointDir(null)
    assert(got == want)
    // spot-check a second operator family under the same knob
    sc.setCheckpointDir(dir)
    try {
      val core = GraphAlgos.kCore(edges, k = 2)
      assert(!core.queryExecution.optimizedPlan.toString.toLowerCase.contains("parquet"))
      assert(core.count() > 0)
    } finally sc.setCheckpointDir(null)
  }

  test("RoundGc bounds reliable-checkpoint storage: dirs do not grow with iters") {
    // Round-8 advice (medium): without per-round GC every iteration
    // leaves a durable dataset copy under the checkpoint dir for the
    // job's whole lifetime (Spark only reclaims them after JVM GC with
    // the cleaner flag on). The loops now delete generation r-1 once
    // generation r is materialized — so the number of rdd-* checkpoint
    // dirs at the end is CONSTANT in the iteration count, while the
    // returned frame (kept generation) still collects correctly.
    val sc = spark.sparkContext
    val edges = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst").withColumn("weight", lit(1.0))
    def rddDirsUnder(root: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles).map(_.toSeq.flatMap(c => c +: walk(c))).getOrElse(Nil)
      walk(new java.io.File(root)).count(f =>
        f.isDirectory && f.getName.startsWith("rdd-"))
    }
    val want = GraphAlgos.pageRank(edges, iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def runWithDir(iters: Int): (Int, Map[Long, Double]) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-gc").toString
      sc.setCheckpointDir(dir)
      try {
        val got = GraphAlgos.pageRank(edges, iters = iters, localThreshold = 0)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        (rddDirsUnder(dir), got)
      } finally sc.setCheckpointDir(null)
    }
    val (dirs3, _) = runWithDir(3)
    val (dirs12, got12) = runWithDir(12)
    // identical footprint at 3 and 12 iterations = per-round copies die
    assert(dirs12 == dirs3,
      s"checkpoint dirs grew with iteration count: $dirs3 at 3 iters, $dirs12 at 12")
    // and the kept generation still backs the returned frame
    assert(got12.keySet == want.keySet)
    want.foreach { case (k, v) => assert(math.abs(got12(k) - v) < 1e-12) }
  }
}
