package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement harness (optimization guide §1): runs named catalog queries
  * once warm (sf0.001 sibling) and once timed, with a SparkListener that
  * attributes wall time to jobs vs driver-side gaps (planning, AQE
  * re-optimization, checkpoint bookkeeping). Per query prints:
  *   total_s, n_jobs, n_stages, n_tasks, job_s (sum of job wall), gap_s
  *   (wall not covered by any job = driver work), top 5 jobs by duration.
  *
  * Usage: `runMain graft.Profile q1 q2 ...` with SPARK_GRAFT_SF_DIR
  * (default sf0.1) and SPARK_GRAFT_CPUS (default 32).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir)
      Option(p.getParent).map(_.resolve("sf0.001").toString)
        .filter(w => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(w)))
        .getOrElse(sfDir)
    }

    final case class JobRec(id: Int, start: Long, var end: Long = -1L,
        var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    @volatile var collecting = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (collecting) jobs.put(js.jobId, JobRec(js.jobId, js.time))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (collecting) Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val sid = sc.stageInfo.stageId
          jobs.forEach { (_, j) => if (j.end < 0) { } }
          // attribute stage to the most recent unfinished job (local mode:
          // queries run sequentially, one job at a time)
          val open = jobs.values().toArray(Array.empty[JobRec])
            .filter(_.end < 0).sortBy(-_.start).headOption
          open.foreach { j => j.stages += 1; j.tasks += sc.stageInfo.numTasks }
          val _ = sid
        }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm: codegen + JIT on the tiny sibling SF
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
      jobs.clear(); collecting = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val totalS = (System.nanoTime() - t0) / 1e9
      collecting = false
      Thread.sleep(200) // let listener events drain
      val js = jobs.values().toArray(Array.empty[JobRec]).sortBy(_.start)
      val done = js.filter(_.end > 0)
      val jobS = done.map(j => (j.end - j.start) / 1e3).sum
      // gap: wall time not inside any job interval (sequential assumption)
      var gapMs = 0.0
      var prevEnd = -1L
      done.foreach { j =>
        if (prevEnd > 0 && j.start > prevEnd) gapMs += (j.start - prevEnd)
        prevEnd = math.max(prevEnd, j.end)
      }
      val top = done.sortBy(j => -(j.end - j.start)).take(5)
        .map(j => f"job${j.id}%d:${(j.end - j.start) / 1e3}%.2fs/${j.stages}%dst/${j.tasks}%dtk")
        .mkString(" ")
      println(f"PROFILE $name%-28s total=${totalS}%6.2fs jobs=${done.length}%3d " +
        f"stages=${done.map(_.stages).sum}%4d tasks=${done.map(_.tasks).sum}%5d " +
        f"job_s=${jobS}%6.2f gap_s=${gapMs / 1e3}%6.2f | $top")
    }
    spark.stop()
  }
}
