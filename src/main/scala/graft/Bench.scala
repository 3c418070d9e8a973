package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failures are NOT swallowed into the timings
  * (round-1 verdict #5): each query records ok true/false, failed queries
  * are listed by name with their error, and the exit code is non-zero if
  * any query failed — a regression cannot hide inside a wall-time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries INT64 TIMESTAMP(NANOS); see graft.catalog.Q.t
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet footers, page cache) so the first
    // timed query doesn't absorb one-time startup cost.
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    // Per-query steady-state = min across ROUNDS full passes over the
    // catalog. This host shows bursty CPU steal that can make a contiguous
    // block of queries 10-50x slower in one pass and fine in the next;
    // interleaving whole rounds (rather than back-to-back reps) makes it
    // very unlikely the same query sits inside a burst every time. A query
    // counts as failed only if it fails in EVERY round.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "2").toInt.max(1)
    val qseq = SparkEntry.queries.toSeq
    def pass(): Seq[(String, Double, Option[String])] = qseq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val results = (1 to rounds).map(_ => pass()).transpose.map { runs =>
      val name = runs.head._1
      val ok = runs.filter(_._3.isEmpty)
      if (ok.nonEmpty) (name, ok.map(_._2).min, None)
      else (name, runs.map(_._2).min, runs.head._3)
    }
    // Truncate BEFORE escaping (a cut mid-pair would leave a dangling
    // backslash) and strip every control char, so the one JSON line stays
    // parseable no matter what the error message contains.
    def esc(s: String): String = s.take(200).flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => " "
      case c => c.toString
    }
    // `queries` stays name -> seconds (the driver's documented shape);
    // failure honesty lives in the extra `n_failed` / `failed` fields.
    val qs = results.map { case (k, v, _) => s"""\"$k\":$v""" }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(e)) => s"""\"$k\":\"${esc(e)}\"""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_failed":${results.count(_._3.nonEmpty)},"failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.nonEmpty)) sys.exit(1)
  }
}
