package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order clustering evidence harness (the measurable claim ZORDER BY
  * makes): writes `events` twice — linear-clustered on `ts` (the layout
  * a time-ordered ingest produces) and z-ordered on (ts, user_id) via
  * `Layout.zorderWriteRange` — builds the SAME ZoneMap sidecar on both
  * columns of both layouts, and reports files-selected for three
  * predicates: a ts window, a user band, and their conjunction.
  *
  * What the numbers must show: the linear layout prunes hard on ts and
  * NOT AT ALL on user (every file's user [min,max] spans the domain);
  * the z-ordered layout prunes on BOTH, and the conjunction multiplies
  * the skip rates — the trade being a milder ts-only prune than the
  * pure sort. Row parity between each pruned+filtered read and the
  * full-scan filter is asserted, not assumed (correctness gate inside
  * the harness). Prints ONE JSON line. Args: sfDir. Run at sf0.1 and
  * /tmp/sf1.
  */
object ZOrderScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.ZoneMap
    import graft.operators.Layout

    val ev = graft.catalog.Q.t(spark, sfDir, "events")
      .select("ts", "user_id", "event_type", "value")
    val base = java.nio.file.Files.createTempDirectory("graft-zos").toString
    val linDir = s"$base/linear"; val zDir = s"$base/zorder"

    ev.repartitionByRange(64, col("ts")).write.parquet(linDir)
    Layout.zorderWriteRange(ev, "ts", "user_id", zDir, nFiles = 64, bits = 8)
    ZoneMap.build(spark, linDir, Seq("ts", "user_id"))
    ZoneMap.build(spark, zDir, Seq("ts", "user_id"))

    // predicate bounds from the data: a ~1/3 ts window, a 1/8 user band
    val b = ev.agg(
      expr("min(unix_micros(ts))"), expr("max(unix_micros(ts))"),
      min("user_id"), max("user_id")).head()
    val (tsMn, tsMx, uMn, uMx) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    def tsAt(f: Double) = (tsMn + ((tsMx - tsMn) * f).toLong)
    def uAt(f: Double) = (uMn + ((uMx - uMn) * f).toLong)
    val (tLo, tHi) = (tsAt(0.30), tsAt(0.63))
    val (userLo, userHi) = (uAt(0.25), uAt(0.375))
    val tsLo = timestamp_micros(lit(tLo)); val tsHi = timestamp_micros(lit(tHi))

    val preds = Seq(
      "ts_window" -> Seq(("ts", Some(tsLo), Some(tsHi))),
      "user_band" -> Seq(("user_id", Some(lit(userLo)), Some(lit(userHi)))),
      "both" -> Seq(("ts", Some(tsLo), Some(tsHi)),
        ("user_id", Some(lit(userLo)), Some(lit(userHi)))))

    def measure(layout: String, dir: String): Seq[String] = {
      val full = spark.read.parquet(dir)
      preds.map { case (pname, ps) =>
        val filt = ps.map {
          case ("ts", _, _) => col("ts") >= tsLo && col("ts") < tsHi
          case _ => col("user_id") >= userLo && col("user_id") <= userHi
        }.reduce(_ && _)
        val pr = ZoneMap.pruneAll(spark, dir, ps)
        val got = pr.df.filter(filt).count()
        val want = full.filter(filt).count()
        require(got == want,
          s"$layout/$pname: pruned read lost rows ($got != $want)")
        s""""${layout}_$pname": {"files_total": ${pr.filesTotal}, "files_selected": ${pr.filesSelected}, "rows": $got}"""
      }
    }

    val cells = measure("linear", linDir) ++ measure("zorder", zDir)
    println(s"""{"metric": "zorder_prune", "sf_dir": "$sfDir", ${cells.mkString(", ")}}""")
    spark.stop()
  }
}
