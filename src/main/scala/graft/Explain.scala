package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints `explain("formatted")` for selected catalog
  * queries so scan pruning (PushedFilters/ReadSchema), join strategies
  * (BroadcastHashJoin vs SortMergeJoin) and WholeStageCodegen spans can be
  * inspected and recorded in SCALE.md.
  *
  * Usage: `runMain graft.Explain [queryName ...]` (default: a spread of
  * representative shapes) with SPARK_GRAFT_SF_DIR (default sf0.01).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s1_scan_prune", "j2_broadcast_dim", "j1_orders_per_nation",
        "o2_topk_customers", "q1_pricing_summary", "v_lsh_ann")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
