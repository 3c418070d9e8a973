package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Triangle broadcast-gate crossover harness (round-10 verdict #6):
  * `GraphAlgos.trianglesPerNode` probes the quadratic wedge stream
  * against a BROADCAST of the edge set while the deduped edge count is
  * under `broadcastEdgeLimit` (default 2M rows), and falls back to an
  * all-shuffle (b, c) join above it. The sf0.1→sf1 wave crossed that
  * gate (1.2M → 12M edges), so the recorded 1.10 exponent mixed two
  * plans. This main times ONE plan at a time:
  *
  *   runMain graft.TriangleScale <sfDir> <broadcastEdgeLimit>
  *
  * limit 0  = all-shuffle path at any size;
  * limit 2M = the production default (gated);
  * limit 16M = force-broadcast even at sf1 (~12M edge rows — viable on
  *             this 128 GiB single JVM, the measurement the crossover
  *             needs, NOT a production setting for arbitrary graphs).
  *
  * Prints one JSON line with the deduped edge count and min wall
  * seconds over 2 measured rounds (after a warm round that pays
  * parquet/codegen). SCALE.md §2f records the crossover table.
  */
object TriangleScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val limit = args(1).toLong
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

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    // the copart co-occurrence pair generator (GraphCatalog.copartPairs)
    val pr = li.groupBy("l_orderkey")
      .agg(sort_array(collect_set("l_partkey")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"))
        .as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))

    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val total = graft.operators.GraphAlgos
        .trianglesPerNode(pr, broadcastEdgeLimit = limit)
        .agg(sum("n_triangles")).collect()(0).getLong(0)
      ((System.nanoTime() - t0) / 1e9, total)
    }
    val nEdges = pr.select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v")).distinct().count()
    once() // warm
    val (t1, tri1) = once()
    val (t2, tri2) = once()
    require(tri1 == tri2, s"nondeterministic triangle total: $tri1 vs $tri2")
    println(s"""{"metric": "triangle_gate", "sf_dir": "$sfDir", """ +
      s""""broadcast_edge_limit": $limit, "n_edges_dedup": $nEdges, """ +
      s""""path": "${if (limit > 0 && nEdges <= limit) "broadcast" else "shuffle"}", """ +
      f""""wall_sec_min": ${math.min(t1, t2)}%.2f, "tri_sum": $tri1}""")
    spark.stop()
  }
}
