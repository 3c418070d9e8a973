package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Lineage.CutOps

/** Greedy k-center selection (Gonzalez 1985, the 2-approximation) —
  * coreset/diversity selection for training data: pick k
  * REPRESENTATIVE rows such that every row is close to some pick (the
  * complement of dedup's drop-the-near-dup: keep-the-spread). The
  * SemDeDup/DivideMix-style curation stacks use exactly this shape to
  * subsample embedding spaces without collapsing modes.
  *
  * Greedy rule: first center = least id (deterministic in place of
  * "arbitrary"); then k-1 times pick the point FARTHEST from the
  * selected set. The classic result: the greedy's coverage radius is
  * within 2x of the optimal k-center radius.
  *
  * Scale shape — the reason this is THE scalable coreset: the
  * farthest-point state is one running `dmin` column (min distance to
  * any selected center), and each round updates it with ONE 1-row
  * broadcast cross join against the newly-picked center followed by a
  * `max(struct(dmin, -id))` argmax aggregate — k linear passes total,
  * no pairwise matrix, no k x n x k recomputation, nothing
  * driver-sized beyond the single next-center row. Distances are
  * cosine distance (1 - cos) on the codegen'd `dot_product` kernel;
  * every argmax ties by least id, so a DuckDB oracle replaying the
  * greedy lands on the identical centers and radii.
  */
object KCenter {

  /** `points`: (id, v, nrm) with `dot_product` registered. Returns
    * (rank, center, radius): centers in selection order, radius = the
    * coverage radius (max over points of distance to the selected
    * set) AFTER the first `rank` centers — the audit column: radius
    * must be non-increasing in rank. */
  def select(points: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val gc = new Lineage.RoundGc(points.sparkSession)
    var st = points.select(col("id"), col("v"), col("nrm"),
      lit(1e9).as("dmin")).cutLineage()
    var cur = st.orderBy("id").limit(1)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    var out = Vector.empty[DataFrame]
    var r = 0
    while (r < k) {
      r += 1
      st = st.crossJoin(broadcast(cur))
        .withColumn("dmin", least(col("dmin"),
          lit(1.0) - expr("dot_product(v, cv)") / (col("nrm") * col("cn"))))
        .select("id", "v", "nrm", "dmin")
        .cutLineage()
      val top = st.agg(
        max(struct(col("dmin").as("d"), (-col("id")).as("ni"))).as("t"))
      out :+= cur.crossJoin(top).select(lit(r).as("rank"),
        col("cid").as("center"), col("t.d").as("radius"))
      cur = st.crossJoin(broadcast(top))
        .filter(col("id") === -col("t.ni"))
        .select(col("id").as("cid"), col("v").as("cv"),
          col("nrm").as("cn"))
      gc.endRound()
    }
    out.reduce(_ unionByName _)
  }
}
