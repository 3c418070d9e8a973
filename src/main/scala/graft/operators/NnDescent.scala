package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Lineage.CutOps

/** NN-Descent (Dong, Moses, Li 2011): approximate kNN-GRAPH
  * construction — the graph-ANN complement of the IVF/LSH query
  * ladder. Where IVF answers "neighbors of THIS query", the kNN graph
  * materializes every node's neighborhood at once (the structure
  * HNSW-family indexes are built from, and what SemDeDup-style
  * curation consumes corpus-wide).
  *
  * The algorithm's one idea: a neighbor of a neighbor is likely a
  * neighbor. Start from any seed lists, then repeatedly score each
  * node against its neighbors-of-neighbors (in BOTH edge directions)
  * and keep the best k. Each round is a bounded-fanout self-join —
  * with lists capped at k, the candidate set is <= 4k^2 per node, so
  * a round costs O(n * k^2) pairs regardless of corpus size: the
  * all-pairs O(n^2) never appears anywhere. That bounded join IS the
  * 100 TB story.
  *
  * Determinism (what lets a DuckDB oracle replicate the rounds
  * exactly): no sampling — the classic algorithm samples candidates;
  * at bounded k the full candidate set is cheaper than the bookkeeping
  * — and deterministic seeds (same-LSH-bucket peers for semantic
  * locality + a ring over the dense id space as a connectivity floor,
  * in place of the paper's random init). Scoring reads the codegen
  * dot_product kernel; ties break by neighbor id, the VectorCatalog
  * convention. Convergence is audited, not assumed: the catalog query
  * reports per-query recall against the exact top-k.
  */
object NnDescent {

  /** Approximate kNN graph: (src, rn, dst, cos), rn = 1..k by
    * descending cosine (ties by dst). `vectors` must carry (id, v,
    * nrm) with `dot_product` registered; `init` is any (src, dst)
    * seed edge list. */
  def knnGraph(vectors: DataFrame, init: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    val sv = vectors.select(col("id").as("src"), col("v").as("sv"),
      col("nrm").as("sn"))
    val dv = vectors.select(col("id").as("dst"), col("v").as("dv"),
      col("nrm").as("dn"))
    def topk(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy("src")
        .orderBy(col("cos").desc, col("dst").asc)
      cand.join(sv, Seq("src")).join(dv, Seq("dst"))
        .withColumn("cos",
          expr("dot_product(sv, dv)") / (col("sn") * col("dn")))
        .select("src", "dst", "cos")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
    }
    var nb = topk(init.distinct()).cutLineage()
    for (_ <- 1 to rounds) {
      // undirected neighborhood B, then B∘B: neighbors-of-neighbors
      val b = nb.select("src", "dst")
        .unionByName(nb.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().cutLineage()
      val cand = b.select(col("src"), col("dst").as("mid"))
        .join(b.select(col("src").as("mid"), col("dst")), Seq("mid"))
        .select("src", "dst")
        .filter(col("src") =!= col("dst"))
        .unionByName(nb.select("src", "dst"))
        .distinct()
      nb = topk(cand).cutLineage()
    }
    nb
  }
}
