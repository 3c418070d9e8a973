package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level near-duplicate removal — the user-facing operation the
  * M6 dedup family exists for: given the documents and a near-dup pair
  * graph (from any of the pairing operators: simhash bands, minhash
  * LSH, n-gram Jaccard), keep exactly ONE document per connected
  * component of the pair graph (similarity is not transitive, so
  * clusters — not pairs — are the unit of deduplication).
  */
object Dedup {

  /** The deduplicated corpus: every document not in any pair, plus the
    * canonical (minimum-`idCol`) document of each near-dup cluster.
    * Deterministic: the survivor set depends only on the pair graph,
    * never on partitioning or visit order.
    *
    * @param docs  the corpus; must carry `idCol`
    * @param pairs near-dup pairs with columns `doc_a`, `doc_b` (values
    *              of `idCol`)
    */
  def keepCanonical(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val comps = Components.connectedComponents(pairs, "doc_a", "doc_b")
    docs.join(comps.select(col("node").as(idCol), col("comp")), Seq(idCol), "left")
      .filter(col("comp").isNull || col("comp") === col(idCol))
      .drop("comp")
  }
}
