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

  /** Edit-distance-bounded word pairs via FastSS deletion-neighborhood
    * blocking (Bocek et al. 2007) — the typo-tolerant string-match
    * primitive, corpus-scale: if ed(u, v) <= d then deleting the
    * edited positions (<= d chars from each side) leaves a COMMON
    * variant, so the candidate set is an equi-join of bounded
    * row-local deletion fan-outs (<= 1 + L + L(L-1)/2 variants per
    * word at d = 2) — never an all-pairs comparison. Candidates then
    * verify with the exact codegen'd `levenshtein` (the blocking is a
    * complete SUPERSET: shared variants can arise from transposition-
    * like rearrangements at larger true distance, e.g. "ab"/"ba"
    * share "a" at ed 2 but "abc"/"bca" share "bc" at ed 3 — the
    * verify keeps exactly the <= d pairs, so ANY complete blocking
    * yields the identical final set; that is what lets an oracle use
    * an independently-formulated neighborhood).
    *
    * Scale shape: the variant join's key groups are VOCABULARY-
    * bounded (words within 2 deletions of a shared variant), not
    * corpus-bounded — growing the corpus grows word frequency, not
    * group width, and the input here is the distinct-word table.
    */
  def editDistancePairs(words: DataFrame, wCol: String = "w"): DataFrame = {
    val vars = words.select(col(wCol).as("w"), explode(expr(
      """array_distinct(concat(
           array(w),
           transform(sequence(1, length(w)), i ->
             concat(substring(w, 1, i - 1), substring(w, i + 1, length(w)))),
           flatten(transform(sequence(1, length(w)), i ->
             CASE WHEN i < length(w)
               THEN transform(sequence(i + 1, length(w)), j ->
                 concat(substring(w, 1, i - 1),
                        substring(w, i + 1, j - i - 1),
                        substring(w, j + 1, length(w))))
               ELSE CAST(array() AS array<string>) END))))""")).as("v"))
    vars.select(col("w").as("w_a"), col("v"))
      .join(vars.select(col("w").as("w_b"), col("v")), Seq("v"))
      .filter(col("w_a") < col("w_b"))
      .select("w_a", "w_b").distinct()
      .withColumn("dist", levenshtein(col("w_a"), col("w_b")))
      .filter(col("dist") <= 2)
  }
}
