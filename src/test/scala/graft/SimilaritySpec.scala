package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN operators: IVF recall against the exact baseline, and spark.ml
  * MinHashLSH candidate generation (M6 scale-path variants). */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb =
    graft.catalog.Q.t(spark, "/root/testdata/sf0.001", "embeddings").cache()

  test("IVF top-1 recalls most exact top-1 neighbors with nProbe=3/8") {
    val queryIds = (0L until 20L)
    val exact = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ivf = Similarity.ivfTopK(emb, queryIds, k = 1, nCells = 8, nProbe = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ivf.size == 20, "every query must return a neighbor")
    val recall = queryIds.count(q => ivf.get(q) == exact.get(q)).toDouble / 20
    // random 64-dim corpus: the true NN is usually in one of the 3 probed
    // cells; require a meaningful-but-robust bound
    assert(recall >= 0.5, s"IVF top-1 recall $recall too low")
  }

  test("spark.ml MinHashLSH finds near-dup pairs consistent with Jaccard") {
    import spark.implicits._
    // plant two true near-duplicates in a slice of real documents
    val docs = graft.catalog.Q.t(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 50).select("doc_id", "text")
    val base = docs.filter(col("doc_id") === 0).collect()(0).getString(1)
    val planted = Seq((9000L, base), (9001L, base + " extra tail words"))
      .toDF("doc_id", "text")
    val pairs = Similarity.minHashCandidatePairs(docs.unionByName(planted), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 9000L)), "exact copy must be a candidate pair")
    assert(pairs.contains((0L, 9001L)) || pairs.contains((9000L, 9001L)),
      "near-copy must pair with an original")
  }
}
