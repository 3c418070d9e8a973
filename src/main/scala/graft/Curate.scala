package graft

import org.apache.spark.sql.SparkSession

/** Corpus-curation CLI — the M6 product face of
  * [[graft.operators.Curation]]: read a documents parquet (doc_id,
  * source, text, ...), run quality gate -> exact dedup -> near-dup
  * dedup -> context-window chunking, write the curated corpus + chunks,
  * and print the per-stage funnel (S17-style verification counts).
  *
  * Usage:
  *   runMain graft.Curate <documentsParquet> <outDir>
  *     [--min-tokens N] [--max-dup-frac F] [--min-alpha-frac F]
  *     [--win N] [--stride N] [--eval PATH [--min-shared N] [--ngram N]]
  *
  * `--eval PATH` additionally decontaminates against a held-out eval
  * parquet (drops curated docs sharing >= min-shared distinct word
  * n-grams with it, --ngram tokens wide, default trigrams) before
  * chunking.
  *
  * Writes: <outDir>/curated (surviving docs), <outDir>/chunks
  * (chunk_text rows ready for tokenization), <outDir>/stats.
  */
object Curate {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  /** CLI body against a caller-owned session (e2e-testable). */
  def run(spark: SparkSession, args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Curate <documentsParquet> <outDir> [flags]")
    val Array(docsPath, outDir) = args.take(2)
    val flags = args.drop(2).toSeq
    def flagValue(name: String): Option[String] =
      flags.sliding(2).collectFirst { case Seq(`name`, v) if !v.startsWith("--") => v }

    val docs = spark.read.parquet(docsPath)
    val win = flagValue("--win").map(_.toInt).getOrElse(64)
    val stride = flagValue("--stride").map(_.toInt).getOrElse(48)
    // Validated up front: with non-ANSI SQL a zero/negative stride turns
    // the chunker's sequence() NULL and silently writes an EMPTY chunks
    // output instead of failing.
    require(win > 0, s"--win must be positive, got $win")
    require(stride > 0, s"--stride must be positive, got $stride")
    require(win >= stride,
      s"--win ($win) must be >= --stride ($stride), or tokens between windows are dropped")
    val r = graft.operators.Curation.curate(docs,
      minTokens = flagValue("--min-tokens").map(_.toInt).getOrElse(10),
      maxDupTokenFrac = flagValue("--max-dup-frac").map(_.toDouble).getOrElse(0.5),
      minAlphaFrac = flagValue("--min-alpha-frac").map(_.toDouble).getOrElse(0.5),
      win = win, stride = stride)
    // Optional decontamination against a held-out eval set, applied to
    // the deduped survivors (cheapest point: smallest corpus, and the
    // dropped docs never reach the chunker).
    val curated = flagValue("--eval") match {
      case Some(evalPath) => graft.operators.Curation.decontaminate(
        r.curated, spark.read.parquet(evalPath),
        minShared = flagValue("--min-shared").map(_.toInt).getOrElse(8),
        n = flagValue("--ngram").map(_.toInt).getOrElse(3))
      case None => r.curated
    }
    val chunks = graft.operators.Curation.chunkWindows(curated, win, stride)

    curated.write.mode("overwrite").parquet(s"$outDir/curated")
    chunks.write.mode("overwrite").parquet(s"$outDir/chunks")
    // Funnel counts: the expensive stages (near-dup CC, chunking) are
    // counted from the parquet just written instead of recomputed.
    import spark.implicits._
    // "curated" = final survivors: near-dup dedup plus, when --eval was
    // given, decontamination (not labeled after_neardup_dedup — with
    // --eval that name would misattribute the decontamination drops).
    val stats = Seq(
      ("input", docs.count()),
      ("after_quality_gate", r.quality.count()),
      ("after_exact_dedup", r.exactDeduped.count()),
      ("curated", spark.read.parquet(s"$outDir/curated").count()),
      ("chunks", spark.read.parquet(s"$outDir/chunks").count())
    ).toDF("stage", "n_rows")
    stats.write.mode("overwrite").json(s"$outDir/stats")
    stats.show(10, truncate = false)
  }
}
