package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Curation

/** The end-to-end curation pipeline: every stage must remove exactly the
  * planted offenders and nothing else, and the chunker must emit the
  * arithmetic window layout. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val textA = (0 until 120).map(i => s"alpha$i").mkString(" ")
  private val textANear = ("zeta0 zeta1" +: (2 until 120).map(i => s"alpha$i")).mkString(" ")
  private val textB = (0 until 120).map(i => s"beta$i").mkString(" ")

  private val docRows = Seq(
    (1L, "src0", textA),                 // good, survives everything
    (2L, "src0", textA),                 // exact duplicate of 1
    (3L, "src0", textANear),             // near-duplicate of 1 (2 tokens changed)
    (4L, "src0", textB),                 // distinct good doc, survives
    (5L, "src0", "hi there"),            // too short
    (6L, "src0", Seq.fill(50)("spam").mkString(" ")), // repetitive
    (7L, "src0", "!!! ### $$$ %%% ^^^ &&& *** ((( ))) ___ +++ === ~~~") // no alpha
  )
  private def docs = docRows.toDF("doc_id", "source", "text")

  test("each stage removes exactly the planted offenders") {
    val r = Curation.curate(docs)
    assert(r.quality.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(r.exactDeduped.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
    assert(r.curated.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }

  test("near-dup pair graph links the edited twin to its original") {
    val pairs = Curation.simhashNearDupPairs(docs.filter(col("doc_id").isin(1L, 3L, 4L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)))
  }

  test("chunk windows: 120 tokens -> starts 1/49/97, ragged tail kept") {
    val chunks = Curation.chunkWindows(docs.filter(col("doc_id") === 1L))
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(chunks.toSeq == Seq((0, 1, 64), (1, 49, 64), (2, 97, 24)))
    // chunk text round-trips the source tokens
    val first = Curation.chunkWindows(docs.filter(col("doc_id") === 1L))
      .filter(col("chunk_idx") === 0).select("chunk_text").as[String].head
    assert(first == (0 until 64).map(i => s"alpha$i").mkString(" "))
  }

  test("stats reports the per-stage funnel") {
    val r = Curation.curate(docs)
    val st = Curation.stats(spark, docs, r)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(st == Map("input" -> 7L, "after_quality_gate" -> 4L,
      "after_exact_dedup" -> 3L, "after_neardup_dedup" -> 2L, "chunks" -> 6L))
  }

  test("stats pins the funnel: input scanned 3x total, near-dup stage once") {
    // A single-partition input whose every scan bumps a counter. With the
    // exactDeduped/curated pins in stats, the five counts scan the input
    // exactly 3 times (input count, quality count, exact-dedup cache
    // materialization) — the banded near-dup join runs ONCE, off the
    // cache. Without the pins, the curated and chunks counts each re-run
    // the whole funnel from the input (5+ scans).
    CurationSpec.scans.set(0)
    val counted = spark.createDataset(docRows).coalesce(1)
      .mapPartitions { it => CurationSpec.scans.incrementAndGet(); it }
      .toDF("doc_id", "source", "text")
    // curate() itself materializes the near-dup pair graph eagerly (the
    // localCheckpoint inside connectedComponents) — that is the pairing's
    // ONE execution; stats must not add more.
    val r = Curation.curate(counted)
    val preStats = CurationSpec.scans.get()
    val st = Curation.stats(spark, counted, r)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(st == Map("input" -> 7L, "after_quality_gate" -> 4L,
      "after_exact_dedup" -> 3L, "after_neardup_dedup" -> 2L, "chunks" -> 6L))
    val statScans = CurationSpec.scans.get() - preStats
    assert(statScans == 3,
      s"stats must scan the input exactly 3x (input count, quality count, " +
        s"exact-dedup cache materialization) — the curated and chunks counts " +
        s"read the pins — but scanned ${statScans}x")
  }

  test("decontaminate drops train docs overlapping the eval set") {
    // train doc 10 embeds a verbatim 20-token span of eval doc 100 ->
    // 18 shared trigrams >= minShared 8; docs 11/12 share nothing.
    val evalSpan = (0 until 20).map(i => s"eval$i").mkString(" ")
    val train = Seq(
      (10L, "s", s"${(0 until 50).map(i => s"alpha$i").mkString(" ")} $evalSpan"),
      (11L, "s", (0 until 60).map(i => s"beta$i").mkString(" ")),
      (12L, "s", (0 until 60).map(i => s"gamma$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val eval_ = Seq((100L, "eval", s"intro words $evalSpan trailing words"))
      .toDF("doc_id", "source", "text")
    val kept = Curation.decontaminate(train, eval_)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(11L, 12L))
    // a higher threshold than the overlap keeps everything
    assert(Curation.decontaminate(train, eval_, minShared = 50).count() == 3)

    // n-gram width is a real knob: the 20-token verbatim span shares
    // exactly 19 bigrams (n=2) and 17 4-grams (n=4) — thresholds right
    // at / just past each frontier flip the drop decision.
    def keptIds(minShared: Int, n: Int) =
      Curation.decontaminate(train, eval_, minShared, n)
        .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptIds(minShared = 19, n = 2) == Seq(11L, 12L))
    assert(keptIds(minShared = 20, n = 2) == Seq(10L, 11L, 12L))
    assert(keptIds(minShared = 17, n = 4) == Seq(11L, 12L))
    assert(keptIds(minShared = 18, n = 4) == Seq(10L, 11L, 12L))
  }

  test("decontaminateBloom matches decontaminate exactly (FPs die in confirm)") {
    // Same fixture as the exact test, plus knob sweeps: the bloom path
    // must agree on every (minShared, n) decision frontier even when
    // the filter is tiny enough (mBits=64) that false positives are
    // near-certain — the confirm join must erase them all.
    val evalSpan = (0 until 20).map(i => s"eval$i").mkString(" ")
    val train = Seq(
      (10L, "s", s"${(0 until 50).map(i => s"alpha$i").mkString(" ")} $evalSpan"),
      (11L, "s", (0 until 60).map(i => s"beta$i").mkString(" ")),
      (12L, "s", (0 until 60).map(i => s"gamma$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val eval_ = Seq((100L, "eval", s"intro words $evalSpan trailing words"))
      .toDF("doc_id", "source", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().sorted.toSeq
    for ((minShared, n) <- Seq((8, 3), (19, 2), (20, 2), (17, 4), (18, 4)))
      assert(
        ids(Curation.decontaminateBloom(train, eval_, minShared, n)) ==
          ids(Curation.decontaminate(train, eval_, minShared, n)),
        s"bloom path diverged at minShared=$minShared n=$n")
    for (mBits <- Seq(64, 1 << 10))
      assert(ids(Curation.decontaminateBloom(train, eval_, mBits = mBits)) ==
        Seq(11L, 12L), s"bloom path wrong at mBits=$mBits")
  }

  test("shingleBloom sets exactly the probed bits (no FN; FP only by collision)") {
    // Membership through the bloom must never reject an inserted key
    // (no false negatives) — probe the builder's own inputs through the
    // SAME forall test decontaminateBloom uses.
    val mBits = 1 << 12
    val k = 5
    val sgs = (0 until 200).map(i => s"shingle number $i").toDF("sg")
    val bloom = Curation.shingleBloom(sgs, mBits, k)
    assert(bloom.count() == 1)
    val probe = sgs.crossJoin(broadcast(bloom))
      .filter(expr(
        s"""forall(transform(sequence(0, ${k - 1}), s -> pmod(xxhash64(sg, s), $mBits)),
           p -> (shiftright(element_at(bloom, CAST(p div 64 AS INT) + 1),
                            CAST(p % 64 AS INT)) & 1) = 1)"""))
    assert(probe.count() == 200, "an inserted shingle failed the membership test")
    // the dense word array has the declared shape
    val words = bloom.select(expr("size(bloom)")).as[Int].head()
    assert(words == mBits / 64)
  }

  test("mixtureSelect packs each source's budgeted prefix in hash order") {
    val mix = (1L to 60L)
      .map(i => (i, s"src${i % 3}", Seq.fill((i % 7 + 3).toInt)("tok").mkString(" ")))
    val docs = mix.toDF("doc_id", "source", "text")
    val weights = Map("src0" -> 0.5, "src1" -> 0.25) // src2 unlisted -> dropped
    val budget = 100L

    // the naive specification: per source, rank docs by (md5(doc_id),
    // doc_id) and keep the maximal prefix whose token sum fits
    // round(w * budget) — the bucketed implementation must match exactly
    val expected = CurationSpec.naiveMixture(mix, weights, budget)

    val got = Curation.mixtureSelect(docs, weights, budget)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected, s"selection mismatch: got $got expected $expected")
    assert(got.nonEmpty && got.size < 40, "budget must bind")

    // a budget beyond every source's total keeps all weighted docs
    assert(Curation.mixtureSelect(docs, weights, 1000000L).count() == 40)
    // schema passes through untouched
    assert(Curation.mixtureSelect(docs, weights, budget).columns.toSeq ==
      Seq("doc_id", "source", "text"))
  }

  test("mixtureSelect equals the naive rule on randomized corpora") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val rows = (1L to 80L).map { i =>
        (i, s"src${rnd.nextInt(4)}",
          Seq.fill(rnd.nextInt(12) + 1)("tok").mkString(" "))
      }
      val weights = (0 until 4).filter(_ => rnd.nextBoolean())
        .map(s => s"src$s" -> (rnd.nextInt(9) + 1) / 10.0).toMap
      val budget = (rnd.nextInt(8) + 1) * 50L
      if (weights.nonEmpty) {
        val got = Curation.mixtureSelect(
          rows.toDF("doc_id", "source", "text"), weights, budget)
          .select("doc_id").as[Long].collect().toSet
        val expected = CurationSpec.naiveMixture(rows, weights, budget)
        assert(got == expected,
          s"weights=$weights budget=$budget: got $got expected $expected")
      }
    }
  }

  test("shardAssign: deterministic, in-range, row-order independent") {
    val chunks = Curation.chunkWindows(docs)
    def mapping(df: org.apache.spark.sql.DataFrame) =
      Curation.shardAssign(df, 8, Seq("doc_id", "chunk_idx"))
        .select("doc_id", "chunk_idx", "shard")
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val a = mapping(chunks)
    assert(a.nonEmpty && a.values.forall(s => s >= 0 && s < 8))
    // identical assignment regardless of row order or repartitioning
    val b = mapping(chunks.orderBy(col("doc_id").desc).repartition(7))
    assert(a == b)
    // invalid shard counts fail loudly
    intercept[IllegalArgumentException] {
      Curation.shardAssign(chunks, 0, Seq("doc_id"))
    }
    intercept[IllegalArgumentException] {
      Curation.shardAssign(chunks, 1 << 17, Seq("doc_id"))
    }
  }

  test("redactPii replaces emails/IPs/phones with typed tokens and counts spans") {
    val rows = Seq(
      (1L, "src", "contact me at jane.doe+spam@corp.example.org or +1 (555) 123-4567 today"),
      (2L, "src", "server at 10.0.42.7 answered; backup at 192.168.1.255 did not"),
      (3L, "src", "no pii here, just words and the number 7"),
      // a phone-shaped digit run INSIDE the email local part: one span,
      // consumed by the email pattern — must count once, not twice
      (4L, "src", "mail user12345678901@example.com now")).toDF("doc_id", "source", "text")
    val got = Curation.redactPii(rows).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Int]("n_pii"))).toMap
    assert(got(1L)._1 == "contact me at <EMAIL> or <PHONE> today")
    assert(got(1L)._2 == 2)
    assert(got(2L)._1 == "server at <IP> answered; backup at <IP> did not")
    assert(got(2L)._2 == 2)
    assert(got(3L) == ("no pii here, just words and the number 7", 0))
    assert(got(4L) == ("mail <EMAIL> now", 1),
      "n_pii counts replacements made, not per-pattern matches on the original")
    // column set preserved (+ n_pii), order-independent
    assert(Curation.redactPii(rows).columns.toSet ==
      Set("doc_id", "source", "text", "n_pii"))
  }

  test("c4LineFilter keeps punctuated prose lines, drops boilerplate, reassembles in order") {
    val doc1 = Seq(
      "this line has enough words and punctuation.", // kept
      "short line.",                                 // dropped: < 5 words
      "this one has plenty of words but no terminal punctuation", // dropped
      "function f() { return 1; }",                  // dropped: brace
      "uses javascript so it is boilerplate too.",   // dropped: marker word
      "a second good line also survives just fine!"  // kept
    ).mkString("\n")
    val doc2 = "only one good line survives in this document." // < minLines
    val rows = Seq((1L, "s", doc1), (2L, "s", doc2)).toDF("doc_id", "source", "text")
    val got = Curation.c4LineFilter(rows).collect()
    assert(got.length == 1 && got(0).getAs[Long]("doc_id") == 1L)
    assert(got(0).getAs[Long]("n_lines") == 6L)
    assert(got(0).getAs[Long]("n_lines_kept") == 2L)
    assert(got(0).getAs[String]("text") ==
      "this line has enough words and punctuation.\n" +
        "a second good line also survives just fine!")
    // non-text columns pass through
    assert(Curation.c4LineFilter(rows).columns.toSet ==
      Set("doc_id", "source", "n_lines", "n_lines_kept", "text"))
  }

  test("chunkDedup keeps first chunk occurrences, rebuilds text in order") {
    val c1 = (0 until 16).map(i => s"head$i").mkString(" ")  // shared boilerplate
    val c2 = (0 until 16).map(i => s"bodya$i").mkString(" ")
    val c3 = (0 until 16).map(i => s"bodyb$i").mkString(" ")
    val rows = Seq(
      (1L, "s", s"$c1 $c2"), // first doc: keeps both chunks
      (2L, "s", s"$c1 $c3"), // repeats the boilerplate, keeps its body
      (3L, "s", c2)          // fully duplicate of doc 1's body -> empty
    ).toDF("doc_id", "source", "text")
    val got = Curation.chunkDedup(rows).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_chunks_kept"),
          r.getAs[String]("text")))).toMap
    assert(got(1L) == ((2L, 2L, s"$c1 $c2")))
    assert(got(2L) == ((2L, 1L, c3)))
    assert(got(3L) == ((1L, 0L, "")))
    // non-text columns pass through
    assert(Curation.chunkDedup(rows).columns.toSet ==
      Set("doc_id", "source", "n_chunks", "n_chunks_kept", "text"))
  }

  test("Curate CLI end-to-end: parquet in -> curated/chunks/stats out") {
    val base = java.nio.file.Files.createTempDirectory("graft-curate").toString
    docs.write.mode("overwrite").parquet(s"$base/docs")
    Curate.run(spark, Array(s"$base/docs", s"$base/out", "--win", "32", "--stride", "32"))
    assert(spark.read.parquet(s"$base/out/curated").select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    // win 32 / stride 32: 120 tokens -> 4 non-overlapping chunks per doc
    assert(spark.read.parquet(s"$base/out/chunks").count() == 8L)
    val st = spark.read.json(s"$base/out/stats")
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_rows")).toMap
    assert(st("input") == 7L && st("curated") == 2L && st("chunks") == 8L)

    // --eval: doc 4 (textB) is verbatim in the eval set -> decontaminated
    Seq((200L, "eval", textB)).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$base/eval")
    Curate.run(spark, Array(s"$base/docs", s"$base/out2", "--eval", s"$base/eval"))
    assert(spark.read.parquet(s"$base/out2/curated").select("doc_id")
      .as[Long].collect().toSeq == Seq(1L))

    // --eval --bloom: identical decision through the prefiltered plan
    Curate.run(spark, Array(s"$base/docs", s"$base/out2b",
      "--eval", s"$base/eval", "--bloom"))
    assert(spark.read.parquet(s"$base/out2b/curated").select("doc_id")
      .as[Long].collect().toSeq == Seq(1L))

    // --mix packs the curated survivors into per-source token budgets:
    // survivors 1 and 4 are 120 tokens each, and in md5 order doc 4
    // ("a87f...") precedes doc 1 ("c4ca..."), so a 150-token budget
    // keeps exactly doc 4 (cum 120 <= 150; doc 1 would push it to 240)
    Curate.run(spark, Array(s"$base/docs", s"$base/out4",
      "--mix", "src0:1.0", "--token-budget", "150", "--win", "32", "--stride", "32"))
    assert(spark.read.parquet(s"$base/out4/curated").select("doc_id")
      .as[Long].collect().toSeq == Seq(4L))
    assert(spark.read.parquet(s"$base/out4/chunks").count() == 4L)
    // --mix without --token-budget fails loudly
    assert(intercept[IllegalArgumentException] {
      Curate.run(spark, Array(s"$base/docs", s"$base/out5", "--mix", "src0:1.0"))
    }.getMessage.contains("--token-budget"))

    // --timings: per-stage increments land in timings.jsonl (the scale
    // measurement mode behind SCALE.md §2d) and results are unchanged
    Curate.run(spark, Array(s"$base/docs", s"$base/out7",
      "--win", "32", "--stride", "32", "--timings"))
    assert(spark.read.parquet(s"$base/out7/curated").select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    val tl = scala.io.Source.fromFile(s"$base/out7/timings.jsonl")
      .getLines().toSeq
    val stages = tl.map(l => l.split("\"stage\":\"")(1).split("\"")(0))
    assert(Seq("redact_pii", "quality_gate", "exact_dedup", "neardup_dedup",
      "mixture_select", "chunk_and_write").forall(stages.contains), stages)

    // --redact-pii rewrites text BEFORE any hashing: no raw email
    // reaches the curated output, and the n_pii count column survives
    val pii = docs.withColumn("text",
      concat(col("text"), lit(" mail bob@leak.example.com now")))
    pii.write.mode("overwrite").parquet(s"$base/docs_pii")
    Curate.run(spark, Array(s"$base/docs_pii", s"$base/out6", "--redact-pii"))
    val curatedPii = spark.read.parquet(s"$base/out6/curated")
    assert(curatedPii.filter(col("text").contains("leak.example.com")).count() == 0)
    assert(curatedPii.filter(col("text").contains("<EMAIL>")).count() == curatedPii.count())
    assert(curatedPii.filter(col("n_pii") >= 1).count() == curatedPii.count())

    // --line-filter strips boilerplate lines BEFORE quality/dedup: the
    // punctuated 8-word lines survive, the short unpunctuated tail line
    // never reaches the curated text (words are all-letters so the doc
    // clears the downstream alpha-fraction and dup-token gates)
    val lineWords = (0 until 30).map(i => (0 until 8).map(j =>
      s"${('a' + i % 26).toChar}${('a' + i / 26).toChar}${('a' + j).toChar}ing")
      .mkString(" ") + ".")
    Seq((300L, "src0", (lineWords :+ "short tail").mkString("\n")))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$base/docs_lines")
    Curate.run(spark, Array(s"$base/docs_lines", s"$base/out7", "--line-filter"))
    val curLined = spark.read.parquet(s"$base/out7/curated").collect()
    assert(curLined.length == 1)
    assert(curLined(0).getAs[Long]("n_lines") == 31L)
    assert(curLined(0).getAs[Long]("n_lines_kept") == 30L)
    assert(!curLined(0).getAs[String]("text").contains("short tail"))

    // --manifest writes per-shard fingerprints; two runs over identical
    // input produce IDENTICAL manifests (the reproducibility contract)
    Curate.run(spark, Array(s"$base/docs", s"$base/out9",
      "--manifest", "--shards", "4", "--win", "32", "--stride", "32"))
    val m1 = spark.read.parquet(s"$base/out9/manifest")
      .collect().map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_chunks"),
        r.getAs[String]("manifest_md5"))).sortBy(_._1).toSeq
    assert(m1.nonEmpty && m1.map(_._2).sum == 8L) // all chunks accounted for
    Curate.run(spark, Array(s"$base/docs", s"$base/out9b",
      "--manifest", "--shards", "4", "--win", "32", "--stride", "32"))
    val m2 = spark.read.parquet(s"$base/out9b/manifest")
      .collect().map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_chunks"),
        r.getAs[String]("manifest_md5"))).sortBy(_._1).toSeq
    assert(m1 == m2)

    // --chunk-dedup drops cross-doc repeated 16-token chunks before
    // scoring: doc 2 (exact twin of 1) collapses to empty text and is
    // dropped at the chunk stage itself; doc 3 (2 tokens changed in the
    // first chunk) keeps only its differing chunks, and the loss of
    // alpha0..alpha15-style shared chunks shows in its curated text
    Curate.run(spark, Array(s"$base/docs", s"$base/out8", "--chunk-dedup"))
    val curChunked = spark.read.parquet(s"$base/out8/curated")
    val ids8 = curChunked.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids8.contains(1L) && ids8.contains(4L) && !ids8.contains(2L))
    val d3txt = curChunked.filter(col("doc_id") === 3L)
      .select("text").as[String].collect()
    // doc 3 survives with only chunks not already claimed by doc 1
    assert(d3txt.forall(t => t.contains("zeta0") && !t.contains("alpha16")))

    // window-geometry flags are validated up front: --stride 0 would
    // otherwise NULL the chunker's sequence() and silently write an
    // empty chunks output
    for (bad <- Seq(Array("--stride", "0"), Array("--win", "-4"),
        Array("--win", "16", "--stride", "32"))) {
      val e = intercept[IllegalArgumentException] {
        Curate.run(spark, Array(s"$base/docs", s"$base/out3") ++ bad)
      }
      assert(e.getMessage.contains("--win") || e.getMessage.contains("--stride"))
    }
  }
}

object CurationSpec {
  /** Input-scan counter for the stats-pinning test (same-JVM local mode). */
  val scans = new java.util.concurrent.atomic.AtomicInteger(0)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The mixture-selection rule stated naively: per source, rank by
    * (md5(doc_id), doc_id) and keep the maximal prefix whose whitespace
    * token sum fits round(w * budget). */
  def naiveMixture(rows: Seq[(Long, String, String)],
      weights: Map[String, Double], budget: Long): Set[Long] =
    weights.keys.flatMap { src =>
      val b = math.round(weights(src) * budget)
      var cum = 0L
      rows.filter(_._2 == src)
        .sortBy { case (id, _, _) => (md5hex(id.toString), id) }
        .takeWhile { case (_, _, text) =>
          cum += text.split(" ").length; cum <= b }
        .map(_._1)
    }.toSet
}
