package graft.catalog

import org.apache.spark.sql.functions._
import graft.catalog.Q.t

/** Training-data-pipeline text operators over the `documents` table:
  * exact/near dedup, fingerprinting, language ID, quality scoring,
  * token statistics (builder-prompt M6 scope; SURVEY.md §7.2 M6).
  *
  * All operators are pure Column pipelines (no UDFs): shingling is
  * `sequence` + `transform`/`explode`, hashing is md5 (identical hex on
  * both engines), so every one of them carries a DuckDB oracle.
  */
object TextCatalog {

  /** Normalized text: lower, trim, collapse whitespace — shared by all ops. */
  private val sparkNorm = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"
  private val duckNorm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** 32-bit SimHash per doc (md5-nibble majority over distinct tokens),
    * carried with `source` so near-dup pairing can bucket by it. */
  private def simhashTable(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = t(s, d, "documents").withColumn("norm", expr(sparkNorm))
    val toks = docs
      .select(col("doc_id"), col("source"),
        explode(expr("array_distinct(split(norm, ' '))")).as("tok"))
      .withColumn("h", md5(col("tok")))
    toks
      .select(col("doc_id"), col("source"), col("h"),
        explode(expr("sequence(0, 31)")).as("bitpos"))
      .withColumn("p", expr("CAST(floor(bitpos / 4) AS INT)"))
      .withColumn("b", expr("bitpos % 4"))
      .withColumn("digit", expr("instr('0123456789abcdef', substring(h, p + 1, 1)) - 1"))
      .withColumn("contrib", expr("CASE WHEN CAST(floor(digit / pow(2, b)) AS INT) % 2 = 1"
        + " THEN 1 ELSE -1 END"))
      .groupBy("doc_id", "source", "bitpos")
      .agg(sum("contrib").as("s"))
      .groupBy("doc_id", "source")
      .agg(sum(expr("CASE WHEN s > 0 THEN CAST(pow(2, bitpos) AS BIGINT) ELSE 0 END"))
        .as("simhash"))
  }

  /** DuckDB twin of [[simhashTable]], shared by the two simhash oracles. */
  private def duckSimhashCte: String =
    s"""toks AS (
         SELECT DISTINCT doc_id, source, tok FROM (
           SELECT doc_id, source, unnest(string_split(norm, ' ')) AS tok
           FROM (SELECT doc_id, source, $duckNorm AS norm FROM documents))),
       bits AS (
         SELECT doc_id, source, CAST(bp AS INT) AS bitpos,
           CASE WHEN CAST(floor((strpos('0123456789abcdef',
                  substring(md5(tok), CAST(floor(bp / 4) AS INT) + 1, 1)) - 1)
                  / pow(2, bp % 4)) AS INT) % 2 = 1
                THEN 1 ELSE -1 END AS contrib
         FROM toks, UNNEST(range(0, 32)) AS u(bp)),
       sums AS (SELECT doc_id, source, bitpos, CAST(sum(contrib) AS BIGINT) AS s
                FROM bits GROUP BY 1, 2, 3),
       sims AS (
         SELECT doc_id, source,
           CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, bitpos) AS BIGINT) ELSE 0 END) AS BIGINT)
             AS simhash
         FROM sums GROUP BY 1, 2)"""

  private val enW = "'the','a','of','and','to','in','is'"
  private val deW = "'der','die','das','und','ist','nicht'"
  private val frW = "'le','la','les','et','est','dans'"
  private val esW = "'el','los','las','es','y','por'"

  val all: Seq[Q] = Seq(

    Q("x_exact_dedup",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), md5(expr(sparkNorm)).as("h"))
        .groupBy("h")
        .agg(count(lit(1)).as("n_copies"), min("doc_id").as("canonical_doc"))
        .groupBy()
        .agg(count(lit(1)).as("n_distinct_docs"),
          sum(when(col("n_copies") > 1, 1).otherwise(0)).as("n_dup_groups"),
          sum(col("n_copies") - 1).as("n_redundant_docs")),
      Some(s"""SELECT count(*) AS n_distinct_docs,
              CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
              CAST(sum(n_copies - 1) AS BIGINT) AS n_redundant_docs
              FROM (SELECT md5($duckNorm) AS h, count(*) AS n_copies,
                    min(doc_id) AS canonical_doc FROM documents GROUP BY 1)""")),

    Q("x_token_stats",
      (s, d) => t(s, d, "documents")
        .withColumn("norm", expr(sparkNorm))
        .select(col("doc_id"),
          expr("size(split(norm, ' '))").as("n_tokens"),
          octet_length(col("text")).as("n_bytes"),
          // NB: inside expr() strings "1.0" parses as DECIMAL — use 1.0D
          round(expr("length(replace(norm, ' ', '')) * 1.0D / size(split(norm, ' '))"), 4)
            .as("avg_token_len"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, len(string_split(norm, ' ')) AS n_tokens,
              octet_length(encode(text)) AS n_bytes,
              round(length(replace(norm, ' ', '')) * 1.0 / len(string_split(norm, ' ')), 4)
                AS avg_token_len
              FROM (SELECT doc_id, text, $duckNorm AS norm FROM documents)
              ORDER BY doc_id""")),

    Q("x_quality_score",
      (s, d) => t(s, d, "documents")
        .withColumn("norm", expr(sparkNorm))
        .withColumn("toks", expr("split(norm, ' ')"))
        .withColumn("n_tokens", expr("size(toks)"))
        .withColumn("n_stop", expr(s"size(filter(toks, t -> t IN ($enW)))"))
        .withColumn("n_alpha", expr("length(regexp_replace(norm, '[^a-z]', ''))"))
        .select(col("doc_id"),
          round(col("n_stop") * 1.0 / col("n_tokens"), 4).as("stopword_ratio"),
          round(col("n_alpha") * 1.0 / expr("length(norm)"), 4).as("alpha_ratio"),
          round(col("n_stop") * 1.0 / col("n_tokens") * 0.5
            + col("n_alpha") * 1.0 / expr("length(norm)") * 0.3
            + least(lit(1.0), col("n_tokens") / 100.0) * 0.2, 4).as("quality"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              round(n_stop * 1.0 / n_tokens, 4) AS stopword_ratio,
              round(n_alpha * 1.0 / n_chars, 4) AS alpha_ratio,
              round(n_stop * 1.0 / n_tokens * 0.5 + n_alpha * 1.0 / n_chars * 0.3
                    + least(1.0, n_tokens / 100.0) * 0.2, 4) AS quality
              FROM (SELECT doc_id,
                      len(list_filter(string_split(norm, ' '), t -> t IN ($enW))) AS n_stop,
                      len(string_split(norm, ' ')) AS n_tokens,
                      length(regexp_replace(norm, '[^a-z]', '', 'g')) AS n_alpha,
                      length(norm) AS n_chars
                    FROM (SELECT doc_id, $duckNorm AS norm FROM documents))
              ORDER BY doc_id""")),

    Q("x_langid",
      // scores = DISTINCT stopword hits via array_intersect (codegen-friendly,
      // no per-element lambda interpretation — the lambda version was 6x
      // slower at sf0.1)
      (s, d) => t(s, d, "documents")
        .withColumn("toks", expr(s"array_distinct(split($sparkNorm, ' '))"))
        .withColumn("s_en", expr(s"size(array_intersect(toks, array($enW)))"))
        .withColumn("s_de", expr(s"size(array_intersect(toks, array($deW)))"))
        .withColumn("s_fr", expr(s"size(array_intersect(toks, array($frW)))"))
        .withColumn("s_es", expr(s"size(array_intersect(toks, array($esW)))"))
        .withColumn("s_zh", expr("length(regexp_replace(text, '[\\\\x00-\\\\x7f]', ''))"))
        .withColumn("predicted_lang",
          expr("""CASE WHEN s_zh > 0 THEN 'zh'
                       WHEN s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
                       WHEN s_fr > s_en AND s_fr >= s_es THEN 'fr'
                       WHEN s_es > s_en THEN 'es'
                       ELSE 'en' END"""))
        .groupBy("lang", "predicted_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted_lang"),
      Some(s"""SELECT lang, predicted_lang, count(*) AS n FROM (
                SELECT lang,
                  CASE WHEN s_zh > 0 THEN 'zh'
                       WHEN s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
                       WHEN s_fr > s_en AND s_fr >= s_es THEN 'fr'
                       WHEN s_es > s_en THEN 'es'
                       ELSE 'en' END AS predicted_lang
                FROM (SELECT lang,
                        len(list_intersect(toks, [$enW])) AS s_en,
                        len(list_intersect(toks, [$deW])) AS s_de,
                        len(list_intersect(toks, [$frW])) AS s_fr,
                        len(list_intersect(toks, [$esW])) AS s_es,
                        length(regexp_replace(text, '[\\x00-\\x7f]', '', 'g')) AS s_zh
                      FROM (SELECT lang, text,
                              list_distinct(string_split($duckNorm, ' ')) AS toks
                            FROM documents)))
              GROUP BY lang, predicted_lang ORDER BY lang, predicted_lang""")),

    Q("x_fingerprint",
      // char_ngrams is the native graft.functions.CharNGrams expression
      // (codegen'd fused loop); for documents >= 5 chars it matches the
      // declarative sequence+substring form the oracle uses.
      (s, d) => {
        graft.functions.CharNGrams.register(s)
        t(s, d, "documents")
          .withColumn("norm", expr(sparkNorm))
          .select(col("doc_id"),
            expr("array_min(transform(char_ngrams(norm, 5), g -> md5(g)))")
              .as("fingerprint"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, min(md5(substring(norm, CAST(i AS INT), 5))) AS fingerprint
              FROM (SELECT doc_id, $duckNorm AS norm FROM documents),
                   UNNEST(range(1, greatest(length(norm) - 4, 1) + 1)) AS t(i)
              GROUP BY doc_id ORDER BY doc_id""")),

    Q("x_ngram_jaccard",
      // Word-trigram w-shingling (Broder-style), pairs bucketed by source:
      // the all-pairs join only meets inside a (source, shingle) bucket, so
      // join fan-out stays O(docs-per-source) — the shape that survives
      // scale-up, unlike char-4-grams whose near-universal sharing made the
      // join quadratic (137 s -> ~4 s at sf0.1).
      (s, d) => {
        val docs = t(s, d, "documents")
          .withColumn("toks", expr(s"split($sparkNorm, ' ')"))
        val sh = docs
          .filter(expr("size(toks) >= 3")) // docs with <3 tokens have no trigrams
          .select(col("doc_id"), col("source"),
            explode(expr("transform(sequence(1, size(toks) - 2),"
              + " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))")).as("sh"))
          .distinct()
        val card = sh.groupBy("doc_id").agg(count(lit(1)).as("card"))
        val a = sh.select(col("doc_id").as("doc_a"), col("source").as("src_a"), col("sh").as("sh_a"))
        val b = sh.select(col("doc_id").as("doc_b"), col("source").as("src_b"), col("sh").as("sh_b"))
        val inter = a.join(b,
            col("sh_a") === col("sh_b") && col("src_a") === col("src_b") && col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).as("inter"))
        inter
          .join(card.select(col("doc_id").as("doc_a"), col("card").as("card_a")), "doc_a")
          .join(card.select(col("doc_id").as("doc_b"), col("card").as("card_b")), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            round(col("inter") * 1.0 / (col("card_a") + col("card_b") - col("inter")), 4)
              .as("jaccard"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH toks AS (
                SELECT doc_id, source, string_split($duckNorm, ' ') AS toks
                FROM documents),
              sh AS (
                SELECT DISTINCT doc_id, source,
                  concat_ws(' ', toks[CAST(i AS INT)], toks[CAST(i AS INT) + 1],
                            toks[CAST(i AS INT) + 2]) AS sh
                FROM toks, UNNEST(range(1, len(toks) - 1)) AS t(i)
                WHERE len(toks) >= 3),
              card AS (SELECT doc_id, count(*) AS card FROM sh GROUP BY doc_id),
              inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM sh a JOIN sh b
                  ON a.sh = b.sh AND a.source = b.source AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
              SELECT doc_a, doc_b,
                round(inter * 1.0 / (ca.card + cb.card - inter), 4) AS jaccard
              FROM inter
              JOIN card ca ON ca.doc_id = doc_a
              JOIN card cb ON cb.doc_id = doc_b
              ORDER BY doc_a, doc_b""")),

    Q("x_minhash_lsh",
      // 8 minhash functions computed as 8 min() aggregates over ONE pass of
      // the shingle table (map-side partial aggregation, no per-function
      // explode) — the exploded j-variant shuffled 8x the rows and was 40x
      // slower at sf0.1. Bands = md5 over adjacent signature pairs; doc
      // pairs sharing any band bucket are near-dup candidates.
      (s, d) => {
        graft.functions.CharNGrams.register(s)
        val docs = t(s, d, "documents").withColumn("norm", expr(sparkNorm))
        val sh = docs
          .select(col("doc_id"), explode(expr("char_ngrams(norm, 5)")).as("sh"))
          .distinct()
        val minhashes = (0 to 7).map(j =>
          min(md5(concat(lit(s"$j:"), col("sh")))).as(s"m$j"))
        val mh = sh.groupBy("doc_id").agg(minhashes.head, minhashes.tail: _*)
        val bands = mh.select(col("doc_id"),
          explode(array((0 to 3).map(b => struct(lit(b).as("band"),
            md5(concat(col(s"m${2 * b}"), col(s"m${2 * b + 1}"))).as("band_sig"))): _*))
            .as("bs"))
          .select(col("doc_id"), col("bs.band").as("band"), col("bs.band_sig").as("band_sig"))
        val l = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_sig"))
        val r = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_sig"))
        l.join(r, Seq("band", "band_sig")).filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).as("n_shared_bands"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH sh AS (
                SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 5) AS sh
                FROM (SELECT doc_id, $duckNorm AS norm FROM documents),
                     UNNEST(range(1, greatest(length(norm) - 4, 1) + 1)) AS t(i)),
              mh AS (
                SELECT doc_id,
                  min(md5('0:' || sh)) AS m0, min(md5('1:' || sh)) AS m1,
                  min(md5('2:' || sh)) AS m2, min(md5('3:' || sh)) AS m3,
                  min(md5('4:' || sh)) AS m4, min(md5('5:' || sh)) AS m5,
                  min(md5('6:' || sh)) AS m6, min(md5('7:' || sh)) AS m7
                FROM sh GROUP BY doc_id),
              bands AS (
                SELECT doc_id, 0 AS band, md5(m0 || m1) AS band_sig FROM mh
                UNION ALL SELECT doc_id, 1, md5(m2 || m3) FROM mh
                UNION ALL SELECT doc_id, 2, md5(m4 || m5) FROM mh
                UNION ALL SELECT doc_id, 3, md5(m6 || m7) FROM mh)
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
              GROUP BY 1, 2 ORDER BY doc_a, doc_b""")),

    Q("x_simhash",
      (s, d) => simhashTable(s, d).select("doc_id", "simhash").orderBy("doc_id"),
      Some(s"WITH $duckSimhashCte SELECT doc_id, simhash FROM sims ORDER BY doc_id")),

    Q("x_simhash_neardup",
      // Near-dup candidates: doc pairs in the same source bucket whose
      // 32-bit SimHash signatures are within hamming distance 8 — the
      // distance is ONE codegen'd expression, bit_count(a ^ b) (no UDF).
      (s, d) => {
        val sims = simhashTable(s, d)
        val a = sims.select(col("doc_id").as("doc_a"), col("source").as("src_a"),
          col("simhash").as("sim_a"))
        val b = sims.select(col("doc_id").as("doc_b"), col("source").as("src_b"),
          col("simhash").as("sim_b"))
        a.join(b, col("src_a") === col("src_b") && col("doc_a") < col("doc_b"))
          .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
          .filter(col("hamming") <= 8)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH $duckSimhashCte
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                bit_count(xor(a.simhash, b.simhash)) AS hamming
              FROM sims a JOIN sims b
                ON a.source = b.source AND a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
              ORDER BY doc_a, doc_b"""))
  )
}
