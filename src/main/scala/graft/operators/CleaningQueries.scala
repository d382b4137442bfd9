package graft.operators

import graft.{DQ, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus CLEANING operators — the text-hygiene passes a training-data
  * pipeline runs before any dedup/curation: the C4 line-level rules
  * (Raffel et al. 2020, arXiv:1910.10683 §2.2) and PII redaction (the
  * scrub every published web-corpus recipe applies before release).
  * Both are strictly ROW-LOCAL — HOF line filters and regex passes, no
  * explode, no shuffle before the per-language rollup — so at 100 TB
  * each is one map-side scan, embarrassingly parallel.
  *
  * The synthetic documents corpus is single-line prose with no
  * punctuation and no PII, which would make both operators vacuous
  * zero-rows. Both DQs therefore run on a deterministically PLANTED
  * corpus derived in-query from `documents` (the same fixture
  * discipline as l9/l29's planted near-dups): line structure and PII
  * strings keyed on `doc_id` arithmetic, constructed by IDENTICAL
  * expressions in the Spark plan and the DuckDB oracle, so the gate
  * pins differential behavior — some docs keep lines / carry PII, some
  * don't — rather than an all-zero answer.
  */
object CleaningQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  import org.apache.spark.sql.Column

  /** The C4 LINE rule over a pre-split line array: kept lines end in
    * terminal punctuation, have ≥ 5 words, and do not mention
    * 'javascript' — ONE definition shared by [[l31]]'s plan (which
    * already holds the split array) and [[c4KeptText]] (which wraps its
    * own split for string-column callers), so batch and streaming can
    * never disagree on what a kept line is. */
  def c4KeptLines(lines: Column): Column =
    filter(lines, l =>
      substring(l, -1, 1).isin(".", "!", "?", "\"") &&
        size(split(l, " ")) >= 5 &&
        !contains(lower(l), lit("javascript")))

  /** The C4 PAGE rule: keep a page iff it carries no 'lorem ipsum', no
    * '{', and retains ≥ 3 lines after the line filter — the other half
    * of Raffel et al. §2.2, shared by [[l31]] and the streaming
    * pre-clean so ingest and batch agree on page MEMBERSHIP, not just
    * line content. */
  def c4PageKeep(text: Column, keptLines: Column): Column =
    !contains(lower(text), lit("lorem ipsum")) &&
      !contains(text, lit("{")) && size(keptLines) >= 3

  /** The C4 LINE rule as a reusable column: `text` → the text of its
    * kept lines. Line-level only — page membership is [[c4PageKeep]]'s
    * call (the streaming pre-clean composes both). */
  def c4KeptText(text: Column): Column =
    concat_ws("\n", c4KeptLines(split(text, "\n")))

  /** The PII redaction of [[l32]] as a reusable column — email, phone,
    * IPv4 each replaced by its typed tag, identical regexes and order
    * to the DQ (l32's `n_residual = 0` invariant proves convergence of
    * exactly this composition). */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>")),
      lit(IpRe), lit("<IP>"))

  /** The planted LINED corpus for [[l31]], as one SQL expression used
    * verbatim on both engines (column `text2`):
    *  - every doc keeps its original (unpunctuated, thus always-dropped)
    *    word-soup line;
    *  - docs with `doc_id % 4 = 0` gain THREE terminal-punctuated lines
    *    built from their own words (slices of 6 words + '.') — enough to
    *    pass C4's ≥ 3-sentence page bar when the doc has ≥ 18 words;
    *  - docs with `doc_id % 6 = 0` gain a 6-word line containing
    *    'javascript' (line-dropped by rule, page otherwise unaffected);
    *  - docs with `doc_id % 10 = 0` gain a ' lorem ipsum' suffix on the
    *    first line (page-dropped outright). */
  private val linedSql =
    """concat(
         text,
         CASE WHEN doc_id % 10 = 0 THEN ' lorem ipsum' ELSE '' END,
         CASE WHEN doc_id % 4 = 0 THEN concat(
           chr(10), concat_ws(' ', slice(split(text, ' '), 1, 6)), '.',
           chr(10), concat_ws(' ', slice(split(text, ' '), 7, 6)), '.',
           chr(10), concat_ws(' ', slice(split(text, ' '), 13, 6)), '.')
          ELSE '' END,
         CASE WHEN doc_id % 6 = 0
          THEN concat(chr(10), 'enable javascript to view this page')
          ELSE '' END)"""

  /** L31 — C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep
    * only lines that end in terminal punctuation, have ≥ 5 words, and do
    * not mention javascript; drop whole pages containing 'lorem ipsum'
    * or '{', or retaining fewer than 3 lines ("sentences"). Per
    * language: pages in/kept, lines in/kept, chars in/out, and the
    * dropped-page checksum pinning WHICH pages died.
    *
    * Scale shape: line rules are HOF filters over `split(text, '\n')`
    * and page rules plain predicates — one row-local pass, one 5-row
    * rollup. The cleaned corpus a real pipeline would LAND is
    * `kept_text` on kept pages; the DQ aggregates instead of dumping it
    * so the gate pins counts and the checksum. */
  val l31 = DQ(
    "l31_c4_clean",
    (s, d) => {
      docs(s, d)
        .withColumn("text2", expr(linedSql))
        .withColumn("lines", split(col("text2"), "\n"))
        .withColumn("kept", c4KeptLines(col("lines")))
        .withColumn("page_kept", c4PageKeep(col("text2"), col("kept")))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_pages"),
          sum(when(col("page_kept"), 1L).otherwise(0L)).as("n_pages_kept"),
          sum(size(col("lines")).cast("long")).as("n_lines"),
          sum(when(col("page_kept"), size(col("kept")).cast("long"))
            .otherwise(0L)).as("n_lines_kept"),
          sum(length(col("text2")).cast("long")).as("n_chars_in"),
          sum(when(col("page_kept"),
            length(concat_ws("\n", col("kept"))).cast("long"))
            .otherwise(0L)).as("n_chars_out"),
          coalesce(sum(when(!col("page_kept"), col("doc_id"))), lit(0L))
            .as("dropped_checksum"))
        .orderBy("lang")
    },
    Some(s"""WITH lined AS (
              SELECT lang, doc_id,
                $duckLinedSql AS text2
              FROM documents),
            pages AS (
              SELECT lang, doc_id, text2,
                string_split(text2, chr(10)) AS lines,
                list_filter(string_split(text2, chr(10)), l ->
                  substring(l, -1, 1) IN ('.', '!', '?', '"')
                  AND len(string_split(l, ' ')) >= 5
                  AND NOT contains(lower(l), 'javascript')) AS kept
              FROM lined),
            flags AS (
              SELECT lang, doc_id, lines, kept, text2,
                NOT contains(lower(text2), 'lorem ipsum')
                  AND NOT contains(text2, '{')
                  AND len(kept) >= 3 AS page_kept
              FROM pages)
            SELECT lang,
              CAST(COUNT(*) AS BIGINT) AS n_pages,
              CAST(SUM(CASE WHEN page_kept THEN 1 ELSE 0 END) AS BIGINT)
                AS n_pages_kept,
              CAST(SUM(len(lines)) AS BIGINT) AS n_lines,
              CAST(SUM(CASE WHEN page_kept THEN len(kept) ELSE 0 END) AS BIGINT)
                AS n_lines_kept,
              CAST(SUM(len(text2)) AS BIGINT) AS n_chars_in,
              CAST(SUM(CASE WHEN page_kept
                THEN len(array_to_string(kept, chr(10))) ELSE 0 END) AS BIGINT)
                AS n_chars_out,
              CAST(COALESCE(SUM(CASE WHEN NOT page_kept THEN doc_id END), 0)
                AS BIGINT) AS dropped_checksum
            FROM flags GROUP BY 1 ORDER BY lang"""))

  /** [[linedSql]] transliterated to DuckDB builtins (chr/concat are
    * shared; slice → list_slice with 1-based inclusive bounds,
    * split → string_split, concat_ws → array_to_string). */
  private def duckLinedSql =
    """concat(
         text,
         CASE WHEN doc_id % 10 = 0 THEN ' lorem ipsum' ELSE '' END,
         CASE WHEN doc_id % 4 = 0 THEN concat(
           chr(10), array_to_string(list_slice(string_split(text, ' '), 1, 6), ' '), '.',
           chr(10), array_to_string(list_slice(string_split(text, ' '), 7, 12), ' '), '.',
           chr(10), array_to_string(list_slice(string_split(text, ' '), 13, 18), ' '), '.')
          ELSE '' END,
         CASE WHEN doc_id % 6 = 0
          THEN concat(chr(10), 'enable javascript to view this page')
          ELSE '' END)"""

  // PII patterns — deliberately restricted to syntax both Java regex
  // (Spark) and RE2 (DuckDB) interpret identically: character classes,
  // bounded repetition, literal escapes; no backrefs, no lookaround,
  // no word boundaries.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+[0-9]{1,2} \\([0-9]{3}\\) [0-9]{3}-[0-9]{4}"
  private val IpRe    = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  // spec-visible handles (CleaningSpec pins rule-level behavior)
  private[operators] def linedSqlForTest = linedSql
  private[operators] def duckLinedSqlShared = duckLinedSql
  private[operators] def emailReForTest  = EmailRe
  private[operators] def phoneReForTest  = PhoneRe
  private[operators] def ipReForTest     = IpRe

  // THE single definitions of the PII patterns and the planted-PII
  // corpus, shared with l78's per-source exposure report
  // (AuditQueries) so the report can never drift from the scrub
  private[operators] val piiPatterns: Seq[(String, String)] =
    Seq("email" -> EmailRe, "phone" -> PhoneRe, "ip" -> IpRe)
  private[operators] def plantedPiiSql     = piiSql
  private[operators] def duckPlantedPiiSql = duckPiiSql

  /** The planted PII corpus for [[l32]] (column `text2`): emails on
    * `doc_id % 5 = 0` (address derived from doc_id), phones on
    * `% 7 = 0`, IPv4 on `% 11 = 0` — overlapping moduli so some docs
    * carry several PII kinds. */
  private val piiSql =
    """concat(
         text,
         CASE WHEN doc_id % 5 = 0
          THEN concat(' contact user', CAST(doc_id AS STRING), '@example.com now')
          ELSE '' END,
         CASE WHEN doc_id % 7 = 0
          THEN concat(' call +1 (555) 010-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))
          ELSE '' END,
         CASE WHEN doc_id % 11 = 0
          THEN concat(' from 10.0.', CAST(doc_id % 256 AS STRING), '.7')
          ELSE '' END)"""

  private val duckPiiSql = piiSql.replace("AS STRING", "AS VARCHAR")

  /** L32 — PII detection + redaction (the pre-release scrub of every
    * published web corpus; e.g. the CCNet/RefinedWeb recipes): regex
    * passes for emails, E.164-styled phone numbers and IPv4 addresses,
    * each occurrence replaced by a typed tag. Per language: docs
    * scanned, docs carrying each PII kind, total occurrences, the
    * redaction char delta, a flagged-doc checksum — and `n_residual`,
    * the count of PII matches REMAINING after redaction, an in-plan
    * invariant (0) proving the scrub converged rather than sampled.
    *
    * Scale shape: three codegen'd regex passes per row plus the
    * rollup; no shuffle, no UDF. */
  val l32 = DQ(
    "l32_pii_scrub",
    (s, d) => {
      docs(s, d)
        .withColumn("text2", expr(piiSql))
        .withColumn("n_email", regexp_count(col("text2"), lit(EmailRe)))
        .withColumn("n_phone", regexp_count(col("text2"), lit(PhoneRe)))
        .withColumn("n_ip", regexp_count(col("text2"), lit(IpRe)))
        .withColumn("redacted", piiRedact(col("text2")))
        .withColumn("n_residual",
          regexp_count(col("redacted"), lit(EmailRe)) +
            regexp_count(col("redacted"), lit(PhoneRe)) +
            regexp_count(col("redacted"), lit(IpRe)))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("n_email") > 0, 1L).otherwise(0L)).as("docs_email"),
          sum(when(col("n_phone") > 0, 1L).otherwise(0L)).as("docs_phone"),
          sum(when(col("n_ip") > 0, 1L).otherwise(0L)).as("docs_ip"),
          sum((col("n_email") + col("n_phone") + col("n_ip")).cast("long"))
            .as("n_pii"),
          sum((length(col("text2")) - length(col("redacted"))).cast("long"))
            .as("char_delta"),
          coalesce(sum(when(
            col("n_email") + col("n_phone") + col("n_ip") > 0, col("doc_id"))),
            lit(0L)).as("flagged_checksum"),
          sum(col("n_residual").cast("long")).as("n_residual"))
        .orderBy("lang")
    },
    Some(s"""WITH pii AS (
              SELECT lang, doc_id,
                $duckPiiSql AS text2
              FROM documents),
            scrubbed AS (
              SELECT lang, doc_id, text2,
                len(regexp_extract_all(text2, '$EmailRe')) AS n_email,
                len(regexp_extract_all(text2, '$PhoneRe')) AS n_phone,
                len(regexp_extract_all(text2, '$IpRe')) AS n_ip,
                regexp_replace(regexp_replace(regexp_replace(text2,
                  '$EmailRe', '<EMAIL>', 'g'),
                  '$PhoneRe', '<PHONE>', 'g'),
                  '$IpRe', '<IP>', 'g') AS redacted
              FROM pii)
            SELECT lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_email,
              CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_phone,
              CAST(SUM(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_ip,
              CAST(SUM(n_email + n_phone + n_ip) AS BIGINT) AS n_pii,
              CAST(SUM(len(text2) - len(redacted)) AS BIGINT) AS char_delta,
              CAST(COALESCE(SUM(CASE WHEN n_email + n_phone + n_ip > 0
                THEN doc_id END), 0) AS BIGINT) AS flagged_checksum,
              CAST(SUM(len(regexp_extract_all(redacted, '$EmailRe'))
                + len(regexp_extract_all(redacted, '$PhoneRe'))
                + len(regexp_extract_all(redacted, '$IpRe'))) AS BIGINT)
                AS n_residual
            FROM scrubbed GROUP BY 1 ORDER BY lang"""))

  /** The shared scoring expression of [[l34]] — one row-local pass:
    * token → polynomial char hash (the l8 fold, mod 1000003) → one of
    * 256 feature buckets → integer milli-weight
    * `pmod(bucket · 2654435761, 1001) − 500`; the doc score is the sum
    * over token OCCURRENCES. Every step is nonneg-integer arithmetic
    * before the final shift, so Spark and DuckDB cannot disagree on a
    * boundary. */
  private[operators] val scoreMilliSql =
    """aggregate(
         transform(ta, t ->
           pmod(pmod(aggregate(transform(split(t, ''), c -> cast(ascii(c) as bigint)),
                  cast(0 as bigint), (a, x) -> (a * 31 + x) % 1000003),
                256) * 2654435761, 1001) - 500),
         cast(0 as bigint), (a, x) -> a + x)"""


  /** [[scoreMilliSql]] transliterated to DuckDB list builtins — ONE
    * definition for every oracle that scores (l34, l60): the fold is
    * over `text` directly (split inline, `\s+`), positive hash values
    * make `%` ≡ Spark's `pmod`. */
  private[operators] val duckScoreSql =
    """list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split_regex(lower(text), '\s+'), t ->
             ((list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(t, ''),
                     c -> CAST(ascii(c) AS BIGINT))),
                 (a, x) -> (a * 31 + x) % 1000003)
               % 256) * 2654435761) % 1001 - 500)),
         (a, x) -> a + x)"""

  /** L34 — hashed-feature linear quality classifier: the MODEL-BASED
    * quality filter of the published corpus recipes (CCNet's fastText
    * scorer; the GPT-3 LR quality classifier), as distinct from l6's
    * hand-written heuristics. The load-bearing engineering at 100 TB is
    * the FEATURE-HASHING shape: tokens hash into a fixed bucket space
    * and score against a weight vector, so no vocabulary ever ships
    * with the job and scoring is one row-local pass — no shuffle, no
    * UDF, no model server. The weights here are a deterministic
    * synthetic stand-in derived from the bucket id (the multimodal-stub
    * discipline: the plumbing — tokenize → hash → bucket → dot-product
    * → threshold — is real and oracle-checked; production swaps the
    * weight EXPRESSION for a broadcast lookup of trained weights, a
    * one-line change that moves no data). Keep iff the score is
    * positive. Per language: docs, kept, mean milli-score, kept-doc
    * checksum. */
  /** The token → feature-bucket hash of [[scoreMilliSql]], as a DSL column
    * (same fold, same modulus, same 256-bucket space). */
  private def bucketOf(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(aggregate(transform(split(t, ""), c => ascii(c).cast("long")),
      lit(0L), (a, x) => (a * lit(31L) + x) % lit(1000003L)), lit(256L))

  /** The PRODUCTION weight path of [[l34]] — scoring against a TRAINED
    * `(bucket, milli_weight)` frame instead of the synthetic weight
    * expression. The weight table is bounded by construction (the
    * feature space is 256 buckets — that bound is the entire point of
    * feature hashing), so it collects once into a map LITERAL and
    * scoring stays one row-local pass per document: the
    * broadcast-lookup shape without even a join, nothing per-row
    * leaves the scan. Buckets absent from the frame weigh 0
    * (`try_element_at` — the repo's convention for stating tolerant
    * map access in the plan; since Spark 3.3 / SPARK-40066 a plain
    * `element_at` also NULLs on a missing MAP key even under ANSI, so
    * this is intent + future-proofing, not a crash guard against
    * today's behavior). CleaningSpec pins this path
    * bit-identical to [[scoreMilliSql]] when fed the synthetic weights
    * ([[syntheticWeights]]), so swapping in trained weights is the
    * declared one-line change, now with code and a gate behind it. */
  def scoreMilliWith(ta: org.apache.spark.sql.Column,
      weights: Map[Int, Long]): org.apache.spark.sql.Column = {
    require(weights.keys.forall(b => b >= 0 && b < 256),
      "scoreMilliWith: bucket ids must lie in [0, 256)")
    val wmap = map(weights.toSeq.sortBy(_._1).flatMap { case (b, w) =>
      Seq(lit(b.toLong), lit(w)) }: _*)
    aggregate(transform(ta, t => coalesce(
        try_element_at(wmap, bucketOf(t)), lit(0L))),
      lit(0L), (a, x) => a + x)
  }

  /** Collect a `(bucket, milli_weight)` frame into the scoring map —
    * the ONLY driver action of the production path, bounded at 256
    * rows by [[scoreMilliWith]]'s bucket-space check. */
  def weightMap(weights: DataFrame): Map[Int, Long] =
    weights.select(col("bucket").cast("int"),
        col("milli_weight").cast("long"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** The synthetic stand-in weights as a FRAME — exactly the weight
    * expression [[scoreMilliSql]] inlines (`pmod(bucket · 2654435761, 1001)
    * − 500`), materialized per bucket. Feeding this through the
    * production path must reproduce the DQ bit-for-bit (CleaningSpec);
    * a real deployment replaces this one frame with its trained
    * weights. */
  def syntheticWeights(s: SparkSession): DataFrame =
    s.range(256).select(col("id").cast("int").as("bucket"),
      (pmod(col("id") * lit(2654435761L), lit(1001L)) - lit(500L))
        .as("milli_weight"))

  /** Per-document scores via the production path — the frame a
    * deployment thresholds and lands. */
  def classifierScores(docsDf: DataFrame, weights: DataFrame): DataFrame = {
    val w = weightMap(weights)
    docsDf
      .filter(col("text").isNotNull)
      .withColumn("ta", split(lower(col("text")), "\\s+"))
      .select(col("lang"), col("doc_id"),
        scoreMilliWith(col("ta"), w).as("score_milli"))
  }

  val l34 = DQ(
    "l34_quality_classifier",
    (s, d) => {
      docs(s, d)
        .filter(col("text").isNotNull)
        .withColumn("ta", split(lower(col("text")), "\\s+"))
        .withColumn("score_milli", expr(scoreMilliSql))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("score_milli") > 0, 1L).otherwise(0L)).as("n_keep"),
          round(avg(col("score_milli"))).cast("long").as("avg_milli"),
          coalesce(sum(when(col("score_milli") > 0, col("doc_id"))), lit(0L))
            .as("kept_checksum"))
        .orderBy("lang")
    },
    Some(s"""WITH scored AS (
              SELECT lang, doc_id,
                $duckScoreSql AS score_milli
              FROM documents WHERE text IS NOT NULL)
            SELECT lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN score_milli > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_keep,
              CAST(ROUND(AVG(score_milli)) AS BIGINT) AS avg_milli,
              CAST(COALESCE(SUM(CASE WHEN score_milli > 0 THEN doc_id END), 0)
                AS BIGINT) AS kept_checksum
            FROM scored GROUP BY 1 ORDER BY lang"""))

  /** L37 — score-stratified corpus mixing (the CCNet recipe, Wenzek et
    * al. 2020 arXiv:1911.00359 §3.2: bucket documents by model score
    * into head/middle/tail and mix with per-bucket rates — head kept
    * whole, middle downsampled, tail heavily downsampled). Composes
    * l34's row-local scorer with l20's deterministic hash-draw
    * machinery ([[graft.functions.Sampling.stratifiedKeep]]): bucket
    * thresholds are integer-exact milli-scores (engines cannot disagree
    * on a boundary), the draw is the md5 prefix salted by the bucket
    * itself (independent draws per stratum, monotone in each rate), so
    * the ENTIRE mix decision is a per-row scan predicate — no shuffle
    * before the rollup, no RNG state, same rows chosen on any cluster
    * size, and re-mixing a bucket's rate rescales its sample
    * monotonically. Per (lang, bucket): docs/tokens in, docs/tokens
    * kept, kept-doc checksum. */
  val l37 = DQ(
    "l37_score_mixing",
    (s, d) => {
      docs(s, d)
        .filter(col("text").isNotNull)
        .withColumn("ta", split(lower(col("text")), "\\s+"))
        .withColumn("score_milli", expr(scoreMilliSql))
        .withColumn("bucket",
          when(col("score_milli") > 150L, "head")
            .when(col("score_milli") >= -150L, "middle")
            .otherwise("tail"))
        .withColumn("kept", graft.functions.Sampling.stratifiedKeep(
          col("doc_id"), col("bucket"),
          Seq("head" -> "zzzz", "middle" -> "8000", "tail" -> "2000")))
        .groupBy("lang", "bucket")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(col("ta")).cast("long")).as("n_tokens"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), size(col("ta")).cast("long")).otherwise(0L))
            .as("kept_tokens"),
          coalesce(sum(when(col("kept"), col("doc_id"))), lit(0L))
            .as("kept_checksum"))
        .orderBy("lang", "bucket")
    },
    Some(s"""WITH scored AS (
              SELECT lang, doc_id,
                string_split_regex(lower(text), '\\s+') AS ta,
                $duckScoreSql AS score_milli
              FROM documents WHERE text IS NOT NULL),
            bucketed AS (
              SELECT lang, doc_id, ta,
                CASE WHEN score_milli > 150 THEN 'head'
                     WHEN score_milli >= -150 THEN 'middle'
                     ELSE 'tail' END AS bucket
              FROM scored),
            drawn AS (
              SELECT lang, doc_id, ta, bucket,
                substring(md5(CAST(doc_id AS VARCHAR) || ':' || bucket), 1, 4)
                  < CASE bucket WHEN 'head' THEN 'zzzz'
                                WHEN 'middle' THEN '8000'
                                ELSE '2000' END AS kept
              FROM bucketed)
            SELECT lang, bucket,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(len(ta)) AS BIGINT) AS n_tokens,
              CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              CAST(SUM(CASE WHEN kept THEN len(ta) ELSE 0 END) AS BIGINT)
                AS kept_tokens,
              CAST(COALESCE(SUM(CASE WHEN kept THEN doc_id END), 0) AS BIGINT)
                AS kept_checksum
            FROM drawn GROUP BY 1, 2 ORDER BY lang, bucket"""))

  /** The planted BOILERPLATE corpus for [[l38]] (column `text3`), one
    * SQL expression used verbatim on both engines — the synthetic docs
    * are single unique lines, so cross-document repeated lines (the
    * thing line-level dedup exists for) must be planted:
    *  - every doc keeps its original word-soup line (df = 1, never
    *    boilerplate — no two stored texts are equal, checked);
    *  - `doc_id % 3 = 0` (~33% of docs) prepends a cookie-banner line;
    *  - `doc_id % 5 = 0` (~20%) appends a rights-reserved footer;
    *  - `doc_id % 50 = 0` (2%) appends a newsletter line — UNDER the
    *    6% document-frequency bar at every sf, pinning that the
    *    threshold spares merely-repeated lines. */
  private val boilerSql =
    """concat(
         CASE WHEN doc_id % 3 = 0
          THEN concat('please accept cookies to continue reading', chr(10))
          ELSE '' END,
         text,
         CASE WHEN doc_id % 5 = 0
          THEN concat(chr(10), 'all rights reserved by the site owner')
          ELSE '' END,
         CASE WHEN doc_id % 50 = 0
          THEN concat(chr(10), 'subscribe to our weekly newsletter today')
          ELSE '' END)"""

  /** [[l38]]'s pipeline as a reusable frame so the spec can pin the
    * hashed form against the string form. `hashed = true` is the 100 TB
    * wire shape (same discipline as l33's gram index): the df agg and
    * the mark join key on `xxhash64(line)` — 8 bytes on the shuffle
    * wire instead of whole boilerplate paragraphs — while the length
    * arithmetic still reads the row-local string. String keys are the
    * oracle form (DuckDB has no xxhash64). */
  private[operators] def lineDedupStats(dd0: DataFrame,
      hashed: Boolean = false): DataFrame = {
    val dd = dd0.filter(col("text").isNotNull)
      .withColumn("text3", expr(boilerSql))
    val total = dd.agg(count(lit(1)).as("n_total"))
    val key: Column => Column =
      if (hashed) l => xxhash64(l) else identity
    val lines = dd.select(col("lang"), col("doc_id"),
        explode(split(col("text3"), "\n")).as("line"))
      .withColumn("k", key(col("line")))
    // document frequency per line: partial-aggregable hash agg; the
    // boilerplate set that survives the 6% bar is tiny (it IS the
    // corpus' shared chrome), so AQE broadcasts the mark join's build
    // side at runtime. The 1-row crossJoin is the catalog's standard
    // scalar-count broadcast guard.
    val boiler = lines.groupBy("k")
      .agg(countDistinct("doc_id").as("df"))
      .crossJoin(broadcast(total))
      .filter(col("df") * 100 >= lit(6) * col("n_total"))
      .select(col("k"), lit(true).as("_bp"))
    val perDoc = lines.join(boiler, Seq("k"), "left")
      .groupBy("lang", "doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("_bp").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_bp").isNull, length(col("line")).cast("long"))
          .otherwise(0L)).as("chars_kept"),
        max(when(col("_bp"), 1L).otherwise(0L)).as("touched"))
    perDoc.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("touched").as("n_docs_touched"),
        sum("n_lines").as("n_lines"),
        sum("n_kept").as("n_lines_kept"),
        // chars of the doc rebuilt as concat_ws('\n', kept lines),
        // without materializing the rebuild: kept chars + separators
        sum(col("chars_kept") + greatest(col("n_kept") - 1L, lit(0L)))
          .as("n_chars_out"),
        coalesce(sum(when(col("touched") === 1L, col("doc_id"))), lit(0L))
          .as("touched_checksum"))
      .orderBy("lang")
  }

  /** L38 — corpus-level duplicated-line removal (the RefinedWeb
    * "line-wise corrections" / CCNet paragraph-hash dedup stage,
    * Penedo et al. 2023 arXiv:2306.01116 §3, Wenzek et al. 2020 §3.1):
    * a line appearing verbatim in ≥ 6% of documents is site chrome —
    * cookie banners, navigation, copyright footers — and is dropped
    * from EVERY document, the cross-document granularity that row-local
    * l31 (per-line rules) and whole-doc l1/l9 cannot see. The fraction
    * threshold (not an absolute count) is the scale-honest form: it
    * needs only the one corpus-count scalar, not a recalibration per
    * corpus size. Per language: docs, docs touched, lines in/kept,
    * chars of the rebuilt corpus, and the checksum of WHICH docs lost
    * lines.
    *
    * Scale shape: one explode → df hash agg (partial-aggregable; keyed
    * on `xxhash64(line)` in the wire form, spec-pinned ≡ string keys) →
    * the tiny surviving boilerplate set marks lines via an AQE-
    * broadcast equi-join → per-doc then per-lang rollups. No window, no
    * driver action, no unbounded state. */
  val l38 = DQ(
    "l38_line_dedup",
    (s, d) => lineDedupStats(docs(s, d)),
    Some(s"""WITH planted AS (
              SELECT lang, doc_id,
                $boilerSql AS text3
              FROM documents WHERE text IS NOT NULL),
            total AS (SELECT COUNT(*) AS n_total FROM planted),
            lines AS (
              SELECT lang, doc_id,
                unnest(string_split(text3, chr(10))) AS line
              FROM planted),
            boiler AS (
              SELECT line FROM
                (SELECT line, COUNT(DISTINCT doc_id) AS df
                 FROM lines GROUP BY 1), total
              WHERE df * 100 >= 6 * n_total),
            marked AS (
              SELECT l.lang, l.doc_id, l.line,
                (b.line IS NOT NULL) AS bp
              FROM lines l LEFT JOIN boiler b ON l.line = b.line),
            per_doc AS (
              SELECT lang, doc_id,
                COUNT(*) AS n_lines,
                SUM(CASE WHEN NOT bp THEN 1 ELSE 0 END) AS n_kept,
                SUM(CASE WHEN NOT bp THEN len(line) ELSE 0 END) AS chars_kept,
                MAX(CASE WHEN bp THEN 1 ELSE 0 END) AS touched
              FROM marked GROUP BY 1, 2)
            SELECT lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(touched) AS BIGINT) AS n_docs_touched,
              CAST(SUM(n_lines) AS BIGINT) AS n_lines,
              CAST(SUM(n_kept) AS BIGINT) AS n_lines_kept,
              CAST(SUM(chars_kept + CASE WHEN n_kept > 1 THEN n_kept - 1 ELSE 0 END)
                AS BIGINT) AS n_chars_out,
              CAST(COALESCE(SUM(CASE WHEN touched = 1 THEN doc_id END), 0)
                AS BIGINT) AS touched_checksum
            FROM per_doc GROUP BY 1 ORDER BY lang"""))

  /** [[l54]]'s blocklist. Two planted policy terms plus the corpus's
    * one natural rare token ('dup', ~5% of docs) so the filter
    * exercises BOTH paths: terms the fixture injects and a term the
    * generator already emits. At deployment this is the published
    * "Dirty, Naughty, Obscene…" list C4 uses (~2k terms) — still a
    * literal IN (codegen'd hash-set probe); past ~100k terms the probe
    * becomes a broadcast bloom filter, same row-local shape. */
  private[operators] val Blocklist = Seq("casino", "gambling", "dup")

  /** The planted POLICY corpus for [[l54]] (column `text2`): docs with
    * `doc_id % 5 = 0` gain a ' casino bonus' suffix, docs with
    * `doc_id % 9 = 0` a ' gambling' suffix — overlapping moduli so some
    * pages carry several hits; natural 'dup' occurrences stay as-is. */
  private val policySql =
    """concat(
         text,
         CASE WHEN doc_id % 5 = 0 THEN ' casino bonus' ELSE '' END,
         CASE WHEN doc_id % 9 = 0 THEN ' gambling' ELSE '' END)"""

  /** L54 — blocklist page filter (the "bad words" step of C4, Raffel
    * et al. 2020 §2.2: drop any page containing a word on the
    * blocklist — token-level match, not substring, so 'dupont' does
    * not hit 'dup'). Per source: pages in/flagged/kept, total hit
    * occurrences, chars surviving, and the dropped-page checksum
    * pinning WHICH pages died — the per-source view is the operational
    * one (policy risk concentrates by provenance).
    *
    * Scale shape: tokenization + hit count are one row-local HOF pass
    * (`filter` over the token array against a literal set — codegen'd,
    * no explode, no join, no shuffle before the 20-row rollup). The
    * blocklist never touches the data path as a frame: ≤ a few k terms
    * ride as a literal set; beyond that, a broadcast bloom filter —
    * either way zero shuffle. */
  val l54 = DQ(
    "l54_blocklist_filter",
    (s, d) => {
      // text IS NOT NULL on BOTH engines: Spark's concat propagates a
      // null text to a null page while DuckDB's skips null inputs, so
      // an unfiltered null-text doc would be classified by the oracle
      // and dropped from both arms by the plan
      docs(s, d).filter(col("text").isNotNull)
        .withColumn("text2", expr(policySql))
        .withColumn("hits",
          size(filter(VocabIndex.tokens(col("text2")),
            t => t.isin(Blocklist: _*))))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_pages"),
          sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_flagged"),
          sum(when(col("hits") === 0, 1L).otherwise(0L)).as("n_kept"),
          sum(col("hits").cast("long")).as("n_hits"),
          sum(when(col("hits") === 0, length(col("text2")).cast("long"))
            .otherwise(0L)).as("n_chars_kept"),
          coalesce(sum(when(col("hits") > 0, col("doc_id"))), lit(0L))
            .as("dropped_checksum"))
        .orderBy("source")
    },
    Some(s"""WITH planted AS (
              SELECT source, doc_id,
                $policySql AS text2
              FROM documents WHERE text IS NOT NULL),
            hits AS (
              SELECT source, doc_id, text2,
                len(list_filter(
                  regexp_extract_all(lower(text2),
                    '[a-z]+|[0-9]+|[^a-z0-9\\s]'),
                  t -> t IN ('casino', 'gambling', 'dup'))) AS hits
              FROM planted)
            SELECT source,
              CAST(COUNT(*) AS BIGINT) AS n_pages,
              CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_flagged,
              CAST(SUM(CASE WHEN hits = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_kept,
              CAST(SUM(hits) AS BIGINT) AS n_hits,
              CAST(SUM(CASE WHEN hits = 0 THEN len(text2) ELSE 0 END)
                AS BIGINT) AS n_chars_kept,
              CAST(COALESCE(SUM(CASE WHEN hits > 0 THEN doc_id END), 0)
                AS BIGINT) AS dropped_checksum
            FROM hits GROUP BY 1 ORDER BY source"""))

  val all: Seq[DQ] = Seq(l31, l32, l34, l37, l38, l54)
}
