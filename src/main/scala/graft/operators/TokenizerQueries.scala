package graft.operators

import graft.{DQ, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tokenizer-training gate query — the [[BpeIndex]] lifecycle under
  * the driver's oracle. l79 trains an M-merge BPE tokenizer from the
  * corpus (ONE corpus-scale word-count pass, then the driver-side
  * merge loop over the V-row dictionary — the published tractability
  * split, see [[BpeIndex]]), persists the merge list, reads it BACK
  * from the artifact, and applies it row-locally to the corpus,
  * reporting per-language token and segment counts plus the trained
  * release's fingerprint.
  *
  * The DuckDB oracle REPLAYS THE TRAINER, not just the application:
  * the merge loop is unrolled as M chained CTE iterations (pair
  * counts → (count desc, pair asc) argmax → double-space string
  * rewrite — the exact semantics [[BpeIndex.trainFromDict]] runs and
  * BpeIndexSpec pins against a naive list-based reference), so
  * `merges_fp` — md5 of the rank-ordered merge list, constant across
  * rows — hash-checks the TRAINING while `n_segs` checks the
  * application. Assumes the corpus vocabulary carries at least M
  * distinct symbol pairs (true at every shipped SF: 30 multi-char
  * words, ~120 initial pairs); a thinner corpus would need the
  * early-stop guard the Scala trainer already has.
  */
object TokenizerQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Merge budget M — small enough that the oracle's unrolled replay
    * stays readable, large enough that merges chain (later merges
    * consume earlier merges' output symbols). */
  val Merges = 8

  /** Per-JVM nonce ([[ReleaseQueries.nonce]]'s argument): concurrent
    * driver invocations must not cross-wipe each other's artifacts. */
  private def gateBase(d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_bpe_gate_${ReleaseQueries.nonce}_" +
      d.replaceAll("[^A-Za-z0-9.]", "_")

  /** One unrolled trainer iteration: pair counts over the previous
    * dictionary state, the deterministic argmax, the rewrite. */
  private def iterSql(i: Int): String =
    s"""pc$i AS MATERIALIZED (
              SELECT pair, SUM(cnt) AS n_occ FROM (
                SELECT cnt, unnest(list_transform(range(1, len(ss)),
                  j -> ss[j] || ' ' || ss[j + 1])) AS pair
                FROM (SELECT cnt, string_split(trim(seg), '  ') AS ss
                      FROM d${i - 1}))
              GROUP BY 1),
            m$i AS MATERIALIZED (SELECT pair FROM pc$i ORDER BY n_occ DESC, pair LIMIT 1),
            d$i AS MATERIALIZED (
              SELECT tok, cnt, replace(seg,
                ' ' || replace((SELECT pair FROM m$i), ' ', '  ') || ' ',
                ' ' || replace((SELECT pair FROM m$i), ' ', '') || ' ') AS seg
              FROM d${i - 1}),"""

  private val fpConcat =
    (1 to Merges).map(i => s"(SELECT pair FROM m$i)").mkString(" || '|' || ")

  private val oracle =
    s"""WITH dict AS MATERIALIZED (
              SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(regexp_extract_all(lower(text),
                  '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS tok
                FROM documents WHERE text IS NOT NULL)
              GROUP BY 1),
            d0 AS MATERIALIZED (
              SELECT tok, cnt,
                '  ' || array_to_string(list_transform(range(1, len(tok) + 1),
                  i -> substring(tok, i, 1)), '  ') || '  ' AS seg
              FROM dict WHERE len(tok) >= 2),
            ${(1 to Merges).map(iterSql).mkString("\n            ")}
            segmap AS (
              SELECT tok,
                CAST(len(string_split(trim(seg), '  ')) AS BIGINT) AS n_seg
              FROM d$Merges),
            tk AS (
              SELECT lang, unnest(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS tok
              FROM documents WHERE text IS NOT NULL)
            SELECT lang,
              CAST(COUNT(*) AS BIGINT) AS n_toks,
              CAST(SUM(COALESCE(s.n_seg, len(t.tok))) AS BIGINT) AS n_segs,
              CASE WHEN COUNT(*) > 0 THEN
                CAST(ROUND(SUM(COALESCE(s.n_seg, len(t.tok))) * 1000.0
                  / COUNT(*)) AS BIGINT)
              END AS segs_per_tok_milli,
              md5($fpConcat) AS merges_fp
            FROM tk t LEFT JOIN segmap s ON t.tok = s.tok
            GROUP BY 1 ORDER BY lang"""

  val l79 = DQ(
    "l79_bpe_tokenizer",
    (s, d) => {
      val base = gateBase(d)
      val p = new org.apache.hadoop.fs.Path(base)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val dd = docs(s, d)
      // the one corpus-scale pass; V-row export (bounded-collect
      // discipline, VocabIndex.idMap's argument)
      val dict = BpeIndex.wordDict(dd).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
      BpeIndex.write(s, BpeIndex.trainFromDict(dict, Merges), base)
      // apply FROM the persisted artifact — the release lifecycle,
      // not the in-memory shortcut
      val merges = BpeIndex.read(s, base)
      val segMap = BpeIndex.segmentMap(dict.map(_._1), merges)
      BpeIndex.applied(dd, BpeIndex.segMapCol(segMap))
        .groupBy("lang")
        .agg(sum("n_toks").as("n_toks"), sum("n_segs").as("n_segs"))
        .withColumn("segs_per_tok_milli", when(col("n_toks") > 0L,
          round(col("n_segs") * lit(1000.0) / col("n_toks")).cast("long")))
        .withColumn("merges_fp", lit(BpeIndex.mergesFp(merges)))
        .orderBy("lang")
    },
    Some(oracle))

  val all: Seq[DQ] = Seq(l79)
}
