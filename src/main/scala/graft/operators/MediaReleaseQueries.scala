package graft.operators

import graft.{DQ, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media-release-lifecycle gate query — r1's discipline
  * ([[ReleaseQueries]]) applied to [[MediaReleaseFlow]], the last major
  * composition without an oracle-gated row (the text lifecycle got
  * r1/r2 in round 14; the media lifecycle had spec-only coverage).
  * r3 routes a PLANTED media shard through the FULL lifecycle — init
  * the byte-hash + perceptual-hash artifacts from a corpus slice,
  * release shard 1, release shard 2 against the APPENDED artifacts —
  * and returns the audit matrix ([[MediaReleaseFlow.audit]] per
  * release). Oracle discipline is l80's: every byte-level and
  * header-level arm replays GENUINELY in DuckDB hex (the payload IS
  * sha256 hex by construction — l13/l58's move), the one non-portable
  * arm (the perceptual signature) is construction-pinned:
  *
  *  - `corrupt` — replayed: payload shorter than the 5-byte header
  *    (hex length < 10), [[graft.streaming.MediaAdmission]]'s
  *    `decodable` rule verbatim;
  *  - `corpus_duplicate` — replayed: byte identity (the payload hex
  *    string) against the landed set — corpus for release 1, corpus ∪
  *    release-1 admissions for release 2, so the oracle also checks
  *    the byte-index APPEND worked;
  *  - `too_small` / `extreme_aspect` / `admit` — replayed: l58's
  *    header rules in hex ([[LlmQueries.MediaMinDim]] /
  *    [[LlmQueries.MediaAspectMax]]), in the decision chain's exact
  *    precedence;
  *  - `media_duplicate` — construction-pinned, l53/l80's argument:
  *    the planted perceptual copy overwrites ONE byte (the first) of
  *    an indexed payload, which moves ≤ 2 histogram bins and so flips
  *    ≤ 2 of the 64 signature bits (the histogram mean is constant
  *    1/64), and ≤ 3 differing bits cannot dodge all four 16-bit
  *    bands (pigeonhole) — a GUARANTEED flag, not probabilistic; and
  *    the corpus measures ZERO natural ≤ 3-Hamming pairs at every
  *    shipped SF (l80's gate would desynchronize otherwise), so no
  *    natural row can take the label. If the overwritten first byte
  *    was ALREADY 0x7F the "copy" is byte-identical instead — and the
  *    genuinely-replayed byte arm labels it `corpus_duplicate` on
  *    BOTH sides, so the pin cannot drift even then (r1's wsVariant
  *    argument on the media column).
  *
  * Shard classes (`o` = max(doc_id)+1; class k's ids = source + k·o,
  * all ranges disjoint from each other and from every indexed id):
  * release 1 — (1) byte copies of corpus items → corpus_duplicate,
  * (2) first-byte-overwritten copies of corpus items →
  * media_duplicate, (3) 3-byte payload prefixes → corrupt, (4)
  * held-out naturals → the replayed header chain (too_small /
  * extreme_aspect / admit; the synthesize header's uniform 16-bit
  * dims split them ~⅛ / ~¼ / ~⅝ — differential at every SF).
  * Release 2 — (5) byte copies and (6) first-byte-overwritten copies
  * OF RELEASE-1 ADMISSIONS, which land `corpus_duplicate` /
  * `media_duplicate` only if release 1's appends actually reached the
  * byte and perceptual artifacts.
  *
  * Scale note: the planted construction is fixture machinery (per-row
  * byte ops at gate scale); the lifecycle under test —
  * [[MediaReleaseFlow.init]]/[[MediaReleaseFlow.release]] — is the
  * 100 TB composition itself (partition-local signatures, hash
  * semi-join, band equi-joins, artifact appends), audited in
  * MediaReleaseFlowSpec and the plan specs. Reference analogue: the
  * admission/quarantine split of the ingest consumer on a binary
  * column (reference consumer is a 0-byte stub; this engine's
  * realized surface).
  */
object MediaReleaseQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  private def gateBase(d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_media_release_gate_" +
      s"${ReleaseQueries.nonce}_${d.replaceAll("[^A-Za-z0-9.]", "_")}"

  /** The corpus/held-out split: 75% of docs by id residue form the
    * landed media corpus, the rest are shard material — replayed
    * verbatim in the oracle. */
  private def inCorpus = col("doc_id") % 4 < 3

  /** First byte overwritten with 0x7F — the minimal "re-encoded copy"
    * (l53/l80's perturbation; see the object scaladoc for the
    * already-0x7F fallthrough). */
  private val perturbed = concat(lit(Array[Byte](0x7F.toByte)),
    expr("substring(payload, 2, 31)"))

  val r3 = DQ(
    "r3_media_release_roundtrip",
    (s, d) => {
      val base = gateBase(d)
      val p = new org.apache.hadoop.fs.Path(base)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val allm = docs(s, d)
        .select(col("doc_id").cast("long").as("doc_id"),
          graft.functions.Multimodal.payloadCol(col("doc_id")).as("payload"))
      val corpus = allm.filter(inCorpus)
      val held = allm.filter(!inCorpus)
      val off = LlmQueries.plantedOffset(allm, "doc_id")
      def cls(src: DataFrame, k: Int,
          payload: org.apache.spark.sql.Column) =
        src.crossJoin(broadcast(off))
          .select((col("doc_id") + col("_off") * k).as("doc_id"),
            payload.as("payload"))
      val c1 = cls(corpus.filter(col("doc_id") % 5 === 0), 1, col("payload"))
      val c2 = cls(corpus.filter(col("doc_id") % 5 === 1), 2, perturbed)
      val c3 = cls(corpus.filter(col("doc_id") % 5 === 2), 3,
        expr("substring(payload, 1, 3)"))
      val c4 = cls(held, 4, col("payload"))
      val shard1 = c1.unionByName(c2).unionByName(c3).unionByName(c4)
      MediaReleaseFlow.init(corpus, base)
      val d1 = MediaReleaseFlow.release(s, shard1, base)
      // release 2 probes the APPENDED artifacts: copies of release-1
      // admissions must now read as landed corpus (byte arm) /
      // indexed signatures (perceptual arm)
      val admitted = d1.filter(col("decision") === "admit")
        .select("doc_id", "payload")
      val c5 = cls(admitted, 2, col("payload"))
      val c6 = cls(admitted, 3, perturbed)
      val d2 = MediaReleaseFlow.release(s, c5.unionByName(c6), base)
      MediaReleaseFlow.audit(d1).withColumn("release", lit(1L))
        .unionByName(MediaReleaseFlow.audit(d2).withColumn("release", lit(2L)))
        .select("release", "decision", "n_items", "doc_id_sum")
        .orderBy("release", "decision")
    },
    Some(s"""WITH off AS (
              SELECT COALESCE(MAX(doc_id), -1) + 1 AS o FROM documents),
            m AS (
              SELECT doc_id, sha256('media:' || doc_id) AS px,
                doc_id % 4 < 3 AS in_corpus
              FROM documents),
            s1 AS (
              SELECT doc_id + o AS doc_id, px, 1 AS kind
              FROM m, off WHERE in_corpus AND doc_id % 5 = 0
              UNION ALL
              SELECT doc_id + 2 * o, '7f' || substr(px, 3, 62), 2
              FROM m, off WHERE in_corpus AND doc_id % 5 = 1
              UNION ALL
              SELECT doc_id + 3 * o, substr(px, 1, 6), 3
              FROM m, off WHERE in_corpus AND doc_id % 5 = 2
              UNION ALL
              SELECT doc_id + 4 * o, px, 4
              FROM m, off WHERE NOT in_corpus),
            landed1 AS (SELECT px FROM m WHERE in_corpus),
            dec1 AS (
              SELECT doc_id, px, kind,
                CASE
                  WHEN len(px) < 10 THEN 'corrupt'
                  WHEN px IN (SELECT px FROM landed1)
                    THEN 'corpus_duplicate'
                  WHEN kind = 2 THEN 'media_duplicate'
                  WHEN CAST(concat('0x', substr(px, 1, 4)) AS INTEGER)
                      < ${LlmQueries.MediaMinDim}
                    OR CAST(concat('0x', substr(px, 5, 4)) AS INTEGER)
                      < ${LlmQueries.MediaMinDim} THEN 'too_small'
                  WHEN GREATEST(
                      CAST(concat('0x', substr(px, 1, 4)) AS INTEGER),
                      CAST(concat('0x', substr(px, 5, 4)) AS INTEGER)) >
                    ${LlmQueries.MediaAspectMax} * LEAST(
                      CAST(concat('0x', substr(px, 1, 4)) AS INTEGER),
                      CAST(concat('0x', substr(px, 5, 4)) AS INTEGER))
                    THEN 'extreme_aspect'
                  ELSE 'admit' END AS decision
              FROM s1),
            adm AS (
              SELECT doc_id, px FROM dec1 WHERE decision = 'admit'),
            landed2 AS (
              SELECT px FROM landed1 UNION ALL SELECT px FROM adm),
            s2 AS (
              SELECT doc_id + 2 * o AS doc_id, px, 1 AS kind FROM adm, off
              UNION ALL
              SELECT doc_id + 3 * o, '7f' || substr(px, 3, 62), 2
              FROM adm, off),
            dec2 AS (
              SELECT doc_id,
                CASE
                  WHEN px IN (SELECT px FROM landed2)
                    THEN 'corpus_duplicate'
                  ELSE 'media_duplicate' END AS decision
              FROM s2)
            SELECT CAST(1 AS BIGINT) AS release, decision,
              CAST(COUNT(*) AS BIGINT) AS n_items,
              CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
            FROM dec1 GROUP BY 2
            UNION ALL
            SELECT CAST(2 AS BIGINT), decision,
              CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
            FROM dec2 GROUP BY 2
            ORDER BY release, decision"""))

  val all: Seq[DQ] = Seq(r3)
}
