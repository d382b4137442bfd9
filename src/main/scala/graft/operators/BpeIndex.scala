package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED trained BPE tokenizer — the end-to-end artifact the
  * tokenizer story was missing: l70 computes the first merge
  * ITERATION's candidate table, l41/l63/l75 audit vocabularies, l57
  * id-tokenizes against one — this object TRAINS the merge list
  * (Sennrich et al. 2016, arXiv:1508.07909 §3.2), persists it as a
  * versioned release artifact (the [[VocabIndex]] lifecycle: immutable
  * once released, a new corpus trains a new directory), and applies it
  * through the same broadcast-map shape as l57's id path.
  *
  * The published tractability split, realized (l70's scaladoc makes
  * the argument; this is the code): only [[wordDict]] touches
  * corpus-scale data — ONE partial-aggregable token pass down to the
  * V-row weighted word dictionary. The merge LOOP is sequential by
  * definition (merge i+1's counts depend on merge i's rewrite), so it
  * runs driver-side over the exported V rows — V is the vocabulary,
  * Heaps-bounded, never the corpus; the same bounded-collect
  * discipline as [[VocabIndex.idMap]]. Application is again
  * corpus-scale but ROW-LOCAL: segmentation is a pure function of the
  * WORD, so the per-word segment count is precomputed on the V rows
  * and shipped as a literal map column — no explode, no join, no
  * token-grain shuffle.
  *
  * Merge semantics (one definition, pinned by BpeIndexSpec against a
  * naive list-based reference): per iteration, count every adjacent
  * symbol position weighted by word count (overlapping positions
  * count, as in l70's first-iteration table), pick the (count desc,
  * pair asc) argmax, and rewrite every word by merging occurrences
  * LEFTMOST-FIRST, non-overlapping — canonical BPE. Words are
  * rendered as double-space-joined symbol strings with double-space
  * padding; a merge is then ONE `String.replace` whose pattern keeps
  * a single space on each side (` l  r ` → ` lr `), which preserves
  * the double-space invariant AND lets immediately-adjacent
  * occurrences (`a b a b`) both merge in the same pass — the
  * single-delimiter form silently drops the second one. Symbols never
  * contain spaces (multi-char tokens are `[a-z]+|[0-9]+` runs under
  * [[VocabIndex.TokRe]]), so the pattern cannot match across symbol
  * boundaries. The same render/replace is expressible in ANSI SQL,
  * which is what makes l79's DuckDB oracle an unrolled genuine replay
  * of the trainer rather than a construction pin.
  */
object BpeIndex {

  /** The corpus-scale pass: weighted word dictionary (tok, cnt) under
    * the catalog's shared pre-tokenizer. One hash agg, map-side
    * partials; everything after runs on its V-row result. */
  def wordDict(corpus: DataFrame): DataFrame =
    corpus.filter(col("text").isNotNull)
      .select(explode(VocabIndex.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** A word as its initial symbol string: double-space-joined
    * characters, double-space padded. Only >= 2-codepoint words carry
    * pairs; under [[VocabIndex.TokRe]] those are pure ASCII runs, so
    * per-char splitting is unambiguous. */
  private def render(tok: String): String =
    "  " + tok.toCharArray.mkString("  ") + "  "

  private def applyMerge(seg: String, pair: String): String =
    seg.replace(" " + pair.replace(" ", "  ") + " ",
      " " + pair.replace(" ", "") + " ")

  /** The sequential merge loop over the exported dictionary: up to `m`
    * merges in rank order, each `"l r"` (the space-joined symbol
    * pair). Stops early when no pair remains. Deterministic: argmax by
    * (weighted count desc, pair asc). */
  def trainFromDict(dict: Seq[(String, Long)], m: Int): Seq[String] = {
    var segs = dict.collect {
      case (t, c) if t.codePointCount(0, t.length) >= 2 => (render(t), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer[String]()
    var done = false
    while (merges.size < m && !done) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      for ((s, c) <- segs) {
        val syms = s.trim.split("  ")
        var i = 0
        while (i < syms.length - 1) {
          val p = syms(i) + " " + syms(i + 1)
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val pair = counts.minBy { case (p, n) => (-n, p) }._1
        merges += pair
        segs = segs.map { case (s, c) => (applyMerge(s, pair), c) }
      }
    }
    merges.toSeq
  }

  /** Segment a single word under a trained merge list (rank order). */
  def segment(tok: String, merges: Seq[String]): Seq[String] = {
    if (tok.codePointCount(0, tok.length) < 2) return Seq(tok)
    var s = render(tok)
    for (p <- merges) s = applyMerge(s, p)
    s.trim.split("  ").toSeq
  }

  /** Per-word segment counts over the V-row dictionary — the
    * driver-side apply pass whose result broadcasts. */
  def segmentMap(toks: Seq[String], merges: Seq[String]): Map[String, Long] =
    toks.map(t => t -> segment(t, merges).size.toLong).toMap

  /** The trained tokenizer's release fingerprint: md5 of the
    * '|'-joined merge list — the value l79 pins in every output row so
    * the oracle checks the TRAINING, not just the application. */
  def mergesFp(merges: Seq[String]): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(merges.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Persist a trained release: (rank, pair, merged) — M rows, one
    * file, the whole artifact (merge lists are KBs even for 100k-merge
    * production tokenizers). */
  def write(spark: SparkSession, merges: Seq[String], base: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case (p, r) => (r.toLong, p, p.replace(" ", "")) }
      .toDF("rank", "pair", "merged")
      .coalesce(1).sortWithinPartitions("rank")
      .write.mode("overwrite").parquet(s"$base/merges")
  }

  /** Read a release back as the rank-ordered merge list. The collect
    * is M rows — the artifact's own size. */
  def read(spark: SparkSession, base: String): Seq[String] =
    spark.read.parquet(s"$base/merges")
      .orderBy("rank").select("pair").collect().map(_.getString(0)).toSeq

  /** The segment-count dictionary as a literal tok→n_seg map column —
    * l57's broadcast-artifact shape ([[VocabIndex.idMap]]). */
  def segMapCol(m: Map[String, Long]): Column =
    if (m.isEmpty) map().cast("map<string,bigint>")
    else map(m.toSeq.flatMap { case (t, n) => Seq(lit(t), lit(n)) }: _*)

  /** Row-local application to a corpus: appends `n_toks` and `n_segs`
    * (sum of per-word segment counts; a word outside the map — only
    * sub-2-char words when the map came from the same corpus — falls
    * back to its character count, a char-grain segmentation). No
    * explode, no join: one map lookup per token inside the row. */
  def applied(corpus: DataFrame, segMap: Column): DataFrame =
    corpus.filter(col("text").isNotNull)
      .withColumn("_bpe_toks", VocabIndex.tokens(col("text")))
      .withColumn("n_toks", size(col("_bpe_toks")).cast("long"))
      .withColumn("n_segs", when(size(col("_bpe_toks")) === 0, 0L).otherwise(
        aggregate(
          transform(col("_bpe_toks"), t =>
            coalesce(element_at(segMap, t), length(t).cast("long"))),
          lit(0L), (acc, x) => acc + x)))
      .drop("_bpe_toks")
}
