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

  /** The adjacent weighted pair multiset of one rendered word —
    * overlapping positions count, exactly the per-iteration
    * enumeration the original full-rescan trainer ran. */
  private def pairsOf(seg: String): Array[String] = {
    val syms = seg.trim.split("  ")
    if (syms.length < 2) Array.empty[String]
    else Array.tabulate(syms.length - 1)(i => syms(i) + " " + syms(i + 1))
  }

  /** The sequential merge loop over the exported dictionary: up to `m`
    * merges in rank order, each `"l r"` (the space-joined symbol
    * pair). Stops early when no pair remains. Deterministic: argmax by
    * (weighted count desc, pair asc).
    *
    * INCREMENTAL pair-count maintenance (the published trainer trick —
    * Sennrich et al.'s reference implementation caches pair statistics
    * and updates only changed words): pair counts and a pair→words
    * inverted index are built once, and each merge rewrites ONLY the
    * words containing the merged pair — subtracting their old pair
    * multiset, applying the rewrite, adding the new one. Words without
    * the pair are untouched by [[applyMerge]] (the double-space
    * pattern cannot match), so their contributions are provably
    * unchanged and the maintained counts equal a full recount at every
    * iteration — BpeIndexSpec pins the merge list byte-identical to a
    * naive list-based reference on 100+ seeded dictionaries. Cost
    * drops from O(V·M) full rescans (a 1M-type dictionary at M = 32k
    * merges — the real deployment — was intractable) to O(V + Σ
    * affected-word rewrites): each merge pays only for the words it
    * changes, plus the argmax over live pairs. */
  def trainFromDict(dict: Seq[(String, Long)], m: Int): Seq[String] = {
    // counts are word FREQUENCIES — positive by construction at every
    // caller (they come from a groupBy count). The incremental
    // maintenance relies on it: a word's contribution to each of its
    // pairs is +cnt, so "count drained to zero" ≡ "no remaining
    // holder", which a zero- or negative-count entry would break
    // (the drained key would be re-read by a later zero-count holder).
    // Reject loudly instead of silently diverging from a full recount.
    require(dict.forall(_._2 > 0L),
      "trainFromDict: word counts must be positive frequencies")
    val words = dict.collect {
      case (t, c) if t.codePointCount(0, t.length) >= 2 => (render(t), c)
    }.toArray
    val segs = words.map(_._1)
    val cnts = words.map(_._2)
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    val occur = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.BitSet]
    var w = 0
    while (w < segs.length) {
      val ps = pairsOf(segs(w))
      var i = 0
      while (i < ps.length) {
        counts(ps(i)) = counts.getOrElse(ps(i), 0L) + cnts(w)
        i += 1
      }
      ps.distinct.foreach(p =>
        occur.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty) += w)
      w += 1
    }
    val merges = scala.collection.mutable.ArrayBuffer[String]()
    while (merges.size < m && counts.nonEmpty) {
      val pair = counts.minBy { case (p, n) => (-n, p) }._1
      merges += pair
      // every word holding the pair — and ONLY those — changes
      val affected = occur.getOrElse(pair,
        scala.collection.mutable.BitSet.empty).toArray
      for (wi <- affected) {
        val oldPs = pairsOf(segs(wi))
        oldPs.foreach { p =>
          val nv = counts(p) - cnts(wi)
          if (nv == 0L) counts.remove(p) else counts(p) = nv
        }
        oldPs.distinct.foreach { p =>
          occur.get(p).foreach { s => s -= wi; if (s.isEmpty) occur.remove(p) }
        }
        segs(wi) = applyMerge(segs(wi), pair)
        val newPs = pairsOf(segs(wi))
        newPs.foreach(p => counts(p) = counts.getOrElse(p, 0L) + cnts(wi))
        newPs.distinct.foreach(p =>
          occur.getOrElseUpdate(p,
            scala.collection.mutable.BitSet.empty) += wi)
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

  /** [[write]] plus the training-provenance stamp — merge ranks are
    * REBUILD-class (global pair counts), so retraction marks the list
    * stale instead of rewriting it ([[TrainMeta]]'s contract; the same
    * overload discipline as [[DsirIndex.write]]). */
  def write(spark: SparkSession, merges: Seq[String], corpus: DataFrame,
      base: String): Unit = {
    write(spark, merges, base)
    TrainMeta.stamp(corpus, base)
  }

  /** Read a release back as the rank-ordered merge list. The collect
    * is M rows — the artifact's own size. Fails loudly when a
    * retraction has marked the list stale since its training stamp
    * ([[TrainMeta.assertFresh]] — the [[DsirIndex.read]] gate);
    * `allowStale = true` opts in knowingly. */
  def read(spark: SparkSession, base: String,
      allowStale: Boolean = false): Seq[String] = {
    TrainMeta.assertFresh(spark, base, allowStale, "BPE merge list")
    spark.read.parquet(s"$base/merges")
      .orderBy("rank").select("pair").collect().map(_.getString(0)).toSeq
  }

  /** The segment-count dictionary as a literal tok→n_seg map column —
    * l57's broadcast-artifact shape ([[VocabIndex.idMap]]). */
  def segMapCol(m: Map[String, Long]): Column =
    if (m.isEmpty) map().cast("map<string,bigint>")
    else map(m.toSeq.flatMap { case (t, n) => Seq(lit(t), lit(n)) }: _*)

  /** Row-local application to a corpus: appends `n_toks` and `n_segs`
    * (sum of per-word segment counts; a word outside the map — only
    * sub-2-char words when the map came from the same corpus — falls
    * back to its character count, a char-grain segmentation). No
    * explode, no join: one map lookup per token inside the row. The
    * lookup is `try_element_at` — the [[CleaningQueries]] convention
    * for map access that must tolerate missing keys (since Spark 3.3,
    * SPARK-40066, plain `element_at` also returns NULL for missing MAP
    * keys even under ANSI — only array indexing throws — but the
    * try-form states the OOV fallback intent in the plan itself and is
    * robust to that behavior tightening again). */
  def applied(corpus: DataFrame, segMap: Column): DataFrame =
    corpus.filter(col("text").isNotNull)
      .withColumn("_bpe_toks", VocabIndex.tokens(col("text")))
      .withColumn("n_toks", size(col("_bpe_toks")).cast("long"))
      .withColumn("n_segs", when(size(col("_bpe_toks")) === 0, 0L).otherwise(
        aggregate(
          transform(col("_bpe_toks"), t =>
            coalesce(try_element_at(segMap, t), length(t).cast("long"))),
          lit(0L), (acc, x) => acc + x)))
      .drop("_bpe_toks")
}
