package graft.operators

import graft.Session
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cleaning operators (l31 C4 line rules, l32 PII scrub): rule-level
  * pins on the planted corpus the DQs construct — the oracle hashes the
  * rollup; these tests pin WHY individual documents land where they do. */
class CleaningSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  test("l31: planted page classes behave per rule — lorem pages die, " +
      "sentence-planted pages survive, plain word soup keeps nothing") {
    val rows = CleaningQueries.l31.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalPages = rows.map(_.getAs[Long]("n_pages")).sum
    val keptPages = rows.map(_.getAs[Long]("n_pages_kept")).sum
    // kept ⊂ pages strictly: %10 lorem docs and unplanted docs must die
    assert(keptPages > 0 && keptPages < totalPages)
    // kept pages contribute at most their 3 planted sentence lines
    val keptLines = rows.map(_.getAs[Long]("n_lines_kept")).sum
    assert(keptLines <= keptPages * 3)
    // cleaning never grows text
    assert(rows.forall(r =>
      r.getAs[Long]("n_chars_out") <= r.getAs[Long]("n_chars_in")))
  }

  test("l31: a page kept by the rules loses its unpunctuated lines — " +
      "doc 4 (sentence-planted, not lorem, not javascript) keeps exactly 3") {
    // doc 4: %4=0 → three planted '.'-terminated 6-word lines; %10≠0,
    // %6≠0 → no page kill, no javascript line. The original word-soup
    // line has no terminal punctuation and must be dropped.
    val doc = graft.Tables.documents(spark, sf).filter(col("doc_id") === 4)
      .selectExpr("size(split(text, ' ')) AS words").collect().head
    assume(doc.getAs[Int]("words") >= 18, "fixture doc too short")
    val kept = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") === 4)
      .withColumn("text2", expr(CleaningQueries.linedSqlForTest))
      .selectExpr(
        """size(filter(split(text2, '\n'), l ->
             substring(l, -1, 1) IN ('.', '!', '?', '"')
             AND size(split(l, ' ')) >= 5
             AND NOT contains(lower(l), 'javascript'))) AS n""")
      .collect().head.getAs[Int]("n")
    assert(kept === 3)
  }

  test("l32: redaction is idempotent and complete (n_residual pinned 0)") {
    val rows = CleaningQueries.l32.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_residual") === 0L),
      "PII survived redaction")
    // every planted kind was found somewhere
    assert(rows.map(_.getAs[Long]("docs_email")).sum > 0)
    assert(rows.map(_.getAs[Long]("docs_phone")).sum > 0)
    assert(rows.map(_.getAs[Long]("docs_ip")).sum > 0)
    // redaction shrinks text overall (tags are shorter than the PII)
    assert(rows.map(_.getAs[Long]("char_delta")).sum > 0)
  }

  test("l31/l32 plan shape: row-local scans — the only exchange is the " +
      "5-row language rollup's, and the scan prunes to the used columns") {
    for ((name, fn) <- Seq("l31" -> CleaningQueries.l31.fn,
        "l32" -> CleaningQueries.l32.fn)) {
      val df = fn(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // row-local means NO operator that shuffles per-doc work: the
      // only exchanges are the lang rollup's and the 5-row sort's
      // (counting on the string is unreliable — AQE prints initial and
      // final trees — so pin the absence of every shuffle-BEARING
      // operator class instead)
      for (bad <- Seq("Generate", "SortMergeJoin", "BroadcastHashJoin",
          "ShuffledHashJoin", "Window", "CartesianProduct"))
        assert(!plan.contains(bad), s"$name plans $bad — not row-local")
      // column pruning: the scan must not read doc text's siblings it
      // never uses (n_chars for l32; source for both)
      val scanLine = plan.linesIterator.find(_.contains("documents.parquet"))
        .getOrElse(fail(s"$name: no documents scan in plan"))
      assert(!scanLine.contains("source"), s"$name scan reads unused columns")
    }
  }

  test("l34: hashed-feature scoring is deterministic, content-sensitive, " +
      "and the keep rule is the score's sign") {
    val a = CleaningQueries.l34.fn(spark, sf).collect()
    val b = CleaningQueries.l34.fn(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "same corpus must score identically")
    assert(a.nonEmpty)
    // the classifier genuinely splits the corpus (not all-keep/all-drop)
    val (n, k) = (a.map(_.getAs[Long]("n_docs")).sum,
      a.map(_.getAs[Long]("n_keep")).sum)
    assert(k > 0 && k < n, s"degenerate split: $k of $n kept")
    // kept_checksum only sums docs the sign rule kept: re-derive one
    // language's checksum from a driver-side rescore
    import spark.implicits._
    val docsEn = graft.Tables.documents(spark, sf)
      .filter(col("lang") === "en").select("doc_id", "text")
      .as[(Long, String)].collect()
    def hash(t: String): Long =
      t.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000003L)
    def weight(t: String): Long = (hash(t) % 256L) * 2654435761L % 1001L - 500L
    val expect = docsEn.filter { case (_, text) =>
      text.toLowerCase.split("\\s+").map(weight).sum > 0
    }.map(_._1).sum
    val gotEn = a.find(_.getString(0) == "en").get.getAs[Long]("kept_checksum")
    assert(gotEn === expect, "driver-side rescore disagrees with the plan")
  }

  test("l34 production weight path: scoring against the synthetic weights " +
      "AS A FRAME is bit-identical to the inline expression, and a " +
      "changed weight moves exactly the docs touching its bucket") {
    val docs = graft.Tables.documents(spark, sf)
    // inline (DQ) per-doc scores, recomputed through the DQ's own expr
    val inline = docs.filter(col("text").isNotNull)
      .withColumn("ta", split(lower(col("text")), "\\s+"))
      .select(col("doc_id"),
        expr(CleaningQueries.scoreMilliSql).as("score_milli"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // production: same weights fed as a (bucket, milli_weight) frame
    val prod = CleaningQueries.classifierScores(docs,
      CleaningQueries.syntheticWeights(spark))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(prod === inline && prod.nonEmpty,
      "weight-frame path must reproduce the inline path bit-for-bit")
    // swap discipline: zeroing ONE bucket changes only scores of docs
    // with ≥1 token hashing into it, by exactly that bucket's weight
    val wm = CleaningQueries.weightMap(CleaningQueries.syntheticWeights(spark))
    // zero the bucket of a token the corpus PROVABLY contains
    def tokHash(t: String): Long =
      t.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000003L)
    val toks = docs.filter(col("text").isNotNull)
      .select(lower(col("text"))).head.getString(0).split("\\s+")
    val b0 = toks.map(t => (tokHash(t) % 256L).toInt)
      .find(b => wm(b) != 0L)
      .getOrElse(fail("every token of the first doc weighs 0 — fixture broken"))
    val zeroed = CleaningQueries.classifierScores(docs,
      CleaningQueries.syntheticWeights(spark)
        .withColumn("milli_weight",
          when(col("bucket") === b0, 0L).otherwise(col("milli_weight"))))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val deltas = prod.keySet.map(id => zeroed(id) - prod(id))
    val w0 = wm(b0)
    assert(deltas.exists(_ != 0L), s"bucket $b0 hits no doc — fixture too thin")
    assert(deltas.forall(d => d % w0 == 0L),
      s"every delta must be a multiple of the zeroed weight $w0: $deltas")
  }

  test("l37 score-mixing: buckets are non-degenerate, the head bucket " +
      "keeps everything, and every kept count is draw-bounded") {
    val rows = CleaningQueries.l37.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val buckets = rows.map(_.getString(1)).distinct.toSet
    assert(buckets.size >= 2, s"degenerate bucketing: $buckets")
    for (r <- rows) {
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("n_tokens"))
      if (r.getString(1) == "head")
        assert(r.getAs[Long]("n_kept") === r.getAs[Long]("n_docs"),
          "head rate is 'zzzz' — must keep every doc")
    }
    // the mix genuinely downsamples somewhere (middle 50% / tail 12.5%)
    assert(rows.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_docs")))
  }

  test("l38 line dedup: over-threshold chrome dies everywhere, the rare " +
      "newsletter line and every unique word-soup line survive") {
    val docs = graft.Tables.documents(spark, sf)
    val rows = CleaningQueries.l38.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val touched = rows.map(_.getAs[Long]("n_docs_touched")).sum
    val nLines = rows.map(_.getAs[Long]("n_lines")).sum
    val kept = rows.map(_.getAs[Long]("n_lines_kept")).sum
    // exactly the planted cookie (%3) + footer (%5) occurrences die:
    // their df (~33% / ~20%) clears the 6% bar; the %50 newsletter
    // line (2%) and each unique soup line (df=1) stay
    val expectDropped = docs.filter(col("doc_id") % 3 === 0).count() +
      docs.filter(col("doc_id") % 5 === 0).count()
    assert(nLines - kept === expectDropped,
      s"dropped ${nLines - kept}, planted over-threshold $expectDropped")
    // touched = docs carrying either planted chrome line
    val expectTouched = docs
      .filter(col("doc_id") % 3 === 0 || col("doc_id") % 5 === 0).count()
    assert(touched === expectTouched)
    assert(touched < nDocs, "some docs must be chrome-free")
    // every doc keeps at least its unique soup line
    assert(kept >= nDocs)
  }

  test("l38: hashed (xxhash64 wire) form ≡ string-key form") {
    val docs = graft.Tables.documents(spark, sf)
    val s = CleaningQueries.lineDedupStats(docs).collect()
    val h = CleaningQueries.lineDedupStats(docs, hashed = true).collect()
    assert(s.map(_.toString).sorted.toSeq === h.map(_.toString).sorted.toSeq)
  }

  test("l32: the planted PII strings match their patterns exactly once each") {
    import spark.implicits._
    val probes = Seq(
      " contact user35@example.com now" -> ("<EMAIL>", 1, 0, 0),
      " call +1 (555) 010-0042" -> ("<PHONE>", 0, 1, 0),
      " from 10.0.35.7" -> ("<IP>", 0, 0, 1),
      "no pii in this fragment at all" -> ("", 0, 0, 0))
    for ((text, (tag, ne, np, ni)) <- probes) {
      val r = Seq(text).toDF("text2")
        .select(
          regexp_count(col("text2"), lit(CleaningQueries.emailReForTest)).as("e"),
          regexp_count(col("text2"), lit(CleaningQueries.phoneReForTest)).as("p"),
          regexp_count(col("text2"), lit(CleaningQueries.ipReForTest)).as("i"))
        .collect().head
      assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((ne, np, ni)), text)
      if (tag.nonEmpty) {
        val red = Seq(text).toDF("t").select(
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            lit(CleaningQueries.emailReForTest), lit("<EMAIL>")),
            lit(CleaningQueries.phoneReForTest), lit("<PHONE>")),
            lit(CleaningQueries.ipReForTest), lit("<IP>")).as("r"))
          .as[String].collect().head
        assert(red.contains(tag), s"$text → $red")
      }
    }
  }

  test("l54: blocklist matching is token-level, not substring — " +
      "'dupont'/'duplicate' never hit 'dup', the bare token does") {
    import spark.implicits._
    val hits = Seq(
      "dupont industries quarterly report" -> 0,
      "a duplicate row in the scan" -> 0,
      "a dup row in the scan" -> 1,
      "casino casino night" -> 2,
      "Gambling ads and a CASINO" -> 2, // case-folded before matching
      "clean page about sort merge join" -> 0)
      .toDF("text2", "want")
      .select(col("want"),
        size(filter(
          regexp_extract_all(lower(col("text2")),
            lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)),
          t => t.isin(CleaningQueries.Blocklist: _*))).as("got"))
      .collect()
    hits.foreach(r => assert(r.getAs[Int]("got") === r.getAs[Int]("want")))
  }

  test("l54: the planted policy classes reconcile — every %5/%9 doc is " +
      "flagged, flagged+kept is total, checksums partition the corpus") {
    val rows = CleaningQueries.l54.fn(spark, sf).collect()
    assert(rows.map(_.getAs[String]("source")).distinct.length === rows.length)
    val (pages, flagged, kept) = (
      rows.map(_.getAs[Long]("n_pages")).sum,
      rows.map(_.getAs[Long]("n_flagged")).sum,
      rows.map(_.getAs[Long]("n_kept")).sum)
    assert(flagged + kept === pages)
    // every %5 and %9 doc carries a planted term, so flagged covers at
    // least those; natural 'dup' docs can only ADD to flagged
    val dd = graft.Tables.documents(spark, sf)
    val planted = dd.filter(col("doc_id") % 5 === 0 || col("doc_id") % 9 === 0)
      .count()
    assert(flagged >= planted)
    assert(kept > 0, "the filter must not be vacuous-total")
    // the dropped checksum is exactly the flagged docs' id sum: recompute
    val wantSum = dd
      .withColumn("hit",
        col("doc_id") % 5 === 0 || col("doc_id") % 9 === 0 ||
          array_contains(
            regexp_extract_all(lower(col("text")),
              lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)), "dup"))
      .filter(col("hit")).agg(sum("doc_id")).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("dropped_checksum")).sum === wantSum)
  }
}
