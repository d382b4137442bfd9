package graft.operators

import graft.Session
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-audit reports (l66–l69): each pinned on a hand-built fixture
  * where the expected numbers are computable by eye, plus a planted- or
  * brute-force reconciliation at sf0.001. */
class AuditQueriesSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private def frame(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  // ------------------------------------------------------------- l66

  test("l66 duplication profile: bucket membership, site totals, and " +
      "max count on a fixture with known gram counts") {
    // k = 3: 'a b c' occurs 3x (docs 1, 2, 3), 'b c d' 2x (docs 1, 2);
    // every other gram once
    val rows = frame(Seq(
      (1L, "en", "a b c d x"),   // grams: abc, bcd, cdx
      (2L, "en", "a b c d y"),   // grams: abc, bcd, cdy
      (3L, "en", "z a b c")))    // grams: zab, abc
    val got = AuditQueries.dupProfile(rows, k = 3)
      .select("dup_bucket", "n_grams", "n_sites", "max_count")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("1") === (3L, 3L, 1L), "cdx, cdy, zab each once")
    assert(got("2") === (1L, 2L, 2L), "'b c d' twice")
    assert(got("3-10") === (1L, 3L, 3L), "'a b c' three times")
    assert(!got.contains("11+"))
  }

  test("l66 reconciles against the gram population at sf0.001: site " +
      "totals equal the corpus' gram count and the >=2 buckets are " +
      "exactly the planted repeats") {
    val corpus = LlmQueries.plantedFull(
      graft.Tables.documents(spark, sf))
    val prof = AuditQueries.dupProfile(corpus, SamplingQueries.SpanK)
      .collect()
    val totalSites = prof.map(_.getLong(3)).sum
    val gramPop = corpus
      .withColumn("ta", split(lower(col("text")), "\\s+"))
      .filter(size(col("ta")) >= SamplingQueries.SpanK)
      .agg(sum(size(col("ta")) - (SamplingQueries.SpanK - 1)))
      .collect()(0).getLong(0)
    assert(totalSites === gramPop,
      "every gram site lands in exactly one bucket")
    // the planted copies are the only cross-doc repeats (l33's planted
    // invariant) — so at least one >=2 bucket must be populated
    assert(prof.exists(r => r.getString(1) != "1" && r.getLong(2) > 0))
  }

  // ------------------------------------------------------------- l67

  test("l67 source report card equals a driver-side brute-force " +
      "recompute at sf0.001, column for column") {
    val got = AuditQueries.sourceReport(graft.Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> r).toMap

    val rows = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select("source", "lang", "doc_id", "n_chars", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val hashCount = rows.groupBy(_._5.toLowerCase.trim)
      .map { case (k, v) => k -> v.size }
    val stop = Set("the", "a", "value", "table")
    val bySource = rows.groupBy(_._1)
    for ((src, ds) <- bySource) {
      val n = ds.size.toLong
      val toks = ds.map(_._5.toLowerCase.split("\\s+"))
      val nTokens = toks.map(_.length.toLong).sum
      val nDup = ds.count(d => hashCount(d._5.toLowerCase.trim) >= 2).toLong
      val nLowq = ds.count { d =>
        val ta = d._5.toLowerCase.split("\\s+")
        val stopBp = math.round(ta.count(stop) * 10000.0 / ta.length)
        !(d._4 >= 200 && stopBp < 2500)
      }.toLong
      val nRep = toks.count { ta =>
        ta.length >= 2 && {
          val bp = math.round(ta.sliding(2).map(_.mkString(" ")).toSeq
            .groupBy(identity).values.map(_.size).max * 10000.0 /
            (ta.length - 1))
          bp > 1000
        }
      }.toLong
      val r = got(src)
      assert(r.getLong(1) === n, s"$src n_docs")
      assert(r.getLong(2) === nTokens, s"$src n_tokens")
      assert(r.getLong(3) === nTokens / n, s"$src mean_tokens")
      assert(r.getLong(4) === ds.map(_._2).distinct.size.toLong, s"$src n_langs")
      assert(r.getLong(5) === nDup, s"$src n_dup_docs")
      assert(r.getLong(6) === nLowq, s"$src n_lowq")
      assert(r.getLong(7) === nRep, s"$src n_rep")
      assert(r.getLong(8) === math.round(nDup * 10000.0 / n), s"$src dup_bp")
      assert(r.getLong(9) === math.round(nLowq * 10000.0 / n), s"$src lowq_bp")
    }
    assert(got.keySet === bySource.keySet)
  }

  // ------------------------------------------------------------- l68

  /** The same md5-suite draw the operator applies, driver-side. */
  private def suiteOf(docId: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$docId:suite".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    s"s${Integer.parseInt(hex.substring(0, 1), 16) / 4}"
  }

  test("l68 per-suite contamination: a train doc copying one suite's " +
      "eval text hits THAT suite only; untouched suites read zero") {
    import spark.implicits._
    // eval docs across suites; ids chosen so at least two distinct
    // suites appear; one train doc embeds eval doc A's text verbatim
    val evalIds = (1L to 40L).toSeq
    // every token parameterized by i — no 8-gram is shared ACROSS eval
    // docs, so the quote below can only hit its own doc's suite
    val eva = evalIds.map(i => (i, "en",
      s"eval sample $i alpha$i beta$i gamma$i delta$i epsilon$i " +
        s"zeta$i eta$i theta$i iota$i"))
    val hitId = evalIds.head
    val train = Seq(
      (1000L, "en", s"train page quoting eval sample $hitId alpha$hitId " +
        s"beta$hitId gamma$hitId delta$hitId epsilon$hitId zeta$hitId " +
        s"eta$hitId theta$hitId iota$hitId and more"),
      (1001L, "en", "completely unrelated train page with its own " +
        "twelve words of content here now"))
    val corpus = (eva.map { case (i, l, t) => (i, l, t, "test") } ++
      train.map { case (i, l, t) => (i, l, t, "train") })
      .toDF("doc_id", "lang", "text", "split")
    val got = AuditQueries.suiteContam(corpus, SamplingQueries.SpanContamK)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val hitSuite = suiteOf(hitId)
    assert(got(hitSuite) === (1L, 1000L, 1L),
      "one train doc hits, checksum pins it, one eval doc leaked")
    got.filter(_._1 != hitSuite).foreach { case (s, v) =>
      assert(v === (0L, 0L, 0L), s"suite $s must be clean")
    }
    assert(got.size >= 2, "fixture must span >= 2 suites")
  }

  test("l68 at sf0.001: planted tails leak — totals reconcile with the " +
      "corpus-level overlap and every leaked count is bounded by its " +
      "suite's eval docs") {
    val corpus = SamplingQueries.spanContamCorpus(spark, sf)
    val rows = AuditQueries
      .suiteContam(corpus, SamplingQueries.SpanContamK).collect()
    assert(rows.map(_.getLong(3)).sum > 0, "planted copies must hit")
    rows.foreach { r =>
      assert(r.getLong(5) <= r.getLong(1),
        s"suite ${r.getString(0)}: leaked eval docs <= eval docs")
    }
    // every test doc long enough to plant a full-tail copy (even ids)
    // must be leaked in ITS suite's ledger
    val evalDocs = corpus.filter(col("split") === "test")
      .filter(col("doc_id") % 2 === 0)
      .filter(size(split(lower(col("text")), "\\s+")) >
        SamplingQueries.SpanContamK)
      .select("doc_id").collect().map(_.getLong(0))
    val leakedBySuite = rows
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    val expectedMin = evalDocs.groupBy(suiteOf).map { case (s, d) => s -> d.length }
    expectedMin.foreach { case (s, nMin) =>
      assert(leakedBySuite(s) >= nMin.toLong,
        s"suite $s: every even-id test doc plants verbatim, so >= $nMin leak")
    }
  }

  // ------------------------------------------------------------- l69

  private def flags(rows: Seq[(Long, String, String)]) =
    AuditQueries.gopherFlagsFrame(frame(rows))
      .collect().map(r => r.getLong(1) -> (2 to 8).map(r.getBoolean)).toMap

  test("l69 rules fire exactly as published: each fixture doc trips " +
      "its one designed rule (plus none of the others)") {
    // 60 words, mean len 4, all alpha, >= 2 stopwords, no symbols →
    // clean baseline
    val cleanText = ("the table " + Seq.tabulate(58)(i => "word").mkString(" "))
    val got = flags(Seq(
      (1L, "en", cleanText),
      // 5 words incl. 2 stopwords, mean (3+5+4+4+4)/5 = 4 → only f_wc
      (2L, "en", "the value word word word"),
      // 60 single-char words → mean 1 < 3 → f_mwl (wc ok, alpha ok,
      // stopword 'a' counts once → f_stop also fires: accept both)
      (3L, "en", ("the a " + Seq.tabulate(58)(_ => "w").mkString(" "))),
      // clean baseline + '#' on half the words → f_sym + f_alpha
      (4L, "en", "the table " + Seq.tabulate(50)(_ => "word #").mkString(" ")),
      // every line bullet-led → f_bullet (short lines keep others quiet)
      (5L, "en", Seq.tabulate(60)(i => s"- the table word word$i").mkString("\n")),
      // half the lines ellipsis-ended → f_ell (8 words per line keeps
      // the 30 '...' under the 10% symbol bar: 30·10 < 480)
      (6L, "en", Seq.tabulate(60)(i =>
        if (i % 2 == 0) s"the table word word word word word line$i..."
        else s"the table word word word word word line$i")
        .mkString("\n")),
      // no stopwords at all → f_stop
      (7L, "en", Seq.tabulate(60)(i => s"word$i").mkString(" "))))
    //               (f_wc, f_mwl, f_sym, f_bullet, f_ell, f_alpha, f_stop)
    assert(got(1L) === Seq(false, false, false, false, false, false, false))
    assert(got(2L) === Seq(true, false, false, false, false, false, false))
    assert(got(3L)(1) === true, "mean word length < 3")
    assert(got(3L)(0) === false && got(3L)(2) === false)
    assert(got(4L)(2) === true, "symbol ratio > 0.1")
    assert(got(4L)(5) === true, "'#' tokens carry no alpha char")
    assert(got(5L) === Seq(false, false, false, true, false, false, false))
    assert(got(6L) === Seq(false, false, false, false, true, false, false))
    assert(got(7L)(6) === true, "no stopwords")
  }

  // ------------------------------------------------------------- l70

  test("l70 BPE merge candidates: pair counts weighted by word " +
      "frequency, types distinct, ordered (count desc, pair)") {
    // TokRe tokens: 'aab' x3, 'ab' x1, 'bb' x1 →
    //   pair 'aa': 3 occ / 1 type; 'ab': 3+1 = 4 occ / 2 types;
    //   'bb': 1 occ / 1 type
    val rows = frame(Seq(
      (1L, "en", "aab aab ab"),
      (2L, "en", "bb aab")))
    val got = AuditQueries.bpeMerges(rows, 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === Seq(("ab", 4L, 2L), ("aa", 3L, 1L), ("bb", 1L, 1L)))
  }

  test("l70 at sf0.001 equals a driver-side recompute of the top-20 " +
      "merge table") {
    val got = AuditQueries.l70.fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val re = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
    val wc = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("text").collect()
      .flatMap(r => re.findAllIn(r.getString(0).toLowerCase))
      .groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    val pairs = scala.collection.mutable.Map[String, (Long, Long)]()
    for ((w, c) <- wc if w.length >= 2; i <- 0 until w.length - 1) {
      val p = w.substring(i, i + 2)
      val (occ, _) = pairs.getOrElse(p, (0L, 0L))
      pairs(p) = (occ + c, 0L)
    }
    for ((p, (occ, _)) <- pairs.toSeq) {
      val types = wc.keys.count(w => w.sliding(2).contains(p)).toLong
      pairs(p) = (occ, types)
    }
    val want = pairs.toSeq.map { case (p, (o, t)) => (p, o, t) }
      .sortBy { case (p, o, _) => (-o, p) }.take(20)
    assert(got.toSeq === want)
  }

  // ------------------------------------------------------------- l71

  test("l71 distinct-n at sf0.001 equals a driver-side recompute for " +
      "every (lang, n)") {
    val got = AuditQueries.l71.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docsL = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase.split("\\s+")))
    for (lang <- docsL.map(_._1).distinct; n <- 1 to 3) {
      val grams = docsL.filter(_._1 == lang).flatMap { case (_, ta) =>
        if (ta.length >= n) ta.sliding(n).map(_.mkString(" ")).toSeq else Nil
      }
      val want = (grams.length.toLong, grams.distinct.length.toLong,
        math.round(grams.distinct.length * 1000.0 / grams.length))
      assert(got((lang, n.toLong)) === want, s"($lang, $n)")
    }
  }

  // ------------------------------------------------------------- l72

  test("l72 agreement matrix: cells partition the corpus and the " +
      "checksums pin the disagreement docs (driver recompute, sf0.001)") {
    val got = AuditQueries.l72.fn(spark, sf).collect()
    val rows = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select("lang", "doc_id", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val stop = Set("the", "a", "value", "table")
    def scoreMilli(ta: Array[String]): Long = ta.map { t =>
      val h = t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003L)
      ((h % 256L) * 2654435761L) % 1001L - 500L
    }.sum
    for (r <- got) {
      val lang = r.getString(0)
      val ds = rows.filter(_._1 == lang)
      val cells = ds.map { case (_, id, nc, text) =>
        val ta = text.toLowerCase.split("\\s+")
        val stopBp = math.round(ta.count(stop) * 10000.0 / ta.length)
        val rk = nc >= 200 && stopBp < 2500
        val mk = scoreMilli(ta) > 0
        (id, rk, mk)
      }
      assert(r.getLong(1) === ds.length.toLong)
      assert(r.getLong(2) === cells.count(c => c._2 && c._3).toLong, s"$lang both_keep")
      assert(r.getLong(3) === cells.count(c => c._2 && !c._3).toLong, s"$lang rule_only")
      assert(r.getLong(4) === cells.count(c => !c._2 && c._3).toLong, s"$lang model_only")
      assert(r.getLong(5) === cells.count(c => !c._2 && !c._3).toLong, s"$lang both_drop")
      assert(r.getLong(6) === cells.filter(c => c._2 && !c._3).map(_._1).sum, s"$lang ro_ck")
      assert(r.getLong(7) === cells.filter(c => !c._2 && c._3).map(_._1).sum, s"$lang mo_ck")
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5)
        === r.getLong(1), s"$lang cells partition")
    }
  }

  // ------------------------------------------------------------- l73

  test("l73 length histogram: buckets partition docs and tokens, and " +
      "padded chunks equal the per-doc ceil sum (driver recompute)") {
    val got = AuditQueries.l73.fn(spark, sf).collect()
    val re = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
    val lens = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("lang", "text").collect()
      .map(r => (r.getString(0),
        re.findAllIn(r.getString(1).toLowerCase).length.toLong))
    def bucket(n: Long) =
      if (n < 32) "b0_lt32" else if (n < 64) "b1_32_63"
      else if (n < 128) "b2_64_127" else if (n < 256) "b3_128_255"
      else "b4_ge256"
    val want = lens.groupBy { case (l, n) => (l, bucket(n)) }
    assert(got.length === want.size)
    for (r <- got) {
      val ds = want((r.getString(0), r.getString(1))).map(_._2)
      assert(r.getLong(2) === ds.length.toLong)
      assert(r.getLong(3) === ds.sum)
      assert(r.getLong(4) === ds.min)
      assert(r.getLong(5) === ds.max)
      assert(r.getLong(6) === ds.map(n => (n + 255) / 256).sum)
    }
  }

  // ------------------------------------------------------------- l74

  /** Driver-side winnowing over one tokenized doc: k=5, w=4, md5-prefix
    * hash, rightmost-min rule — returns the selected (pos, h) set. */
  private def winnowBrute(ta: Array[String]): Set[(Int, Long)] = {
    val k = 5; val w = 4
    if (ta.length < k) return Set.empty
    val hs = (0 to ta.length - k).map { i =>
      val gram = ta.slice(i, i + k).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    (0 to hs.length - w).map { s =>
      val win = (s until s + w).map(p => (hs(p), -p))
      val (h, negP) = win.min // min h, rightmost pos on ties
      (-negP, h)
    }.toSet
  }

  test("l74 winnowing guarantee (fixture): two docs sharing a " +
      "k+w-1-token substring share a selected fingerprint, disjoint " +
      "docs share none, and the DQ-shape recompute agrees") {
    val shared = "quartz plover basalt nimbus ferrule osprey garnet mica"
    val a = s"alpha bravo charlie delta echo $shared foxtrot golf hotel " +
      "india juliet kilo"
    val b = s"november oscar papa quebec romeo $shared sierra tango " +
      "uniform victor whiskey xray"
    val c = "yankee zulu anchor bobbin crate dowel easel flange grommet " +
      "hasp inlet jamb keel"
    val corpus = frame(Seq((1L, "en", a), (2L, "en", b), (3L, "en", c)))
    val sel: Seq[(Long, Int, Long)] = AuditQueries.winnowSelect(corpus)
      .select("doc_id", "pos", "minkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val fps: Map[Long, Set[Long]] = sel
      .map { case (id, _, mk) => (id, mk / 1048576L) }.toSet
      .groupBy((p: (Long, Long)) => p._1)
      .map { case (id, s) => id -> s.map(_._2) }
    assert((fps(1L) & fps(2L)).nonEmpty,
      "an 8-token shared substring must share a fingerprint (published " +
        "guarantee at k=5, w=4)")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "token-disjoint docs share nothing")
    // the engine's selection IS the brute rightmost-min rule, doc by doc
    for ((id, text) <- Seq((1L, a), (2L, b), (3L, c))) {
      val want = winnowBrute(text.toLowerCase.split("\\s+"))
        .map { case (p, h) => h * 1048576L + (1048575L - p) }
      assert(sel.filter(_._1 == id).map(_._3).toSet === want, s"doc $id")
    }
  }

  test("l74 at sf0.001 equals a driver-side recompute of every column") {
    val got = AuditQueries.l74.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (1 to 6).map(r.getLong)).toMap
    val planted = LlmQueries.plantedFull(
        graft.Tables.documents(spark, sf).filter(col("text").isNotNull))
      .select("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val selAll = planted.flatMap { case (lang, id, text) =>
      val ta = text.toLowerCase.split("\\s+")
      if (ta.length < 5) Nil
      else {
        val n = ta.length - 5 + 1 // grams
        val nWin = math.max(0, n - 4 + 1)
        val sel = winnowBrute(ta)
        Seq((lang, id, nWin.toLong, sel))
      }
    }
    for (lang <- selAll.map(_._1).distinct) {
      val ds = selAll.filter(d => d._1 == lang && d._3 > 0)
      val nDocs = ds.length.toLong
      val nWindows = ds.map(_._3).sum
      val nSelected = ds.map(_._4.size.toLong).sum
      val byH = ds.flatMap(d => d._4.map(_._2).toSeq.distinct.map(h => (h, d._2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val sharedH = byH.filter(_._2 >= 2).keys.toSeq
      val want = Seq(nDocs, nWindows, nSelected,
        nSelected * 1000L / nWindows, sharedH.length.toLong, sharedH.sum)
      assert(got(lang) === want, lang)
    }
  }

  // ------------------------------------------------------------- l75

  test("l75 vocabulary growth at sf0.001 equals a driver-side " +
      "recompute, and the curve is monotone (types grow with tokens)") {
    val got = AuditQueries.l75.fn(spark, sf).collect()
    val rows = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    for (r <- got) {
      val lang = r.getString(0)
      val ds = rows.filter(_._1 == lang).sortBy(_._2)
      val L = ds.length
      val cut25 = (L + 3) / 4; val cut50 = (L + 1) / 2
      def stats(nDocs: Int) = {
        val toks = ds.take(nDocs)
          .flatMap(_._3.toLowerCase.split("\\s+"))
        (toks.length.toLong, toks.distinct.length.toLong)
      }
      val (tok25, typ25) = stats(cut25)
      val (tok50, typ50) = stats(cut50)
      val (tokAll, typAll) = stats(L)
      assert((1 to 6).map(r.getLong) ===
        Seq(tok25, typ25, tok50, typ50, tokAll, typAll), lang)
      assert(r.getLong(7) === typAll * 1000L / typ50, s"$lang growth")
      assert(typ25 <= typ50 && typ50 <= typAll, s"$lang monotone")
    }
  }

  // ------------------------------------------------------------- l76

  test("l76 embedding outliers at sf0.001 equals a driver-side integer " +
      "recompute of centroids, cosines, and the bottom-3 checksum") {
    val got = AuditQueries.l76.fn(spark, sf).collect()
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("label", "vec_id", "embedding").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1),
        r.getSeq[Float](2).map(x => math.round(x.toDouble * 1e6)).toArray))
    assert(got.length === vecs.map(_._1).distinct.length)
    for (r <- got) {
      val label = r.getLong(0)
      val vs = vecs.filter(_._1 == label)
      val dim = vs.head._3.length
      val cent = (0 until dim).map(p =>
        vs.map(_._3(p)).sum / vs.length).toArray // long floor-div mean
      val nc = cent.map(x => x * x).sum
      val sims = vs.map { case (_, id, v) =>
        val dot = v.zip(cent).map { case (a, b) => a * b }.sum
        val nv = v.map(x => x * x).sum
        val s = if (nv == 0L || nc == 0L) 0L
        else math.round(10000.0 * dot / (math.sqrt(nv.toDouble) *
          math.sqrt(nc.toDouble)))
        (id, s)
      }
      assert(r.getLong(1) === vs.length.toLong, s"$label n")
      assert(r.getLong(2) === sims.map(_._2).sum / vs.length, s"$label mean")
      assert(r.getLong(3) === sims.map(_._2).min, s"$label min")
      assert(r.getLong(4) ===
        sims.sortBy(x => (x._2, x._1)).take(3).map(_._1).sum,
        s"$label outliers")
    }
  }

  // ------------------------------------------------------------- l77

  test("l77 collocations at sf0.001 equals a driver-side recompute of " +
      "the discounted-PMI top-20") {
    val got = AuditQueries.l77.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val tas = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("text").collect()
      .map(_.getString(0).toLowerCase.split("\\s+"))
    val uni = tas.flatten.groupBy(identity).map { case (w, v) =>
      w -> v.length.toLong }
    val n = uni.values.sum
    val pairs = tas.flatMap(ta => ta.sliding(2).filter(_.length == 2))
      .map(p => (p(0), p(1)))
      .groupBy(identity).map { case (p, v) => p -> v.length.toLong }
      .filter(_._2 >= 10L)
    val want = pairs.toSeq.map { case ((w1, w2), c) =>
      (w1, w2, c, uni(w1), uni(w2), (c - 5L) * 1000L * n / (uni(w1) * uni(w2)))
    }.sortBy { case (w1, w2, _, _, _, s) => (-s, w1, w2) }.take(20)
    assert(got.toSeq === want)
  }

  // ------------------------------------------------------------- l78

  test("l78 per-source PII exposure equals a driver recompute per " +
      "(source, type), and totals reconcile with l32's corpus-wide " +
      "n_pii (one pattern set, two reports)") {
    val got = AuditQueries.l78.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val res = Seq(
      "email" -> CleaningQueries.emailReForTest,
      "phone" -> CleaningQueries.phoneReForTest,
      "ip" -> CleaningQueries.ipReForTest).toMap
    val rows = graft.Tables.documents(spark, sf)
      .withColumn("text2", expr(CleaningQueries.plantedPiiSql))
      .select("source", "text2").collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    for (((src, typ), (nDocs, hit, occ, ppm)) <- got) {
      val ds = rows.filter(_._1 == src)
      val counts = ds.map(_._2.map(t =>
        res(typ).r.findAllIn(t).length.toLong))
      assert(nDocs === ds.length.toLong, s"$src/$typ n_docs")
      assert(hit === counts.count(_.exists(_ > 0L)).toLong, s"$src/$typ hit")
      assert(occ === counts.flatten.sum, s"$src/$typ occ")
      val chars = ds.flatMap(_._2.map(_.length.toLong)).sum
      assert(ppm === occ * 1000000L / chars, s"$src/$typ ppm")
    }
    // cross-report reconciliation: Σ occurrences over sources ==
    // l32's Σ n_pii over languages (same patterns, same planted corpus)
    val l32Pii = CleaningQueries.l32.fn(spark, sf)
      .agg(sum("n_pii")).collect().head.getLong(0)
    assert(got.values.map(_._3).sum === l32Pii)
  }

  test("l69 DQ at sf0.001: the planted degradations make every " +
      "plantable arm fire somewhere, and f_any accounting closes") {
    val out = AuditQueries.l69.fn(spark, sf).collect()
    def tot(i: Int) = out.map(_.getLong(i)).sum
    assert(tot(3) > 0, "wordlen arm (planted bullet/symbol copies)")
    assert(tot(4) > 0, "symbol arm")
    assert(tot(5) > 0, "bullet arm")
    assert(tot(6) > 0, "ellipsis arm")
    assert(tot(7) > 0, "alpha arm")
    assert(tot(8) > 0, "stopword arm (natural corpus)")
    out.foreach { r =>
      val anyN = r.getLong(9)
      val perRule = (2 to 8).map(r.getLong)
      assert(anyN <= perRule.sum && anyN >= perRule.max,
        s"${r.getString(0)}: f_any between max-rule and rule-sum")
      assert(anyN <= r.getLong(1), "flagged docs <= docs")
    }
  }
}
