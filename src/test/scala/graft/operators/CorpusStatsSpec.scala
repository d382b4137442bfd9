package graft.operators

import graft.{Session, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-statistics operators (l41 vocabulary + coverage): semantics
  * re-derived driver-side at sf0.001, independent of the DuckDB oracle,
  * plus the scale plan shape (TakeOrdered vocab, broadcast mark join). */
class CorpusStatsSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private val TokRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  test("l41 vocab coverage equals a brute driver-side recompute and the " +
      "16-token vocabulary genuinely binds") {
    val rows = LlmQueries.l41.fn(spark, sf).collect()
    assert(rows.nonEmpty)

    // brute recompute: token counts per (lang, tok) in plain Scala
    val toks = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("lang"), col("text")).collect()
      .flatMap { r =>
        TokRe.r.findAllIn(r.getString(1).toLowerCase).map(r.getString(0) -> _)
      }
    val langTok = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val global = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val vocab = global.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(LlmQueries.VocabSize).map(_._1).toSet
    assert(vocab.size === LlmQueries.VocabSize,
      "corpus vocabulary must exceed V for the cut to bind")

    for (r <- rows) {
      val lang = r.getString(0)
      val mine = langTok.collect { case ((l, t), c) if l == lang => (t, c) }
      assert(r.getAs[Long]("n_occ") === mine.map(_._2).sum, s"$lang n_occ")
      assert(r.getAs[Long]("n_occ_vocab") ===
        mine.collect { case (t, c) if vocab(t) => c }.sum, s"$lang in-vocab")
      assert(r.getAs[Long]("n_types") === mine.size, s"$lang types")
      assert(r.getAs[Long]("n_types_vocab") ===
        mine.count { case (t, _) => vocab(t) }, s"$lang vocab types")
      assert(r.getAs[Long]("oov_bp") >= 0 && r.getAs[Long]("oov_bp") <= 10000)
    }
    // the cut line is visible somewhere: OOV occurrences exist
    assert(rows.map(_.getAs[Long]("n_occ")).sum >
      rows.map(_.getAs[Long]("n_occ_vocab")).sum)
  }

  test("l44 snapshot diff classifies exactly the planted version history") {
    val rows = CorpusOpsQueries.l44.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val dd = Tables.documents(spark, sf).filter(col("text").isNotNull)
    val added = dd.filter(col("doc_id") % 7 === 0).count()
    val removed = dd.filter(col("doc_id") % 13 === 0).count()
    // modified = ' edited' in v1 AND still present in v1 (%7 wins)
    val modified = dd.filter(col("doc_id") % 11 === 0 &&
      col("doc_id") % 7 =!= 0).count()
    val total = dd.count()
    assert(rows.map(_.getAs[Long]("n_added")).sum === added)
    assert(rows.map(_.getAs[Long]("n_removed")).sum === removed)
    assert(rows.map(_.getAs[Long]("n_modified")).sum === modified)
    assert(rows.map(_.getAs[Long]("n_unchanged")).sum ===
      total - added - modified)
    // checksums pin WHICH docs, not just counts
    val expectAdded = dd.filter(col("doc_id") % 7 === 0)
      .agg(coalesce(sum("doc_id"), lit(0L))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("added_checksum")).sum === expectAdded)
  }

  test("l44's diff is ONE primary-key equi-join (co-partitionable at " +
      "scale), never a nested loop over the snapshots") {
    val plan = CorpusOpsQueries.l44.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"full-outer diff join:\n$plan")
    // the only BNLJ is the 1-row offset broadcast; the snapshot join
    // itself must be hash/sort-merge on doc_id
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"keyed join expected:\n$plan")
  }

  test("l46 refuses exactly the planted re-crawls and reverts — the " +
      "increment's content screen pins WHICH docs, per class") {
    val rows = CorpusOpsQueries.l46.fn(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("added", "modified"))
    val byStatus = rows.map(r => r.getString(0) -> r).toMap
    val dd = Tables.documents(spark, sf).filter(col("text").isNotNull)
    def idsWhere(c: org.apache.spark.sql.Column): Seq[Long] =
      dd.filter(c).select("doc_id").collect().map(_.getLong(0)).toSeq

    // added-by-key ∧ planted-removed (7·13): content re-crawled from v1
    val recrawled = idsWhere(col("doc_id") % 91 === 0)
    val addedAll = idsWhere(col("doc_id") % 7 === 0)
    val a = byStatus("added")
    assert(a.getAs[Long]("n_docs") === addedAll.size.toLong)
    assert(a.getAs[Long]("n_known") === recrawled.size.toLong)
    assert(a.getAs[Long]("known_checksum") === recrawled.sum)
    assert(a.getAs[Long]("n_novel") === (addedAll.size - recrawled.size).toLong)
    assert(a.getAs[Long]("novel_checksum") === addedAll.sum - recrawled.sum)

    // modified-by-key ∧ planted-removed (11·13, not 7): the v2 text
    // reverts to a copy v1 still holds — known content under a changed key
    val reverted = idsWhere(col("doc_id") % 143 === 0 && col("doc_id") % 7 =!= 0)
    val modAll = idsWhere(col("doc_id") % 11 === 0 && col("doc_id") % 7 =!= 0)
    val m = byStatus("modified")
    assert(m.getAs[Long]("n_docs") === modAll.size.toLong)
    assert(m.getAs[Long]("n_known") === reverted.size.toLong)
    assert(m.getAs[Long]("known_checksum") === reverted.sum)
    assert(recrawled.nonEmpty && reverted.nonEmpty,
      "both planted known classes must be non-empty for the pin to bite")
  }

  test("l46 shares l44's version history: known-added docs are a subset " +
      "of the docs l44 calls added") {
    // same v1 construction ⇒ the content screen's increment IS the key
    // diff's added+modified slice; sizes must reconcile cell-for-cell
    val diff = CorpusOpsQueries.l44.fn(spark, sf).collect()
    val screen = CorpusOpsQueries.l46.fn(spark, sf).collect()
    val nAdded = diff.map(_.getAs[Long]("n_added")).sum
    val nModified = diff.map(_.getAs[Long]("n_modified")).sum
    val byStatus = screen.map(r => r.getString(0) -> r).toMap
    assert(byStatus("added").getAs[Long]("n_docs") === nAdded)
    assert(byStatus("modified").getAs[Long]("n_docs") === nModified)
  }

  test("l48 source-overlap matrix equals a driver-side recompute and every " +
      "plantable mirror pair appears") {
    val k = CorpusOpsQueries.OverlapK
    val cur = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val corpus = cur.map { case (_, s, t) => (s, t) } ++
      cur.collect { case (id, s, t) if id % 10 == 0 =>
        ("m_" + s, t.substring(t.indexOf(' ') + 1)) }
    val grams = corpus.flatMap { case (s, t) =>
      val ta = t.toLowerCase.split("\\s+")
      if (ta.length < k) Seq.empty
      else (0 to ta.length - k).map(i => (s, ta.slice(i, i + k).mkString(" ")))
    }.distinct
    val byGram = grams.groupBy(_._2).filter(_._2.size <= CorpusOpsQueries.OverlapDfCap)
    val kept = byGram.values.flatten.toSeq
    val tot = kept.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val pairs = byGram.values.flatMap { ss =>
      val srcs = ss.map(_._1).toSeq.sorted
      for (a <- srcs; b <- srcs if a < b) yield (a, b)
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val expect = pairs.toSeq.sortBy(_._1).map { case ((a, b), n) =>
      (a, b, tot(a), tot(b), n,
        math.round(n * 10000.0 / (tot(a) + tot(b) - n)))
    }
    val got = CorpusOpsQueries.l48.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect, s"got ${got.take(5)}…\nexpect ${expect.take(5)}…")
    // every source with a ≥ k+1-token %10 doc must overlap its mirror
    val plantable = cur.collect { case (id, s, t)
      if id % 10 == 0 && t.toLowerCase.split("\\s+").length >= k + 1 => s }.toSet
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    assert(plantable.nonEmpty)
    // pairs order lexicographically and 'm' < 's', so the mirror leads
    plantable.foreach { s =>
      assert(gotPairs.contains(("m_" + s, s)), s"mirror pair for $s missing") }
  }

  test("l48 sketch path: per-source MinHash signatures estimate the exact " +
      "Jaccard within 4σ on every mirror pair (the 10⁵-source form)") {
    import graft.functions.MinHash
    val exact = CorpusOpsQueries.l48.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(4),
        r.getLong(2), r.getLong(3))).toMap
    // signatures over the SAME per-source gram sets the exact matrix uses
    val k = CorpusOpsQueries.OverlapK
    val cur = Tables.documents(spark, sf).filter(col("text").isNotNull)
    val off = cur.agg(max("doc_id")).collect().head.getLong(0) + 1
    val mirrored = cur.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(off)).as("doc_id"),
        concat(lit("m_"), col("source")).as("source"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val corpus = cur.select("doc_id", "source", "text").unionByName(mirrored)
    val sigs = SamplingQueries.docGramsK(corpus, Seq("source"), k, hashed = true)
      .select("source", "gram").distinct()
      .groupBy("source")
      .agg(MinHash.signature(col("gram")).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val mirrors = exact.keys.filter(p => p._1 == "m_" + p._2)
    assert(mirrors.nonEmpty)
    mirrors.foreach { case p @ (a, b) =>
      val (n, ga, gb) = exact(p)
      // NOTE: the sketch sees the UNCAPPED gram sets; on this corpus the
      // df cap removes nothing from mirror pairs (soup grams are rare)
      val j = n.toDouble / (ga + gb - n)
      val est = MinHash.estimate(sigs(a), sigs(b))
      val tol = 4.0 * math.sqrt(j * (1 - j) / MinHash.K) + 1.0 / MinHash.K
      assert(math.abs(est - j) <= tol, s"pair $p: est $est vs exact $j (tol $tol)")
    }
  }

  test("l49 near-dup increment screen: every modified revision and every " +
      "exact re-crawl is near-known; flags are sound and ≥80% of brute recall") {
    val rows = CorpusOpsQueries.l49.fn(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("added", "modified"))
    val byStatus = rows.map(r => r.getString(0) -> r).toMap

    // driver-side brute: for every increment doc, max exact Jaccard of
    // distinct 3-shingle sets against ALL v1 docs
    val cur = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val off = cur.map(_._1).max + 1
    def shingleSet(t: String): Set[String] = {
      val ta = t.toLowerCase.split("\\s+")
      if (ta.length < 3) Set.empty
      else (0 to ta.length - 3).map(i => ta.slice(i, i + 3).mkString(" ")).toSet
    }
    val v1 = cur.filter(_._1 % 7 != 0).map { case (id, t) =>
        shingleSet(if (id % 11 == 0) t + " edited" else t) } ++
      cur.filter(_._1 % 13 == 0).map(d => shingleSet(d._2))
    val inc = cur.filter(d => d._1 % 7 == 0 || d._1 % 11 == 0)
    def bruteNear(t: String): Boolean = {
      val a = shingleSet(t)
      a.nonEmpty && v1.exists { b =>
        val i = (a & b).size
        math.round(i * 10000.0 / (a.size + b.size - i)) >= 8000L
      }
    }
    val bruteFlagged = inc.filter(d => bruteNear(d._2)).map(_._1).toSet

    // the planted classes: modified docs are one-token revisions of
    // their v1 row; %91 added docs are exact copies of v1 removed rows
    val modified = inc.filter(d => d._1 % 7 != 0).map(_._1).toSet
    val recrawls = inc.filter(_._1 % 91 == 0).map(_._1).toSet
    assert(modified.subsetOf(bruteFlagged), "every revision must be brute-near")
    assert(recrawls.subsetOf(bruteFlagged), "every exact copy must be brute-near")
    val m = byStatus("modified")
    assert(m.getAs[Long]("n_near_known") === modified.size.toLong,
      "every modified revision must be caught")
    assert(m.getAs[Long]("near_known_checksum") === modified.sum)

    // soundness + recall vs brute (the l9 discipline): the verify step
    // makes every flag a true ≥-bar pair; banding may only lose recall
    val nFlagged = rows.map(_.getAs[Long]("n_near_known")).sum
    val cks = rows.map(_.getAs[Long]("near_known_checksum")).sum
    assert(nFlagged <= bruteFlagged.size.toLong, "soundness: no false flags")
    assert(nFlagged * 10 >= bruteFlagged.size.toLong * 8,
      s"recall: $nFlagged of ${bruteFlagged.size} brute pairs")
    // the added side must at minimum carry the exact re-crawls
    val a = byStatus("added")
    assert(a.getAs[Long]("n_near_known") >= recrawls.size.toLong)
    assert(cks <= bruteFlagged.sum && a.getAs[Long]("n_docs") ===
      inc.count(_._1 % 7 == 0).toLong)
  }

  test("l49 vs l46: the sketch screen strictly dominates the hash screen " +
      "on the modified class (revisions are near-known but hash-novel)") {
    val near = CorpusOpsQueries.l49.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_near_known")).toMap
    val exact = CorpusOpsQueries.l46.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_known"), r.getAs[Long]("n_docs"))).toMap
    val (mKnown, mDocs) = exact("modified")
    assert(near("modified") === mDocs, "sketch catches every revision")
    assert(mKnown < mDocs, "hash screen must miss the revisions (novel by hash)")
    assert(near("added") >= exact("added")._1,
      "near-known ⊇ exact-known on the added class")
  }

  test("DedupIndex: probe-from-parquet ≡ the composed l46, append-then-" +
      "probe ≡ full rebuild, and novelOnly drops exactly known content") {
    val cur = Tables.documents(spark, sf).filter(col("text").isNotNull)
    val v1 = CorpusOpsQueries.v1Snapshot(cur)
    val base = java.nio.file.Files
      .createTempDirectory("graft_dedup_idx").toString

    // build once per release, probe from disk — identical to the DQ
    DedupIndex.write(v1, base)
    val fromDisk = CorpusOpsQueries.screenAgainst(
      CorpusOpsQueries.incrementOf(cur), DedupIndex.read(spark, base))
      .collect().map(_.toString).toSeq
    val composed = CorpusOpsQueries.l46.fn(spark, sf)
      .collect().map(_.toString).toSeq
    assert(fromDisk === composed)

    // append path: half the snapshot indexed, the rest appended
    val base2 = java.nio.file.Files
      .createTempDirectory("graft_dedup_idx2").toString
    DedupIndex.write(v1.filter(col("doc_id") % 2 === 0), base2)
    DedupIndex.append(v1.filter(col("doc_id") % 2 =!= 0), base2)
    val appended = CorpusOpsQueries.screenAgainst(
      CorpusOpsQueries.incrementOf(cur), DedupIndex.read(spark, base2))
      .collect().map(_.toString).toSeq
    assert(appended === composed, "append-then-probe must equal rebuild")

    // the foreachBatch backstop: a batch replaying v1 content + novel
    // rows keeps exactly the novel rows
    val replayed = v1.limit(5)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("source"),
        col("text"))
    val novel = spark.range(3).select(
      (col("id") + lit(2000000L)).as("doc_id"), lit("srcX").as("source"),
      concat(lit("genuinely fresh content row "), col("id")).as("text"))
    val got = DedupIndex.novelOnly(
      replayed.unionByName(novel), DedupIndex.read(spark, base))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(2000000L, 2000001L, 2000002L),
      "replayed content must be dropped, novel rows kept")
  }

  test("l41 plan: the vocabulary is a TakeOrdered (no global sort) and " +
      "marks tokens through a broadcast join") {
    val plan = LlmQueries.l41.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"vocab cut:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"mark join must broadcast:\n$plan")
  }

  test("l57 tokenize-ids equals a brute driver-side recompute — vocab " +
      "ranking, OOV arm, and the order-sensitive fingerprint all agree") {
    val got = LlmQueries.l57.fn(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("seq_fp"))).toMap

    val docRows = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val tokOf = (t: String) =>
      TokRe.r.findAllIn(t.toLowerCase).toVector
    val counts = docRows.flatMap { case (_, t) => tokOf(t) }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(16)
      .zipWithIndex.map { case ((t, _), i) => t -> i.toLong }.toMap
    val want = docRows.groupBy(_._1).map { case (lang, ds) =>
      val perDoc = ds.map { case (_, text) =>
        val ids = tokOf(text).map(t => vocab.getOrElse(t, -1L))
        (ids.length.toLong, ids.count(_ == -1L).toLong,
          ids.zipWithIndex.map { case (id, i) => (i + 1L) * (id + 2L) }.sum)
      }
      lang -> (perDoc.map(_._1).sum, perDoc.map(_._2).sum, perDoc.map(_._3).sum)
    }
    assert(got === want)
  }

  test("l57 is consistent with l41: the OOV occurrence counts are the " +
      "SAME numbers both operators report (one vocabulary, two views)") {
    val t = LlmQueries.l57.fn(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"))).toMap
    val v = LlmQueries.l41.fn(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_occ"),
          r.getAs[Long]("n_occ") - r.getAs[Long]("n_occ_vocab"))).toMap
    assert(t === v)
  }

  test("VocabIndex: a persisted release tokenizes identically to the " +
      "composed in-query plan, and ids are the dense frequency ranks") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_vocab_idx_").toString
    val dd = Tables.documents(spark, sf).filter(col("text").isNotNull)
    VocabIndex.write(VocabIndex.build(dd, 16), base)
    val release = VocabIndex.read(spark, base)

    // ids are exactly the dense (cnt desc, tok asc) ranks 0..V-1
    val rel = release.orderBy("id").collect()
      .map(r => (r.getAs[String]("tok"), r.getAs[Long]("id"),
        r.getAs[Long]("cnt")))
    assert(rel.map(_._2).toSeq === (0L until rel.length.toLong))
    assert(rel.sortBy { case (t, _, c) => (-c, t) }.map(_._2).toSeq ===
      rel.map(_._2).toSeq, "rank order must be (cnt desc, tok asc)")

    // probe-from-parquet ≡ the composed form, doc by doc
    def fps(vmap: org.apache.spark.sql.Column) =
      VocabIndex.tokenize(dd.select("doc_id", "text"), vmap)
        .select("doc_id", "n_oov", "fp").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fps(VocabIndex.idMap(release)) ===
      fps(VocabIndex.idMap(VocabIndex.build(dd, 16))))
  }

  test("VocabIndex.tokenize on a zero-token doc: empty ids, n_oov 0, " +
      "fp 0 — never NULL (the sequence(1,0) descending-range trap)") {
    import spark.implicits._
    val vmap = VocabIndex.idMap(
      VocabIndex.build(Seq("real tokens here").toDF("text"), 4))
    val rows = VocabIndex.tokenize(
      Seq("   ", "", "real tokens").toDF("text"), vmap)
      .select("n_oov", "fp").collect()
    // whitespace-only and empty docs: fp must be the empty fold's 0
    assert(rows(0).getLong(0) === 0L && !rows(0).isNullAt(1) &&
      rows(0).getLong(1) === 0L)
    assert(rows(1).getLong(0) === 0L && rows(1).getLong(1) === 0L)
    assert(rows(2).getLong(1) !== 0L, "a real doc must fingerprint nonzero")
  }

  test("VocabIndex.idMap of an EMPTY vocabulary stays map<string,bigint>: " +
      "tokenize analyzes and every token reads OOV") {
    import spark.implicits._
    val emptyVocab = VocabIndex.build(
      Seq.empty[String].toDF("text"), 4)
    val rows = VocabIndex.tokenize(
      Seq("alpha beta").toDF("text"), VocabIndex.idMap(emptyVocab))
      .select("ids", "n_oov", "fp").collect()
    // an untyped empty map() would be map<string,string>, coercing ids
    // to strings and failing the long fp aggregate at analysis
    assert(rows(0).getSeq[Long](0) === Seq(-1L, -1L))
    assert(rows(0).getLong(1) === 2L)
  }

  test("l63 tokenizer fertility equals a brute driver-side recompute, " +
      "and the milli ratios reconcile with their own integer sums") {
    val rows = LlmQueries.l63.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val want = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select("lang", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (lang, docs) =>
        val words = docs.map(_._2.trim.split("\\s+").length.toLong).sum
        val toks = docs.map(d =>
          TokRe.r.findAllIn(d._2.toLowerCase).length.toLong).sum
        val chars = docs.map(_._3).sum
        lang -> (docs.length.toLong, chars, words, toks)
      }
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val (nd, ch, wo, to) = want(lang)
      assert(r.getAs[Long]("n_docs") === nd, s"$lang docs")
      assert(r.getAs[Long]("n_chars") === ch, s"$lang chars")
      assert(r.getAs[Long]("n_words") === wo, s"$lang words")
      assert(r.getAs[Long]("n_tokens") === to, s"$lang tokens")
      assert(r.getAs[Long]("fertility_milli") ===
        math.round(to * 1000.0 / wo), s"$lang fertility")
      assert(r.getAs[Long]("chars_per_tok_milli") ===
        math.round(ch * 1000.0 / to), s"$lang compression")
      // fertility ≥ 1000 by construction: the pre-tokenizer only ever
      // SPLITS whitespace words, never merges them
      assert(r.getAs[Long]("fertility_milli") >= 1000L, s"$lang sub-1")
    }
  }

  test("l59 distribution drift equals a driver-side recompute over the " +
      "planted version history, and the flag separates the dims") {
    val rows = CorpusOpsQueries.l59.fn(spark, sf).collect()

    // driver-side recompute from the SAME planted-history rules
    val cur = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val off = cur.map(_._1).max + 1
    val v1 = cur.filter(_._1 % 7 != 0).map { case (id, s, t) =>
      (id, s, if (id % 11 == 0) t + " edited" else t) } ++
      cur.filter(_._1 % 13 == 0).map { case (id, s, t) => (id + off, s, t) }
    def dims(snap: Array[(Long, String, String)]) =
      snap.flatMap { case (_, s, t) =>
        val b = if (t.length < 200) "short" else if (t.length < 400) "mid"
          else "long"
        Seq(("source", s), ("len", b))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (c1, c2) = (dims(v1), dims(cur))
    for (r <- rows) {
      val k = (r.getAs[String]("dim"), r.getAs[String]("val"))
      assert(r.getAs[Long]("n_v1") === c1.getOrElse(k, 0L), s"$k n_v1")
      assert(r.getAs[Long]("n_v2") === c2.getOrElse(k, 0L), s"$k n_v2")
      val t1 = c1.filter(_._1._1 == k._1).values.sum
      val t2 = c2.filter(_._1._1 == k._1).values.sum
      val s1 = math.round(c1.getOrElse(k, 0L) * 10000.0 / t1)
      val s2 = math.round(c2.getOrElse(k, 0L) * 10000.0 / t2)
      assert(r.getAs[Long]("delta_bp") === s2 - s1, s"$k delta")
      assert(r.getAs[Boolean]("drifted") === (math.abs(s2 - s1) >= 100L))
    }
    // per-dim shares reconcile to ~10000 (rounding residue only)
    for (dim <- Seq("source", "len"); colName <- Seq("share_v1_bp", "share_v2_bp")) {
      val tot = rows.filter(_.getAs[String]("dim") == dim)
        .map(_.getAs[Long](colName)).sum
      assert(math.abs(tot - 10000L) <= rows.length, s"$dim $colName sums $tot")
    }
    // the planted history moves the LENGTH profile, not the source mix —
    // the flag must separate the two dimensions
    assert(rows.filter(_.getAs[String]("dim") == "len")
      .exists(_.getAs[Boolean]("drifted")), "len drift must flag")
  }

  test("l57's mapping pass is row-local: no join and no exchange before " +
      "the language rollup except the vocab build's own") {
    val plan = LlmQueries.l57.fn(spark, sf)
      .queryExecution.executedPlan.toString
    // the mapping side must NOT join tokens back (the vocab rides as a
    // literal map); the only join-like node allowed is none at all
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"token mapping must be a literal-map lookup, not a join:\n$plan")
  }
}
