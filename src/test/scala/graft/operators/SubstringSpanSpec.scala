package graft.operators

import graft.{Session, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Substring-level dedup (l33): the distributed k-gram re-expression of
  * Lee et al.'s ExactSubstr must behave like its definition — maximal
  * repeated spans, merged exactly — and the 8-byte hashed-key scale
  * form must agree with the string form. */
class SubstringSpanSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private def frame(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  private def spans(df: org.apache.spark.sql.DataFrame, k: Int) =
    SamplingQueries.substringSpans(df, k, hashed = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

  test("a verbatim L-token repeat across two docs merges into ONE span of L tokens") {
    // 8 shared tokens inside different surroundings, k = 3: the 6
    // member grams must merge back to a single [start, start+8) span
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val rows = frame(Seq(
      (1L, "en", s"one two $shared nine ten"),
      (2L, "en", s"$shared completely different tail words here")))
    val got = spans(rows, k = 3)
    assert(got === Seq(("en", 2L, 2L, 2L, 16L, 8L)),
      s"per-lang (docs, withSpans, spans, covered, max): $got")
  }

  test("two separated repeats in one doc stay TWO spans; adjacent grams merge") {
    // doc 1 carries two 4-token repeats split by 5 unshared tokens;
    // docs 2/3 each carry one of them. k = 3 → per repeat: 2 grams,
    // overlapping, one 4-token span; the gap prevents cross-merge.
    val r1 = "red orange yellow green"
    val r2 = "cyan blue indigo violet"
    val rows = frame(Seq(
      (1L, "en", s"$r1 aa bb cc dd ee $r2"),
      (2L, "en", s"$r1 zz yy xx ww vv uu tt"),
      (3L, "en", s"pp qq rr ss tt uu vv $r2")))
    val got = spans(rows, k = 3)
    // doc1: 2 spans × 4 tokens; docs 2,3: 1 span × 4 each → 4 spans, 16 tokens
    assert(got === Seq(("en", 3L, 3L, 4L, 16L, 4L)), got.toString)
  }

  test("no span shorter than k ever emerges, and sub-k repeats are invisible") {
    val rows = frame(Seq(
      (1L, "en", "shared pair one aaa bbb ccc ddd eee fff"),
      (2L, "en", "shared pair two ggg hhh iii jjj kkk lll")))
    // only a 2-token prefix repeats; k = 3 sees nothing
    assert(spans(rows, k = 3) === Seq(("en", 2L, 0L, 0L, 0L, 0L)))
  }

  test("hashed (8-byte key) form ≡ string form on the live planted corpus") {
    val corpus = LlmQueries.plantedFull(Tables.documents(spark, sf))
    val s = SamplingQueries.substringSpans(corpus, SamplingQueries.SpanK,
      hashed = false).collect().map(_.toSeq).toSeq
    val h = SamplingQueries.substringSpans(corpus, SamplingQueries.SpanK,
      hashed = true).collect().map(_.toSeq).toSeq
    assert(s === h)
    // and the planted copies genuinely fire: every lang's planted pair
    // count is visible as docs-with-spans ≥ 2 wherever a source exists
    assert(s.map(_(2).asInstanceOf[Long]).sum > 0)
  }

  test("persisted index: write → read → spans ≡ the composed hashed plan, " +
      "and the gate's distinct-gram projection matches buildIndex") {
    val corpus = LlmQueries.plantedFull(Tables.documents(spark, sf))
    val base = java.nio.file.Files
      .createTempDirectory("graft_substr_ix_").toString
    SubstringIndex.write(corpus, base)
    val ix = SubstringIndex.read(spark, base)
    val fromDisk = SubstringIndex.spans(corpus, ix).collect().map(_.toSeq).toSeq
    val composed = SamplingQueries.substringSpans(corpus,
      SamplingQueries.SpanK, hashed = true).collect().map(_.toSeq).toSeq
    assert(fromDisk === composed)
    // the streaming gate's screen set is a projection of the SAME
    // artifact: identical distinct (gram, owner) set as its composed
    // builder
    val gateFromDisk = graft.streaming.StreamingSubstring
      .fromPersisted(spark, base).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gateComposed = graft.streaming.StreamingSubstring
      .buildIndex(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gateFromDisk === gateComposed && gateFromDisk.nonEmpty)
  }

  test("append-then-probe ≡ full rebuild, and spansAgainst screens a new " +
      "shard without re-tokenizing the corpus") {
    val a = frame(Seq(
      (1L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma"),
      (2L, "en", "tau upsilon phi chi psi omega one two three four five six " +
        "seven eight nine ten eleven twelve")))
    // doc 3 lifts doc 1's first 16 tokens into a different tail; doc 4
    // is entirely novel vocabulary
    val lifted = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi"
    val b = frame(Seq(
      (3L, "en", s"$lifted utterly different ending words"),
      (4L, "en", "crimson lattice orchid pylon quartz rivet sable timber " +
        "umber vortex walnut xenon yarrow zeppelin anchor bobbin cedar")))
    val base = java.nio.file.Files
      .createTempDirectory("graft_substr_app_").toString
    SubstringIndex.write(a, base)
    SubstringIndex.append(b, base)
    val appended = SubstringIndex.read(spark, base)
      .collect().map(_.toSeq).toSet
    val rebase = java.nio.file.Files
      .createTempDirectory("graft_substr_reb_").toString
    SubstringIndex.write(a.unionByName(b), rebase)
    val rebuilt = SubstringIndex.read(spark, rebase)
      .collect().map(_.toSeq).toSet
    assert(appended === rebuilt && appended.nonEmpty)
    // incremental probe: only the lifted doc lands spans — one maximal
    // 16-token span (k=15 → 2 member grams merging)
    val got = SubstringIndex.spansAgainst(b, SubstringIndex.read(spark, base)
      .filter(col("doc_id") <= 2L)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === Seq(("en", 2L, 1L, 1L, 16L, 16L, 3L)), got.toString)
  }

  test("l33 DQ equals a driver-side brute-force recompute at sf0.001") {
    val corpus = LlmQueries.plantedFull(Tables.documents(spark, sf))
      .select("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val k = SamplingQueries.SpanK
    val grams = corpus.flatMap { case (lang, id, text) =>
      val ta = text.toLowerCase.split("\\s+")
      if (ta.length < k) Seq.empty
      else (0 to ta.length - k).map(i =>
        (ta.slice(i, i + k).mkString(" "), lang, id, i))
    }
    val repeated = grams.groupBy(_._1)
      .filter(_._2.map(_._3).distinct.size >= 2).keySet
    val perDocSpans = grams.filter(g => repeated(g._1))
      .groupBy(g => (g._2, g._3)).map { case ((lang, id), hs) =>
        val ps = hs.map(_._4).sorted
        val spans = ps.foldLeft(List.empty[(Int, Int)]) {
          case (acc, p) if acc.nonEmpty && p <= acc.head._2 =>
            (acc.head._1, math.max(acc.head._2, p + k)) :: acc.tail
          case (acc, p) => (p, p + k) :: acc
        }
        (lang, id, spans.reverse)
      }
    val expect = perDocSpans.groupBy(_._1).map { case (lang, docs) =>
      val all = docs.flatMap(_._3)
      (lang, docs.size.toLong, all.size.toLong,
        all.map(s => (s._2 - s._1).toLong).sum,
        all.map(s => (s._2 - s._1).toLong).max,
        docs.map(_._2).toSeq.distinct.sum)
    }.toSeq.sortBy(_._1)
    val got = SamplingQueries.l33.fn(spark, sf).collect()
      .filter(_.getLong(2) > 0)
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toSeq
    assert(got === expect, s"got $got\nexpect $expect")
  }

  // ------------------------------------------------ l47 span decontam

  test("l64 substring cut: non-owner occurrences are removed, the " +
      "smallest-id owner keeps its text, and token accounting closes") {
    // docs 1 < 2 < 3 share an 8-token paragraph inside different
    // surroundings (k = 3): doc 1 owns it; 2 and 3 cut it
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val rows = frame(Seq(
      (1L, "en", s"one two $shared nine ten"),
      (2L, "en", s"$shared completely different tail words here"),
      (3L, "en", s"prefix padding tokens then $shared trailing bits")))
    val got = SamplingQueries.exactSubstrCut(rows, k = 3)
      .select("doc_id", "text_clean", "n_tokens", "n_cut_tokens")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === (s"one two $shared nine ten", 12L, 0L),
      "the owner keeps every token")
    assert(got(2L) === ("completely different tail words here", 13L, 8L))
    assert(got(3L) === ("prefix padding tokens then trailing bits", 14L, 8L))
    // per-doc conservation: kept tokens = before − cut
    got.values.foreach { case (clean, before, cut) =>
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(kept.toLong === before - cut)
    }
  }

  test("l64 reaches the ExactSubstr fixpoint on the planted corpus: the " +
      "cleaned corpus has ZERO cross-document repeated spans, and the " +
      "planted copies are the docs that cut") {
    val corpus = graft.operators.LlmQueries.plantedFull(
      Tables.documents(spark, sf))
    val cut = SamplingQueries.exactSubstrCut(corpus, SamplingQueries.SpanK)
      .localCheckpoint()
    // keep-one semantics corpus-wide: every planted copy long enough
    // to carry a 15-gram shares it with its smaller-id source, so it
    // MUST cut. (Source docs may cut too — the generator's NATURAL
    // near-dup families repeat spans across source docs, where the
    // smallest family member is the keeper; the owner-keeps rule
    // itself is pinned exactly on the fixture test above.)
    val sourceMax = Tables.documents(spark, sf)
      .agg(max("doc_id")).collect()(0).getLong(0)
    val cutDocs = cut.filter(col("n_cut_tokens") > 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val copies = corpus.filter(col("doc_id") > sourceMax)
      .filter(size(split(lower(col("text")), "\\s+")) >=
        SamplingQueries.SpanK)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(copies.nonEmpty, "the planted corpus must contain copies")
    assert(copies.subsetOf(cutDocs),
      s"every gram-bearing planted copy must cut: missing ${copies -- cutDocs}")
    // fixpoint: re-running l33's accounting over the CLEANED corpus
    // finds nothing — the cut removed every cross-doc repeat ≥ k
    val residual = SamplingQueries.substringSpans(
      cut.select(col("lang"), col("doc_id"),
        col("text_clean").as("text")),
      SamplingQueries.SpanK, hashed = true)
      .agg(sum("n_spans")).collect()(0).getLong(0)
    assert(residual === 0L, s"cleaned corpus still has $residual spans")
  }

  test("l65 unified cut: a WITHIN-doc repeat (invisible to l64) is cut " +
      "back to its first occurrence; cross-doc sites cut as before") {
    val p = "alpha beta gamma delta epsilon zeta eta theta"
    val rows = frame(Seq(
      // the paragraph twice in ONE doc, separated by two tokens
      (1L, "en", s"$p one two $p"),
      // and once in a later doc
      (2L, "en", s"x y $p z")))
    val global = SamplingQueries.exactSubstrCutGlobal(rows, k = 3)
      .select("doc_id", "text_clean", "n_cut_tokens").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(global(1L) === (s"$p one two", 8L),
      "the second within-doc occurrence must cut")
    assert(global(2L) === ("x y z", 8L))
    // the cross-doc-only criterion (l64) keeps doc 1 WHOLE — doc 1
    // owns the gram family, and owners keep all their occurrences
    val crossOnly = SamplingQueries.exactSubstrCut(rows, k = 3)
      .select("doc_id", "n_cut_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(crossOnly(1L) === 0L && crossOnly(2L) === 8L,
      s"l64 must be blind to the within-doc repeat: $crossOnly")
  }

  test("l65 fixpoint: after the unified cut NO 15-gram occurs twice " +
      "anywhere in the cleaned corpus — across or within documents") {
    val corpus = graft.operators.LlmQueries.plantedFull(
      Tables.documents(spark, sf))
    val cleaned = SamplingQueries.exactSubstrCutGlobal(
        corpus, SamplingQueries.SpanK)
      .select(col("lang"), col("doc_id"), col("text_clean").as("text"))
      .localCheckpoint()
    val maxOcc = SamplingQueries
      .spanGrams(cleaned, SamplingQueries.SpanK, hashed = true)
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .agg(coalesce(max("n"), lit(0L))).collect()(0).getLong(0)
    assert(maxOcc <= 1L, s"a gram still occurs $maxOcc times")
  }

  test("l47 span-coverage decontam equals a driver-side recompute, flags " +
      "every fully-planted doc, and passes every half-planted one") {
    val k = SamplingQueries.SpanContamK
    val labeled = SamplingQueries.spanContamCorpus(spark, sf)
      .select("lang", "doc_id", "text", "split").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))

    def gramsOf(text: String): Seq[(String, Int)] = {
      val ta = text.toLowerCase.split("\\s+")
      if (ta.length < k) Seq.empty
      else (0 to ta.length - k).map(i => (ta.slice(i, i + k).mkString(" "), i))
    }
    val evalGrams = labeled.filter(_._4 == "test")
      .flatMap(d => gramsOf(d._3).map(_._1)).toSet
    // per train doc: merged-span coverage against the eval gram set
    val perDoc = labeled.filter(_._4 == "train").map { case (lang, id, text, _) =>
      val nTok = text.toLowerCase.split("\\s+").length.toLong
      val ps = gramsOf(text).collect { case (g, p) if evalGrams(g) => p }
      val covered = ps.foldLeft(List.empty[(Int, Int)]) {
        case (acc, p) if acc.nonEmpty && p <= acc.head._2 =>
          (acc.head._1, math.max(acc.head._2, p + k)) :: acc.tail
        case (acc, p) => (p, p + k) :: acc
      }.map(s => (s._2 - s._1).toLong).sum
      (lang, id, nTok, covered)
    }
    def flagged(d: (String, Long, Long, Long)) = d._4 * 10000L >= d._3 * 8000L
    val expect = perDoc.groupBy(_._1).map { case (lang, ds) =>
      (lang, ds.length.toLong, ds.count(_._4 > 0).toLong,
        ds.count(flagged).toLong, ds.map(_._4).sum,
        ds.filter(flagged).map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val got = SamplingQueries.l47.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect, s"got $got\nexpect $expect")

    // the planted classes behave: every even-test-id TAIL plant (pure
    // eval text) is flagged; every odd-id tail+reversed plant overlaps
    // but stays under the 80% bar
    val baseIds = labeled.filter(d => d._4 != null).map(_._2)
    val off = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .agg(max("doc_id")).collect().head.getLong(0) + 1
    val fullIds = labeled.filter(d => d._4 == "test" && d._2 % 2 == 0)
      .map(_._2 + off).toSet
    val partialIds = labeled.filter(d => d._4 == "test" && d._2 % 2 == 1)
      .map(_._2 + off).toSet
    val byId = perDoc.map(d => d._2 -> d).toMap
    assert(fullIds.nonEmpty && partialIds.nonEmpty)
    fullIds.foreach { id =>
      assert(flagged(byId(id)), s"full plant $id must be flagged") }
    partialIds.foreach { id =>
      val d = byId(id)
      assert(d._4 > 0, s"partial plant $id must overlap")
      assert(!flagged(d), s"partial plant $id must stay under the bar")
    }
    assert(baseIds.nonEmpty)
  }

  test("l47 plan: the eval gram set broadcasts into the semi join — the " +
      "train corpus' grams never shuffle for the probe") {
    val df = SamplingQueries.l47.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"eval-side broadcast semi join expected:\n$plan")
  }
}
