package graft.operators

import graft.{Session, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[CorpusBuild]] — the capstone composition — pinned stage-for-stage
  * against the standalone components it composes: the ledger is a
  * PARTITION of the raw docs, the gate stage equals a standalone
  * release over a twin init, curation equals a driver-side recompute
  * of l29's duplicate rule, sampling/split equal their md5 predicates,
  * the manifest reconciles with the ledger AND with the shard files on
  * disk, and a re-build of the same raw admits nothing (the appends
  * are real). */
class CorpusBuildSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private def docsAll = Tables.documents(spark, sf)
    .filter(col("text").isNotNull)
    .select("lang", "doc_id", "text")

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** v1-build fixture: artifacts initialized from an EMPTY corpus (the
    * from-scratch case), raw = the whole sf0.001 corpus plus one
    * null-text row. */
  private def freshBase(): String = {
    val base = tmp("graft_build")
    ReleaseFlow.init(docsAll.limit(0), base)
    base
  }

  private def rawWithNull = docsAll.unionByName(
    docsAll.limit(1).select(col("lang"),
      (col("doc_id") + lit(77000000L)).as("doc_id"),
      lit(null).cast("string").as("text")))

  test("ledger is a partition of the raw docs; stages and outcomes " +
      "use the declared vocabulary; manifest reconciles with the " +
      "ledger and the shard files on disk") {
    val base = freshBase()
    val shards = tmp("graft_build_shards")
    val res = CorpusBuild.build(spark, rawWithNull, base, Some(shards))
    val ledger = res.ledger.collect()
    val rawIds = rawWithNull.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ledger.map(_.getLong(1)).toSet === rawIds, "ledger id coverage")
    assert(ledger.length === rawIds.size, "exactly one ledger row per doc")
    val byStage = ledger.groupBy(_.getString(2)).view
      .mapValues(_.map(_.getString(3)).toSet).toMap
    assert(byStage("cleanse") === Set("cleaned_out"))
    assert(byStage.get("gate").forall(_.subsetOf(Set("corpus_duplicate",
      "near_duplicate", "verbatim_repeat", "contaminated", "low_quality",
      "repetitive", "model_filtered"))))
    assert(byStage.get("curation").forall(_ === Set("near_duplicate")))
    assert(byStage.get("sampling").forall(_ === Set("sampled_out")))
    assert(byStage("manifest").subsetOf(Set("train", "val", "test")))
    // manifest ≡ ledger's manifest stage, cell for cell
    val fromLedger = res.ledger.filter(col("stage") === "manifest")
      .groupBy("lang", "outcome")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val fromManifest = res.manifest
      .groupBy("lang", "split")
      .agg(sum("n_docs").as("n"), sum("doc_id_sum").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(fromManifest === fromLedger, "manifest vs ledger")
    // shard files on disk hold EXACTLY the manifest's train rows,
    // shard for shard
    val trainShards = res.manifest.filter(col("split") === "train")
      .groupBy("shard")
      .agg(sum("n_docs").as("n"), sum("doc_id_sum").as("s"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(trainShards.nonEmpty, "fixture must land train shards")
    for ((shard, (n, s)) <- trainShards) {
      val f = EpochShards.readShard(spark, shards, 0, shard)
        .agg(count(lit(1)), sum("doc_id")).collect()(0)
      assert(f.getLong(0) === n && f.getLong(1) === s,
        s"shard $shard: file vs manifest")
    }
  }

  test("gate stage equals a standalone release over a twin init; " +
      "curation equals a driver-side recompute of l29's duplicate " +
      "rule; sampling and split equal their md5 predicates") {
    val base = freshBase()
    val twin = freshBase()
    val res = CorpusBuild.build(spark, docsAll, base)
    val ledger = res.ledger.collect()
      .map(r => r.getLong(1) -> ((r.getString(2), r.getString(3)))).toMap
    // ---- gate stage ≡ standalone release
    val twinDecisions = ReleaseFlow.release(spark, docsAll, twin)
      .select("doc_id", "decision").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, dec) <- twinDecisions if dec != "admit")
      assert(ledger(id) === (("gate", dec)), s"gate $id")
    val admittedIds = twinDecisions.collect {
      case (id, "admit") => id }.toSet
    // ---- curation ≡ driver-side union-find over verified pairs +
    // exact-hash groups (independent recompute, naive data structures)
    val admitted = docsAll
      .join(docsAll.sparkSession.createDataFrame(
        admittedIds.toSeq.map(Tuple1(_))).toDF("doc_id"),
        Seq("doc_id"), "left_semi")
    val pairs = LlmQueries.candidatePairs(admitted)
      .filter(col("jac_e4") >= 6000).select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    pairs.foreach { case (a, b) => union(a, b) }
    // exact-hash groups union in (l29's rule unions the exact canon)
    admitted.withColumn("h", LlmQueries.normHash)
      .select("h", "doc_id").collect()
      .groupBy(_.getString(0)).values.foreach { g =>
        val ids = g.map(_.getLong(1)); ids.tail.foreach(union(ids.head, _))
      }
    val canon = admittedIds.groupBy(find).values
      .flatMap(c => c.filter(_ != c.min)).toSet
    val curationDropped = ledger.collect {
      case (id, ("curation", "near_duplicate")) => id }.toSet
    assert(curationDropped === canon, "curation vs naive union-find")
    // ---- sampling + split ≡ the md5 predicates, recomputed directly
    val md = java.security.MessageDigest.getInstance("MD5")
    def h4(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(4)
    val thr = Map("en" -> "2000", "de" -> "4000", "es" -> "8000",
      "fr" -> "c000", "zh" -> "zzzz")
    val langOf = docsAll.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (id <- admittedIds if !canon(id)) {
      val keep = h4(s"$id:${langOf(id)}") < thr.getOrElse(langOf(id), "0000")
      val got = ledger(id)
      if (!keep) assert(got === (("sampling", "sampled_out")), s"sample $id")
      else {
        val sh = h4(s"$id:split")
        val split = if (sh < "c000") "train" else if (sh < "e000") "val"
          else "test"
        assert(got === (("manifest", split)), s"split $id")
      }
    }
  }

  test("re-building the same raw admits nothing: every former admission " +
      "re-labels at the gate (the build's appends reached the artifacts) " +
      "and the manifest is empty") {
    val base = freshBase()
    val first = CorpusBuild.build(spark, docsAll, base)
    assert(first.manifest.count() > 0)
    val again = CorpusBuild.build(spark, docsAll, base)
    assert(again.manifest.count() === 0L, "nothing survives a replay")
    val stages = again.ledger.select("stage").distinct()
      .collect().map(_.getString(0)).toSet
    assert(stages === Set("gate"), s"replay stops at the gate: $stages")
  }

  test("curative flag: a quote-carrying doc is rejected whole by the " +
      "default build and admitted CURED by the curative one, with the " +
      "cleaned tokens in the manifest") {
    import spark.implicits._
    val corpusWords = (1 to 60).map(i => s"corpusterm$i")
    val corpus = Seq(("en", 1L, corpusWords.mkString(" ")))
      .toDF("lang", "doc_id", "text")
    // 40 novel tokens + a 20-token indexed lift; novel half long enough
    // to clear the 200-char quality floor on its own after the cure
    val novel = (1 to 40).map(i => s"novelword$i")
    // id 52: md5('52:en') < '2000' (passes the en sample draw) and
    // md5('52:split') < 'c000' (lands train) — chosen so the cured doc
    // flows through to the manifest deterministically
    val raw = Seq(("en", 52L,
      (novel.take(20) ++ corpusWords.slice(20, 40) ++ novel.drop(20))
        .mkString(" ")))
      .toDF("lang", "doc_id", "text")
    val baseA = tmp("graft_build_cure_off")
    val baseB = tmp("graft_build_cure_on")
    ReleaseFlow.init(corpus, baseA)
    ReleaseFlow.init(corpus, baseB)
    val off = CorpusBuild.build(spark, raw, baseA)
    assert(off.ledger.collect().map(r =>
      (r.getString(2), r.getString(3))).toSeq ===
      Seq(("gate", "verbatim_repeat")),
      "default build rejects the carrier whole")
    val on = CorpusBuild.build(spark, raw, baseB,
      cfg = CorpusBuild.Config(curative = true))
    val row = on.ledger.collect()
    assert(row.length === 1 && row(0).getString(2) === "manifest",
      s"curative build admits the cured carrier: ${row.mkString}")
    // the manifest counts the CURED tokens: 40 kept whitespace words,
    // each "novelwordN" = 2 pre-tokenizer tokens ([a-z]+ run + digit
    // run) — the 20 cut corpus terms' 40 tokens are GONE
    val toks = on.manifest.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(toks === 80L, s"manifest must count cleaned tokens, got $toks")
    // the cure's per-doc accounting rides the gate frame (the ledger
    // compresses to (stage, outcome) by design)
    val cut = on.gate.select("doc_id", "n_cut_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cut === Map(52L -> 20L),
      s"gate frame must carry the cure accounting: $cut")
    // and the artifact holds the cleaned bytes: the cured text
    // re-offered reads corpus_duplicate
    val probe = ReleaseFlow.release(spark,
      Seq(("en", 60L, (novel.take(20) ++ novel.drop(20)).mkString(" ")))
        .toDF("lang", "doc_id", "text"), baseB)
      .select("decision").collect().map(_.getString(0)).toSeq
    assert(probe === Seq("corpus_duplicate"))
  }

  test("cleanse flag: on this single-line corpus the C4 page bar nulls " +
      "every doc (the documented opt-in semantics) and the ledger says " +
      "so; planted multi-line docs survive it") {
    import spark.implicits._
    val base = freshBase()
    val res = CorpusBuild.build(spark, docsAll, base,
      cfg = CorpusBuild.Config(cleanse = true))
    assert(res.ledger.filter(col("stage") =!= "cleanse").count() === 0L,
      "single-line docs cannot pass the >=3-kept-lines page bar")
    // a doc with three terminal-punctuated >=5-word lines passes the
    // battery and flows to the gate
    val base2 = freshBase()
    val lined = Seq(("en", 1L, Seq(
      "the first sentence has at least five words.",
      "the second sentence also has five words.",
      "the third sentence rounds out the page.").mkString("\n") +
      "\nno punctuation line gets dropped"))
      .toDF("lang", "doc_id", "text")
    val res2 = CorpusBuild.build(spark, lined, base2,
      cfg = CorpusBuild.Config(cleanse = true))
    val row = res2.ledger.collect()
    assert(row.length === 1 && row(0).getString(2) != "cleanse",
      s"the lined doc must reach the gate: ${row.mkString}")
  }
}
