package graft.operators

import graft.{Session, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan-shape pins for the round-7 operators: j9 as-of join,
  * j10 range join, l20 stratified sampling, l21 sequence packing, a9
  * exact percentiles.
  *
  * The equivalence cases re-derive each result with the NAIVE definition
  * (inequality join / local recompute) so the scale-shaped plan is
  * checked against the semantics inside Spark itself, independently of
  * the driver's DuckDB oracle.
  */
class TemporalSamplingSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- j9

  test("j9 as-of join equals the naive inequality-join argmax") {
    val e = Tables.events(spark, sf)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("vk"), col("ts_us").as("vt"), col("event_id").as("vid"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pk"), col("ts_us").as("pt"), col("event_id").as("pid"))
    val naive = p.join(v, col("vk") === col("pk") && col("vt") <= col("pt"), "left")
      .groupBy("pid", "pt")
      .agg(max(when(col("vid").isNotNull, struct(col("vt"), col("vid")))).as("m"))
      .select(
        col("pid").as("purchase_id"),
        coalesce(col("m.vid"), lit(-1L)).as("view_id"),
        coalesce(expr("(pt - m.vt) div 1000000"), lit(-1L)).as("gap_sec"))
      .orderBy("purchase_id")
    val got = TemporalJoinQueries.j9.fn(spark, sf)
    assert(got.collect().toSeq === naive.collect().toSeq)
  }

  test("j9 plans one key shuffle and NO join operator") {
    val df = TemporalJoinQueries.j9.fn(spark, sf)
    df.collect()
    // the AQE toString appends the pre-adaptive "Initial Plan" — count
    // operators in the final plan section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), s"as-of must not materialize pairs:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx === 1, s"expected exactly 1 key shuffle, got $hashEx")
  }

  test("j9 has real cutoffs: some purchases precede every view of their user") {
    val got = TemporalJoinQueries.j9.fn(spark, sf).collect()
    assert(got.exists(_.getAs[Long]("view_id") === -1L))
    assert(got.count(_.getAs[Long]("view_id") != -1L) > got.length / 2)
  }

  test("the generic asOfJoin reuses on a different pair (signup ← latest click)") {
    val e = Tables.events(spark, sf)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("ck"), col("ts_us").as("ct"), col("event_id").as("cid"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("sk"), col("ts_us").as("st"), col("event_id").as("sid"))
    val got = TemporalJoins.asOfJoin(signups, clicks,
        probeKey = "sk", buildKey = "ck",
        probeTime = "st", buildTime = "ct", tieBreak = "cid",
        carried = Seq("cid"))
      .select(col("sid"), coalesce(col("cid"), lit(-1L)).as("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val naive = signups.join(clicks,
        col("ck") === col("sk") && col("ct") <= col("st"), "left")
      .groupBy("sid")
      .agg(max(when(col("cid").isNotNull, struct(col("ct"), col("cid")))).as("m"))
      .select(col("sid"), coalesce(col("m.cid"), lit(-1L)).as("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got === naive)
    assert(got.nonEmpty && got.exists(_._2 != -1L))
  }

  // ------------------------------------------------------------- j10

  test("j10 bucketed range join equals the naive inequality join") {
    val winUs = 4L * 3600 * 1000000
    val e = Tables.events(spark, sf)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("vk"), col("ts_us").as("vt"), col("event_id").as("vid"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pk"), col("ts_us").as("pt"), col("event_id").as("pid"))
    val naive = v.join(p,
        col("vk") === col("pk") &&
          col("pt") >= col("vt") && col("pt") < col("vt") + lit(winUs))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("vid")).as("n_views"),
        countDistinct(col("pid")).as("n_purchases"),
        coalesce(sum(expr("(pt - vt) div 1000000")), lit(0L)).as("sum_lag_sec"))
    val got = TemporalJoinQueries.j10.fn(spark, sf)
    assert(got.collect().toSeq === naive.collect().toSeq)
    assert(got.collect()(0).getAs[Long]("n_pairs") > 0)
  }

  test("j10 joins on the (user, bucket) equi keys, not a nested loop") {
    val df = TemporalJoinQueries.j10.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(raw"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[vk#\d+L, _lb#\d+L\]".r
      .findFirstIn(plan).isDefined,
      s"range join must equi-join on (user, bucket):\n$plan")
    assert(!plan.contains("NestedLoop"))
  }

  // ------------------------------------------------------------- l20

  test("l20 sampling is monotone in the rate and consistent with its accounting") {
    def ids(thr: String): Set[Long] =
      Tables.documents(spark, sf)
        .filter(col("lang") === "en" &&
          substring(md5(concat_ws(":", col("doc_id"), col("lang"))), 1, 4) < lit(thr))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val at2000 = ids("2000"); val at4000 = ids("4000"); val all = ids("zzzz")
    // Raising a stratum's rate only ADDS documents — the property that
    // makes deterministic-hash sampling re-mixable at scale.
    assert(at2000.subsetOf(at4000))
    assert(at4000.subsetOf(all))
    val enTotal = Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    assert(all.size.toLong === enTotal)
    val row = SamplingQueries.l20.fn(spark, sf)
      .collect().find(_.getString(0) == "en").get
    assert(row.getAs[Long]("n_sampled") === at2000.size.toLong)
    assert(row.getAs[Long]("doc_id_sum") === at2000.sum)
  }

  // ------------------------------------------------------------- l21

  test("l21 packing equals a local greedy concat-and-chunk recompute") {
    val ctx = 256L
    val pat = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")
    def nTok(t: String): Long = {
      val m = pat.matcher(t.toLowerCase(java.util.Locale.ROOT))
      var c = 0L; while (m.find()) c += 1; c
    }
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), nTok(r.getString(2))))
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rows) =>
      val toks = rows.sortBy(_._2).map(_._3)
      val cums = toks.scanLeft(0L)(_ + _).tail
      val total = if (cums.isEmpty) 0L else cums.last
      val starts = cums.zip(toks).map { case (cum, t) => cum - t }
      val nStart = starts.map(_ / ctx).distinct.size.toLong
      val nStraddle = starts.zip(cums).zip(toks).count {
        case ((st, cum), t) => t > 0 && st / ctx != (cum - 1) / ctx
      }.toLong
      val nChunks = (total + ctx - 1) / ctx
      val fill = math.round(total * 10000.0 / (nChunks * ctx))
      (src, rows.length.toLong, total, nStart, nStraddle, nChunks, fill)
    }
    val got = SamplingQueries.l21.fn(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
    // the packing must actually straddle/chunk at this context length,
    // or the operator degenerates to one chunk per shard
    assert(got.map(_._6).sum > got.length.toLong)
  }

  // ------------------------------------------------------------- l22

  test("l22 splits are a total, disjoint partition with every split non-empty") {
    val rows = SamplingQueries.l22.fn(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getAs[Long]("n"), r.getAs[Long]("doc_id_sum"))))
      .toMap
    val docs = Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("doc_id").as("s"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
    // totality: per language, the three splits sum to the full corpus in
    // BOTH count and identity checksum — no doc dropped or double-counted
    for ((lang, (n, s)) <- docs) {
      val splits = Seq("train", "val", "test").flatMap(sp => rows.get((lang, sp)))
      assert(splits.map(_._1).sum === n, s"$lang count")
      assert(splits.map(_._2).sum === s, s"$lang checksum")
    }
    // the corpus-wide split is genuinely three-way (train dominates)
    def tot(sp: String) = rows.collect { case ((_, `sp`), (n, _)) => n }.sum
    assert(tot("train") > tot("val") && tot("train") > tot("test"))
    assert(tot("val") > 0 && tot("test") > 0)
  }

  // ------------------------------------------------------------- l23

  test("l23 manifest is consistent with the operators it composes") {
    val manifest = SamplingQueries.l23.fn(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("n_docs"))).toMap
    assert(manifest.nonEmpty && manifest.values.forall(_ > 0))
    // curation can only REMOVE docs: each manifest cell is bounded by
    // l22's split cell, and each language total by l20's sample size
    val splits = SamplingQueries.l22.fn(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("n"))).toMap
    for ((cell, n) <- manifest)
      assert(n <= splits(cell), s"$cell: manifest $n > split ${splits(cell)}")
    val sampled = SamplingQueries.l20.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_sampled"))).toMap
    for ((lang, cells) <- manifest.groupBy(_._1._1))
      assert(cells.values.sum <= sampled(lang),
        s"$lang: manifest ${cells.values.sum} > sampled ${sampled(lang)}")
  }

  test("rangeJoin pairs negative epoch times exactly (floor-div buckets)") {
    import spark.implicits._
    val w = 1000L
    // times straddling zero — the case where truncate-toward-zero and
    // floor-division bucket indices diverge
    val left = Seq((1L, -2500L, 10L), (1L, -1500L, 11L), (1L, -500L, 12L),
        (1L, 300L, 13L), (2L, -999L, 14L))
      .toDF("lk", "lt", "lid")
    val right = Seq((1L, -2400L, 20L), (1L, -1400L, 21L), (1L, -600L, 22L),
        (1L, -100L, 23L), (1L, 200L, 24L), (1L, 1301L, 25L), (2L, -1L, 26L))
      .toDF("rk", "rt", "rid")
    val got = TemporalJoins.rangeJoin(left, right, "lk", "rk", "lt", "rt", w)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val naive = left.join(right, col("lk") === col("rk") &&
        col("rt") >= col("lt") && col("rt") < col("lt") + lit(w))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === naive)
    // the pair set genuinely exercises cross-zero windows and excludes
    // an out-of-window candidate
    assert(naive.contains((12L, 23L)) && naive.contains((14L, 26L)))
    assert(!naive.contains((13L, 25L)))
  }

  test("asOfJoin carries ALL columns from the SAME latest build row, " +
      "even when one carried value is legitimately null") {
    import spark.implicits._
    // build rows: at t=10 both values set; at t=20 (the latest) `b` is
    // null. Per-column last(ignoreNulls) would mix rows (a from t=20,
    // b from t=10); the struct carry must report b AS NULL.
    val build = Seq((1L, 10L, 100L, Some("old")), (1L, 20L, 200L, None))
      .toDF("bk", "bt", "a", "b")
    val probe = Seq((1L, 25L, 900L)).toDF("pk", "pt", "pid")
    val row = TemporalJoins.asOfJoin(probe, build,
        probeKey = "pk", buildKey = "bk",
        probeTime = "pt", buildTime = "bt", tieBreak = "a",
        carried = Seq("a", "b"))
      .select("pid", "bt", "a", "b").collect()(0)
    assert(row.getLong(0) === 900L)
    assert(row.getLong(1) === 20L, "must carry from the latest build row")
    assert(row.getLong(2) === 200L)
    assert(row.isNullAt(3), "null in the latest row must stay null, not " +
      "fall back to an older row's value")
  }

  test("Sampling draws NULL for null keys (never a shared constant draw)") {
    import graft.functions.Sampling
    import spark.implicits._
    val df = Seq(Some("k1"), Some("k2"), None, None).toDF("k")
    val draws = df.select(Sampling.draw(col("k"), lit("salt")).as("d")).collect()
    assert(draws.count(_.isNullAt(0)) === 2, "null keys must draw null")
    assert(draws.filterNot(_.isNullAt(0)).map(_.getString(0)).distinct.length === 2)
    // null draw fails every keep predicate and labels NULL in the split
    assert(df.filter(Sampling.keep(col("k"), lit("salt"), "zzzz")).count() === 2L)
    val labels = df.select(Sampling.splitLabel(col("k"), lit("s"),
        Seq(("train", "8000")), "test").as("l")).collect()
    assert(labels.count(_.isNullAt(0)) === 2,
      "null keys must label NULL, not silently join the last split")
  }

  test("the generic temporal joins reject colliding column names up front") {
    val e = Tables.events(spark, sf).select("user_id", "ts_us", "event_id")
    val ex1 = intercept[IllegalArgumentException](
      TemporalJoins.asOfJoin(e, e, "user_id", "user_id",
        "ts_us", "ts_us", "event_id", Seq("event_id")))
    assert(ex1.getMessage.contains("disjoint"))
    val ex2 = intercept[IllegalArgumentException](
      TemporalJoins.rangeJoin(e, e, "user_id", "user_id", "ts_us", "ts_us", 1000L))
    assert(ex2.getMessage.contains("disjoint"))
    val ex3 = intercept[IllegalArgumentException](
      TemporalJoins.rangeJoin(
        e.select(col("user_id").as("a"), col("ts_us").as("at"), col("event_id").as("ai")),
        e.select(col("user_id").as("b"), col("ts_us").as("bt"), col("event_id").as("bi")),
        "a", "b", "at", "bt", 0L))
    assert(ex3.getMessage.contains("positive"))
  }

  test("the generic Sampling primitives reuse on a different table and key") {
    import graft.functions.Sampling
    val ord = Tables.orders(spark, sf)
    def ids(thr: String) = ord
      .filter(Sampling.keep(col("o_orderkey"), lit("trainmix"), thr))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val half = ids("8000"); val all = ids("zzzz")
    assert(ids("2000").subsetOf(half) && half.subsetOf(all))
    assert(all.size.toLong === ord.count())
    // a plausible rate actually realizes (±20% of 50% at this scale)
    assert(math.abs(half.size.toDouble / all.size - 0.5) < 0.1)
    // distinct salts draw independently: same key set, different sample
    val otherSalt = ord.filter(Sampling.keep(col("o_orderkey"), lit("evalmix"), "8000"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(otherSalt != half)
  }

  // ------------------------------------------- packedOffsets (l21 at scale)

  test("two-level prefix-sum packing equals the serial per-source offsets, " +
      "and its data-sized window partitions by (source, sub)") {
    val docs = Tables.documents(spark, sf)
    val serial = {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.select(col("source"), col("doc_id"),
          expr("CAST(size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)) AS BIGINT)").as("n_tok"))
        .withColumn("start", sum("n_tok").over(w) - col("n_tok"))
        .select("source", "doc_id", "start")
    }
    for (subSize <- Seq(4L, 64L, 1000000L)) { // many subs … one sub per source
      val scaled = SamplingQueries.packedOffsets(docs, subSize)
        .select("source", "doc_id", "start")
      val a = serial.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
      val b = scaled.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(b === a, s"subSize=$subSize")
    }
    // the data-sized cumsum window runs per (source, sub), never per source
    val df = SamplingQueries.packedOffsets(docs, 4L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(raw"windowspecdefinition\(source#\d+, sub#\d+L, doc_id".r
      .findFirstIn(plan).isDefined,
      s"expected the row window partitioned by (source, sub):\n$plan")
  }

  test("packingOffsets selects the serial window under the shard bound and " +
      "the two-level prefix sum above it — offsets identical across the switch") {
    val dd = Tables.documents(spark, sf)
    val serial = SamplingQueries.packingOffsets(dd) // default bound ≫ sf0.001
    val packed = SamplingQueries.packingOffsets(dd, maxShardRows = 16L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "doc_id", "n_tok", "start").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq
    val a = rows(serial); val b = rows(packed)
    assert(a === b, "offsets must not depend on the selected path")
    assert(a.nonEmpty)
    // the selector genuinely switched plans: serial windows per source,
    // packed windows per (source, sub)
    val sPlan = serial.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(raw"windowspecdefinition\(source#\d+, doc_id".r.findFirstIn(sPlan).isDefined,
      s"expected the serial per-source window:\n$sPlan")
    val pPlan = packed.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(raw"windowspecdefinition\(source#\d+, sub#\d+L, doc_id".r.findFirstIn(pPlan).isDefined,
      s"expected the (source, sub) sub-shard window:\n$pPlan")
    // and l21's cataloged aggregate is invariant to the forced switch
    val viaPacked = packed.withColumn("cum", col("start") + col("n_tok"))
      .groupBy("source").agg(count(lit(1)).as("n_docs"), sum("n_tok").as("total_tokens"))
      .orderBy("source").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val viaCatalog = SamplingQueries.l21.fn(spark, sf)
      .select("source", "n_docs", "total_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaPacked === viaCatalog)
  }

  // ------------------------------------------------------------- l25

  test("l25 decontamination equals a local recompute of train/test 5-gram overlap") {
    val rows = Tables.documents(spark, sf).select("lang", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def md4(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(4)
    def splitOf(id: Long): String = {
      val h = md4(s"$id:split")
      if (h < "c000") "train" else if (h < "e000") "val" else "test"
    }
    def grams(t: String): Set[String] = {
      val ta = t.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
      if (ta.length < 5) Set.empty
      else ta.sliding(5).map(_.mkString(" ")).toSet
    }
    val testGrams = rows.filter(r => splitOf(r._2) == "test")
      .flatMap(r => grams(r._3)).toSet
    val train = rows.filter(r => splitOf(r._2) == "train")
    val expected = train.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, ds) =>
      val contaminated = ds.filter(d => grams(d._3).exists(testGrams))
      val bp = math.round(contaminated.length * 10000.0 / ds.length)
      (lang, ds.length.toLong, contaminated.length.toLong, bp,
        contaminated.map(_._2).sum)
    }
    val got = SamplingQueries.l25.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    // the screen must catch REAL contamination at this corpus (template
    // docs share 5-grams across the split), or the operator is vacuous
    assert(got.map(_._3).sum > 0, "no contamination found at all")
    // and not degenerate to flagging everything
    assert(got.map(_._3).sum < got.map(_._2).sum / 2)
  }

  test("l25 hashed-gram scale form flags the identical rollup as the " +
      "string form (sf0.001 and sf0.01)") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")
        if new java.io.File(dir).isDirectory) {
      val labeled = SamplingQueries.splitLabeled(spark, dir)
      def rollup(hashed: Boolean) =
        SamplingQueries.decontaminate(labeled, hashedGrams = hashed)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSeq
      assert(rollup(hashed = true) === rollup(hashed = false),
        s"$dir: hashed-gram flags diverge from string-gram flags")
    }
  }

  test("l25's contamination check broadcasts the holdout gram side (no " +
      "shuffle of the train grams against a small test set)") {
    val df = SamplingQueries.l25.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(raw"BroadcastHashJoin \[gram#\d+\], \[gram#\d+\], LeftSemi".r
      .findFirstIn(plan).isDefined,
      s"the gram semi-join must broadcast the test side:\n${plan.take(1500)}")
  }

  // ------------------------------------------------------------- l35

  test("l35 Bloom-prefiltered decontamination equals the exact screen " +
      "row-for-row (no false negatives + exact verify)") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")
        if new java.io.File(dir).isDirectory) {
      val labeled = SamplingQueries.splitLabeled(spark, dir)
      val exact = SamplingQueries.decontaminate(labeled, hashedGrams = false)
        .collect().map(_.toSeq).toSeq
      val bloom = SamplingQueries.decontaminateBloom(labeled)
        .collect().map(_.toSeq).toSeq
      assert(bloom === exact, s"$dir: the sketch path lost or invented rows")
      // non-vacuous: the corpus genuinely carries contamination
      assert(exact.map(_(2).asInstanceOf[Long]).sum > 0)
    }
  }

  test("the persisted decontam index (eval grams + bloom sketch) screens " +
      "from disk identically to the composed plan") {
    val labeled = SamplingQueries.splitLabeled(spark, sf)
    val grams = SamplingQueries.docGrams(labeled,
      Seq("lang", "doc_id", "split"), hashed = false)
    val testGrams = grams.filter(col("split") === "test")
      .select("gram").distinct()
    val base = java.nio.file.Files
      .createTempDirectory("graft_decontam_ix_").toString
    SamplingQueries.writeDecontamIndex(testGrams, base)
    val fromDisk = SamplingQueries.decontaminateBloomFrom(labeled,
      grams.filter(col("split") === "train"),
      SamplingQueries.readDecontamGrams(spark, base),
      SamplingQueries.readDecontamBloom(spark, base))
      .collect().map(_.toSeq).toSeq
    val composed = SamplingQueries.decontaminateBloom(labeled)
      .collect().map(_.toSeq).toSeq
    assert(fromDisk === composed && fromDisk.nonEmpty)
  }

  test("l35's plan carries the Bloom probe as a row-local filter in " +
      "front of the exact semi-join") {
    val df = SamplingQueries.l35.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("might_contain"),
      s"expected the bloom probe in the executed plan:\n${plan.take(1500)}")
    assert(raw"BroadcastHashJoin \[gram#\d+\], \[gram#\d+\], LeftSemi".r
      .findFirstIn(plan).isDefined,
      s"the exact verify semi-join must survive behind the prefilter:\n${plan.take(1500)}")
  }

  // ------------------------------------------------------------- l24

  test("l24 int8 quantization equals a local recompute and stays in int8 range") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("label", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    val expected = vecs.groupBy(_._1).toSeq.sortBy(_._1).map { case (label, rows) =>
      var qSum = 0L; var errSum = 0L
      for ((_, v) <- rows) {
        val m = v.map(math.abs).max
        val scale = if (m == 0) 1.0 else 127.0 / m
        for (x <- v) {
          val q = math.round(math.abs(x) * scale)
          assert(q >= 0 && q <= 127, s"quantized magnitude $q outside int8")
          qSum += math.signum(x).toLong * q
          errSum += math.round(math.abs(math.abs(x) - q.toDouble / scale) * 1e7)
        }
      }
      (label, rows.length.toLong, qSum, errSum)
    }
    val got = LlmQueries.l24.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  // ------------------------------------------------------------- a9

  test("a9b approx percentile lands within 1% of the median RANK (the sketch's " +
      "actual contract; value-space error reflects data granularity, not the sketch)") {
    val rows = RelationalQueries.a9approx.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPrio = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        expr("CAST(ROUND(o_totalprice*100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    for (r <- rows) {
      val vals = byPrio(r.getString(0)).map(_._2).sorted
      val v = r.getAs[Long]("p50_approx_cents")
      // approx_percentile returns an actual value from the group
      assert(vals.contains(v), s"${r.getString(0)}: $v not a group value")
      val lo = vals.count(_ < v); val hi = vals.count(_ <= v) - 1
      val target = (vals.length - 1) * 0.5
      val rankErr = math.min(math.abs(lo - target), math.abs(hi - target))
      assert(rankErr <= math.max(1.0, 0.01 * vals.length),
        s"${r.getString(0)}: rank error $rankErr over n=${vals.length}")
    }
  }

  test("a9 matches a locally computed interpolated percentile") {
    val byPrio = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        expr("CAST(ROUND(o_totalprice*100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    def pct(sorted: Array[Long], p: Double): Long = {
      val pos = (sorted.length - 1) * p
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      math.round(sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo)).toDouble)
    }
    val got = RelationalQueries.a9.fn(spark, sf).collect()
    for (row <- got) {
      val vals = byPrio(row.getString(0)).map(_._2).sorted
      assert(row.getAs[Long]("n") === vals.length.toLong)
      assert(row.getAs[Long]("p50_cents") === pct(vals, 0.5), row.getString(0))
      assert(row.getAs[Long]("p90_cents") === pct(vals, 0.9), row.getString(0))
    }
  }

  // ------------------------------------------------------------- l39

  test("l39 DSIR: milli-weights equal a driver-side recompute of the " +
      "smoothed log-likelihood ratios, and exactly k docs are chosen") {
    val dd = Tables.documents(spark, sf)
    val res = SamplingQueries.dsirSample(dd, "zh", 10)
    val rows = res.collect()
    assert(rows.count(_.getAs[Boolean]("sampled")) === 10)

    // recompute the llr table and weights from the (doc,bucket) counts
    // (independent of the plan's join/broadcast/rounding path)
    val feats = SamplingQueries.dsirFeats(dd).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("b"), r.getAs[Long]("n")))
    val B = SamplingQueries.DsirBuckets
    val nr = feats.map(_._4).sum.toDouble + B
    val nt = feats.filter(_._2 == "zh").map(_._4).sum.toDouble + B
    val cr = feats.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
    val ct = feats.filter(_._2 == "zh").groupBy(_._3)
      .view.mapValues(_.map(_._4).sum).toMap
    val llr = cr.keys.map { b =>
      b -> math.round(1000.0 * (math.log((ct.getOrElse(b, 0L) + 1d) / nt) -
        math.log((cr(b) + 1d) / nr)))
    }.toMap
    val expectW = feats.groupBy(_._1).view.mapValues(
      _.map { case (_, _, b, n) => n * llr(b) }.sum).toMap
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("w_milli") === expectW.getOrElse(id, 0L), s"doc $id")
    }
  }

  test("l39 DSIR: the sample is enriched toward the target slice and " +
      "invariant to input partitioning") {
    val dd = Tables.documents(spark, sf)
    val a = SamplingQueries.dsirSample(dd, "zh", 32).collect()
    val b = SamplingQueries.dsirSample(dd.repartition(7), "zh", 32).collect()
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq,
      "sample must not depend on the cluster layout")
    val sampled = a.filter(_.getAs[Boolean]("sampled"))
    val zhShareSample = sampled.count(_.getAs[String]("lang") == "zh").toDouble /
      sampled.length
    val zhShareCorpus = a.count(_.getAs[String]("lang") == "zh").toDouble /
      a.length
    assert(zhShareSample >= 2 * zhShareCorpus,
      f"enrichment too weak: $zhShareSample%.2f vs corpus $zhShareCorpus%.2f")
  }

  test("l39 DSIR: a single-token doc has no bigrams, weighs exactly 0, " +
      "and never divides by zero under ANSI") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "en", "solo"),
      (2L, "en", "two tokens here make bigrams"),
      (3L, "zh", "two tokens here make bigrams")).toDF("doc_id", "lang", "text")
    val rows = SamplingQueries.dsirSample(tiny, "zh", 2).collect()
    assert(rows.length === 3)
    assert(rows.find(_.getLong(0) == 1L).get.getAs[Long]("w_milli") === 0L)
    assert(rows.count(_.getAs[Boolean]("sampled")) === 2)
  }

  test("DsirIndex: probe-from-parquet weights equal in-query weights " +
      "bit-for-bit, and the persisted model is the sampler's own table") {
    val dd = Tables.documents(spark, sf)
    val base = java.nio.file.Files
      .createTempDirectory("graft_dsir_idx_").toString
    DsirIndex.write(DsirIndex.build(dd, "zh"), base)
    val release = DsirIndex.read(spark, base)
    // the persisted table IS the in-query model, row for row
    assert(release.collect().map(_.toString).toSet ===
      DsirIndex.build(dd, "zh").collect().map(_.toString).toSet)
    // probe-from-parquet ≡ in-query, doc by doc, bit for bit: the
    // weights are exact long dots against a long-typed table, so no
    // double can drift between the two forms
    def wm(model: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      DsirIndex.weigh(dd, model).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("w_milli")).toMap
    val probed = wm(release)
    assert(probed === wm(DsirIndex.build(dd, "zh")))
    // and they are the sampler's own weights (shared dsirWeightsFrom)
    val inQuery = SamplingQueries.dsirSample(dd, "zh", 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("w_milli")).toMap
    assert(probed === inQuery)
  }

  // ------------------------------------------------------------- l42

  test("l42 semantic decontam flags exactly the planted paraphrases — " +
      "nothing natural clears the bar, every planted copy does") {
    val rows = SamplingQueries.l42.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val e = Tables.embeddings(spark, sf)
    val nPlanted = e.filter(col("vec_id") % 10 === 0).count()
    val off = e.agg(max("vec_id")).collect().head.getLong(0) + 1
    val expectChecksum = e.filter(col("vec_id") % 10 === 0)
      .agg(sum(col("vec_id") + off)).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_flagged")).sum === nPlanted,
      "flagged must be exactly the planted copies")
    assert(rows.map(_.getAs[Long]("flagged_checksum")).sum === expectChecksum,
      "the flagged IDS must be the planted ids")
    // the planted perturbation is still a strong match
    assert(rows.map(_.getAs[Long]("max_sim_e4")).max >= 9000L)
  }

  test("l42 IVF scale path: the eval-indexed probe flags the SAME set as " +
      "the brute screen, broadcasting only eval-side frames") {
    val (evalVecs, train) = SamplingQueries.semanticFrames(spark, sf)
    val ivf = SamplingQueries
      .semanticDecontamIvfFlags(evalVecs, train, k = 4, nprobe = 2)
    val brute = train
      .crossJoin(broadcast(evalVecs.select(col("v").as("ev"))))
      .withColumn("cos_e4", round(lit(10000) *
        graft.functions.VectorOps.cosineNative(col("v"), col("ev"))).cast("long"))
      .groupBy("vec_id").agg(max("cos_e4").as("max_e4"))
      .filter(col("max_e4") >= 9000L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val probed = ivf.filter(col("flagged"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(probed === brute,
      s"IVF flags ${probed.size} vs brute ${brute.size}")
    assert(probed.nonEmpty, "planted contamination must be present")
    // the probe never pays the full |eval| dots: candidate pairs are
    // bounded by the probed cells' membership
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"), s"eval side must broadcast:\n$plan")
  }

  test("l42's screen broadcasts the eval suite (train never shuffles " +
      "for the similarity pass)") {
    val plan = SamplingQueries.l42.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"screen shape:\n$plan")
  }

  // ------------------------------------------------------------- l40

  test("l40 source caps: a binding cap keeps exactly min(cap, n) per " +
      "source, survivors are a subset, and recapping only adds docs") {
    val dd = Tables.documents(spark, sf)
    val cap2 = SamplingQueries.sourceCapped(dd, 2).collect()
    assert(cap2.nonEmpty)
    cap2.foreach { r =>
      val expect = math.min(2L, r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_kept") === expect, r.getString(0))
      assert(r.getAs[Long]("kept_chars") <= r.getAs[Long]("n_chars_in"))
    }
    // the cap binds somewhere at sf0.001 (sources have 2-3 docs)
    assert(cap2.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_docs")))
    // monotone recap: the rank order is a fixed per-row hash, so cap 3's
    // survivor set contains cap 2's — pinned via the identity checksum
    // of the survivor doc_ids recomputed through the same draw
    val survivors: Int => Map[Long, Set[Long]] = cap => {
      val w = Window.partitionBy("source")
        .orderBy(col("drw"), col("doc_id"))
      dd.withColumn("drw",
          graft.functions.Sampling.draw(col("doc_id"), col("source")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= cap)
        .select("source", "doc_id").collect()
        .groupBy(_.getString(0)).map { case (_, rs) =>
          rs.head.getString(0).hashCode.toLong -> rs.map(_.getLong(1)).toSet }
    }
    val s2 = survivors(2); val s3 = survivors(3)
    s2.foreach { case (src, ids) => assert(ids.subsetOf(s3(src))) }
  }

  test("l40's kept side is rewritten into a map-side WindowGroupLimit " +
      "(bounded per-task state before the exchange)") {
    val plan = SamplingQueries.l40.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-filter should group-limit map-side:\n$plan")
  }

  test("l40 is partitioning-invariant: the same survivors on any layout") {
    val dd = Tables.documents(spark, sf)
    val a = SamplingQueries.sourceCapped(dd, 2).collect().map(_.toString).sorted
    val b = SamplingQueries.sourceCapped(dd.repartition(7), 2)
      .collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  // ------------------------------------------------ l45 temperature mix

  /** The l45 draw recomputed on the driver: first 4 hex chars of
    * md5("<doc_id>:tmix:<lang>") — byte-for-byte the Sampling.draw
    * definition the query evaluates at the scan. */
  private def tmixDraw(docId: Long, lang: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$docId:tmix:$lang".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
  }

  test("l45 anchors the smallest language at keep-all and targets √-temperature rates") {
    val rows = SamplingQueries.l45.fn(spark, sf).collect()
    val totals = rows.map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_total")).toMap
    val nMin = totals.values.min
    // every language whose count IS the minimum keeps everything
    rows.filter(_.getAs[Long]("n_total") == nMin).foreach { r =>
      assert(r.getAs[Long]("n_kept") === r.getAs[Long]("n_total"),
        s"min lang ${r.getAs[String]("lang")} must keep all")
      assert(r.getAs[Long]("target_bp") === 10000L)
    }
    // targets follow u = round(65536·√(n_min/n)) exactly
    rows.foreach { r =>
      val u = math.round(65536.0 * math.sqrt(nMin.toDouble / r.getAs[Long]("n_total")))
      assert(r.getAs[Long]("target_bp") ===
        math.round(u * 10000.0 / 65536.0),
        s"lang ${r.getAs[String]("lang")}")
    }
    // larger languages keep a strictly smaller SHARE (temperature flattens)
    val byN = rows.sortBy(_.getAs[Long]("n_total"))
    assert(byN.head.getAs[Long]("target_bp") > byN.last.getAs[Long]("target_bp"))
  }

  test("l45 equals a driver-side recompute: WHICH docs are kept, not just counts") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val totals = docs.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val nMin = totals.values.min
    val thr = totals.map { case (l, n) =>
      val u = math.round(65536.0 * math.sqrt(nMin.toDouble / n))
      l -> (if (u >= 65536L) "zzzz" else f"$u%04x")
    }
    val expected = docs.filter { case (id, l) => tmixDraw(id, l) < thr(l) }
      .groupBy(_._2).map { case (l, xs) =>
        l -> (xs.length.toLong, xs.map(_._1).sum) }
    val got = SamplingQueries.l45.fn(spark, sf).collect()
    got.foreach { r =>
      val l = r.getAs[String]("lang")
      val (nK, cks) = expected.getOrElse(l, (0L, 0L))
      assert(r.getAs[Long]("n_kept") === nK, s"lang $l kept count")
      assert(r.getAs[Long]("kept_checksum") === cks, s"lang $l checksum")
    }
    assert(got.map(_.getAs[Long]("n_kept")).sum > 0L)
  }

  test("l51 epoch plan equals a driver-side recompute, the 4-epoch cap " +
      "genuinely binds, and the allocation identity holds per language") {
    val rows = SamplingQueries.l51.fn(spark, sf).collect()
    // driver-side recompute from the same tokenizer
    val toks = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(col("lang"), col("text")).collect()
      .map(r => r.getString(0) ->
        "[a-z]+|[0-9]+|[^a-z0-9\\s]".r.findAllIn(r.getString(1).toLowerCase).size.toLong)
    val avail = toks.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sum }
    val total = avail.values.sum
    val target = total * 3 / avail.size
    rows.foreach { r =>
      val l = r.getString(0)
      val a = avail(l)
      assert(r.getAs[Long]("avail_tokens") === a, s"$l avail")
      assert(r.getAs[Long]("target_tokens") === target, s"$l target")
      val realized = math.min(target, a * 4)
      assert(r.getAs[Long]("realized_tokens") === realized, s"$l realized")
      assert(r.getAs[Long]("deficit_tokens") === target - realized, s"$l deficit")
      assert(r.getAs[Long]("n_epochs_full") === realized / a, s"$l epochs")
      assert(r.getAs[Long]("partial_tokens") === realized % a, s"$l partial")
      // the identity: full epochs + partial reconstruct the allocation
      assert(r.getAs[Long]("n_epochs_full") * a + r.getAs[Long]("partial_tokens")
        === realized, s"$l identity")
      assert(r.getAs[Long]("n_epochs_full") <= 4L, s"$l cap")
    }
    // the published cap must BIND somewhere and be slack somewhere —
    // otherwise the operator degenerates to a proportion
    assert(rows.exists(_.getAs[Long]("deficit_tokens") > 0L),
      "at least one language must hit the 4-epoch cap")
    assert(rows.exists(_.getAs[Long]("deficit_tokens") === 0L),
      "at least one language must be fully served")
  }

  test("l45 joins the rate table broadcast — the corpus never shuffles for a join") {
    val df = SamplingQueries.l45.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"rate table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join allowed:\n$plan")
  }

  test("l55 epoch shuffle: the per-shard order fingerprints equal a " +
      "driver-side recompute of the exact permutation") {
    val got = SamplingQueries.l55.fn(spark, sf).collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("shard")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("order_fp"))).toMap

    val docsRows = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("doc_id").collect()
      .map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def ordOf(id: Long, epoch: Int): String =
      md.digest(s"$id:epoch$epoch".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
    val want = (for (epoch <- 0 to 1) yield {
      docsRows.map(id => (id, ordOf(id, epoch)))
        .groupBy { case (_, o) => java.lang.Long.parseLong(o.take(1), 16) }
        .map { case (shard, members) =>
          val orderedIds = members.sortBy { case (id, o) => (o, id) }.map(_._1)
          val fp = orderedIds.zipWithIndex
            .map { case (id, i) => (i + 1L) * id }.sum
          (epoch, shard) -> (orderedIds.length.toLong, fp)
        }
    }).flatten.toMap
    assert(got === want)
  }

  test("l60 curriculum order: phases partition by l34's keep rule, the " +
      "score-mass signs prove it in-plan, and the order fingerprints " +
      "equal a driver-side sort") {
    val rows = SamplingQueries.l60.fn(spark, sf).collect()
    // phase 1 is EXACTLY l34's kept population (one scorer, two views)
    val keep = CleaningQueries.l34.fn(spark, sf).collect()
      .map(_.getAs[Long]("n_keep")).sum
    assert(rows.filter(_.getAs[Int]("phase") == 1)
      .map(_.getAs[Long]("n_docs")).sum === keep)
    val total = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    // the partition claim as an output: non-positive mass below, positive above
    rows.foreach { r =>
      val m = r.getAs[Long]("score_mass")
      if (r.getAs[Int]("phase") == 1) assert(m > 0L, s"phase1 shard mass $m")
      else assert(m <= 0L, s"phase0 shard mass $m")
    }
    // order fingerprints equal a driver-side sort of the keyed rows
    val keyed = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .withColumn("ta", split(lower(col("text")), "\\s+"))
      .withColumn("sm", expr(CleaningQueries.scoreMilliSql))
      .withColumn("ord", substring(md5(concat(col("doc_id").cast("string"),
        lit(":curriculum"))), 1, 8))
      .select(col("doc_id"), (col("sm") > 0).cast("int").as("phase"),
        col("ord"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val want = keyed
      .groupBy { case (_, ph, ord) =>
        (ph, java.lang.Long.parseLong(ord.take(1), 16)) }
      .map { case (k, members) =>
        k -> members.sortBy { case (id, _, ord) => (ord, id) }.map(_._1)
          .zipWithIndex.map { case (id, i) => (i + 1L) * id }.sum }
    assert(rows.map(r => (r.getAs[Int]("phase"), r.getAs[Long]("shard")) ->
      r.getAs[Long]("order_fp")).toMap === want)
  }

  test("l61 waterfill equals a driver-side solve, is feasible, and the " +
      "level is MAXIMAL (one more token per capped lang overshoots)") {
    val rows = SamplingQueries.l61.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = rows.head.getAs[Long]("budget")
    val avails = rows.map(r =>
      r.getAs[String]("lang") -> r.getAs[Long]("avail")).toMap
    // driver-side waterfill: the same sorted-prefix breakpoint search
    val sorted = avails.toSeq.sortBy { case (l, a) => (a, l) }
    val n = sorted.length
    var cb = 0L; var level = Long.MaxValue
    var i = 0
    var break = false
    while (i < n && !break) {
      val lh = (budget - cb) / (n - i)
      if (sorted(i)._2 > lh) { level = lh; break = true }
      else { cb += sorted(i)._2; i += 1 }
    }
    val want = avails.map { case (l, a) =>
      l -> (math.min(a, level), a > level) }
    val got = rows.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("allocated"), r.getAs[Boolean]("capped"))).toMap
    assert(got === want)
    // feasible and maximal: within budget, and raising the level by 1
    // for the capped langs would overshoot
    val alloc = rows.map(_.getAs[Long]("allocated")).sum
    assert(alloc <= budget)
    val nCapped = rows.count(_.getAs[Boolean]("capped"))
    if (nCapped > 0) {
      assert(alloc + nCapped > budget,
        "level is not maximal: every capped lang could take one more token")
      assert(rows.filter(_.getAs[Boolean]("capped"))
        .forall(_.getAs[Long]("water_level") === level))
    }
    // the fixture budget splits the corpus: both arms exercised
    assert(nCapped > 0 && nCapped < rows.length,
      s"degenerate fixture: $nCapped of ${rows.length} capped")
    // uncapped langs keep everything
    rows.filterNot(_.getAs[Boolean]("capped")).foreach(r =>
      assert(r.getAs[Long]("allocated") === r.getAs[Long]("avail")))
  }

  test("l62 mix plan IS the three allocators side by side: every column " +
      "equals its standalone pipeline's output, language by language") {
    val plan = SamplingQueries.l62.fn(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(plan.nonEmpty)
    // temperature arm ≡ l45's target_bp (the α=0.5 rate table)
    SamplingQueries.l45.fn(spark, sf).collect().foreach { r =>
      assert(plan(r.getAs[String]("lang")).getAs[Long]("temp_bp") ===
        r.getAs[Long]("target_bp"), s"temp ${r.getAs[String]("lang")}")
    }
    // epoch arm ≡ l51, column for column
    SamplingQueries.l51.fn(spark, sf).collect().foreach { r =>
      val p = plan(r.getAs[String]("lang"))
      Seq("avail_tokens" -> "avail_tokens", "target_tokens" -> "target_tokens",
        "realized_tokens" -> "realized_tokens",
        "deficit_tokens" -> "deficit_tokens",
        "n_epochs_full" -> "n_epochs_full",
        "partial_tokens" -> "partial_tokens").foreach { case (a, b) =>
        assert(p.getAs[Long](a) === r.getAs[Long](b),
          s"epoch $a ${r.getAs[String]("lang")}")
      }
    }
    // waterfill arm ≡ l61, column for column
    SamplingQueries.l61.fn(spark, sf).collect().foreach { r =>
      val p = plan(r.getAs[String]("lang"))
      assert(p.getAs[Long]("allocated") === r.getAs[Long]("allocated"))
      assert(p.getAs[Boolean]("capped") === r.getAs[Boolean]("capped"))
      assert(p.getAs[Long]("budget") === r.getAs[Long]("budget"))
      assert(p.getAs[Long]("water_level") === r.getAs[Long]("water_level"))
      assert(p.getAs[Long]("avail_tokens") === r.getAs[Long]("avail"))
    }
  }

  test("l55: epochs are DIFFERENT permutations of the SAME corpus — " +
      "global membership is epoch-invariant, the order is not") {
    val rows = SamplingQueries.l55.fn(spark, sf).collect()
    def byEpoch(e: Int, c: String) =
      rows.filter(_.getAs[Int]("epoch") == e).map(_.getAs[Long](c)).sum
    assert(byEpoch(0, "n_docs") === byEpoch(1, "n_docs"))
    assert(byEpoch(0, "id_checksum") === byEpoch(1, "id_checksum"))
    assert(byEpoch(0, "order_fp") !== byEpoch(1, "order_fp"),
      "independent epoch salts must yield distinct permutations")
  }
}
