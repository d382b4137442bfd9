package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe bench — the empirical rung ABOVE the driver's sf ladder.
  * Every 100 TB scaling claim in BENCH_NOTES extrapolates from the one
  * measured 10× step (sf0.01 → sf0.1); this main synthesizes a
  * documents/embeddings pair `SPARK_GRAFT_SCALE_MULT`× the size of
  * `SPARK_GRAFT_SF_DIR`'s (default 10× sf0.1 = 50k docs / 20k vectors),
  * with the same shape the driver generates — word-soup text over the
  * SAME vocabulary (collected from the base tables, ~31 words), the
  * same 10–100-token length band, the observed lang/source mixes,
  * float[64] embeddings in the observed value band — and times the
  * dedup/ANN/substring family on it, so the sub-linear slopes (banded
  * LSH candidate joins, k ∝ n IVF, gram-clustered probes) get a second
  * measured rung instead of an argument.
  *
  * Deterministic: every value is xxhash64 arithmetic on (id, field) —
  * no RNG state, so reruns time the identical corpus. Planted-dup
  * arithmetic (doc_id % 10) is the catalog's own in-query planting, so
  * the l9/l26 recall invariants hold on the synthetic rung by
  * construction.
  *
  * Output: one JSON line `{"metric":"scale_probe",...}` with per-query
  * min-of-N seconds — recorded against the same queries' sf0.1 floors
  * in BENCH_NOTES' scaling table.
  */
object BenchScale {

  private val ProbeQueries = Seq(
    "l9_minhash_neardup", "l16_ann_ivf", "l26_semantic_dedup",
    "l50_prototype_prune",
    "l33_substring_dedup", "l35_decontam_bloom",
    "r1_release_roundtrip", "r4_retract_roundtrip")

  private def h(id: org.apache.spark.sql.Column, field: String) =
    xxhash64(id, lit(field))

  /** Synthesize the scaled pair into `out` (documents.parquet,
    * embeddings.parquet — the driver's schemas). `heapsVocab` grows the
    * vocabulary with the corpus (V ≈ √(55·nDocs), Heaps' law with
    * β = 0.5 over the token mass) instead of keeping the base tables'
    * fixed ~31 words: the fixed vocabulary is distribution-matched to
    * the driver's generator but inflates NATURAL gram-collision
    * density quadratically with corpus size — a regime no real corpus
    * exhibits — so gram-join rows (l33's span self-probe, r1's
    * clean-held-out filters) should be measured under the Heaps mode
    * and everything else under the matched default. */
  def synthesize(spark: SparkSession, baseDir: String, mult: Int,
      out: String, heapsVocab: Boolean = false): Unit = {
    val baseDocs = spark.read.parquet(s"$baseDir/documents.parquet")
    val baseVecs = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val nDocs = baseDocs.count() * mult
    val nVecs = baseVecs.count() * mult
    // the base corpus' own vocabulary — bounded (~31 words), collected
    // once so the synthetic text is distribution-matched, not invented
    val vocab = baseDocs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .orderBy("w").collect().map(_.getString(0))
    require(vocab.nonEmpty, s"no vocabulary in $baseDir/documents.parquet")
    val vlit = array(vocab.map(lit(_)).toIndexedSeq: _*)
    val vSize: Long =
      if (heapsVocab) math.max(vocab.length.toLong,
        math.sqrt(55.0 * nDocs).toLong)
      else vocab.length.toLong
    // base words for indexes inside the collected vocabulary, derived
    // "w<idx>" tokens beyond it (the Heaps tail)
    def wordAt(idx: org.apache.spark.sql.Column) =
      when(idx < vocab.length, element_at(vlit, (idx + 1).cast("int")))
        .otherwise(concat(lit("w"), idx.cast("string")))
    val langs = Seq("en", "en", "en", "en", "de", "es", "fr", "zh")
    val llit = array(langs.map(lit(_)).toIndexedSeq: _*)
    val docs = spark.range(nDocs).select(col("id").as("doc_id"))
      .withColumn("_nw", (pmod(h(col("doc_id"), "len"), lit(91)) + 10).cast("int"))
      .withColumn("text", concat_ws(" ", transform(
        sequence(lit(1), col("_nw")),
        i => wordAt(pmod(xxhash64(col("doc_id"), i, lit("w")), lit(vSize))))))
      .withColumn("lang", element_at(llit,
        (pmod(h(col("doc_id"), "lang"), lit(langs.length)) + 1).cast("int")))
      .withColumn("source", concat(lit("src"),
        pmod(h(col("doc_id"), "src"), lit(20)).cast("string")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"))
      .withColumn("label", pmod(h(col("vec_id"), "lbl"), lit(10)).cast("int"))
      // values in the observed ±0.33 band, with a label-keyed offset so
      // the space has cluster structure for IVF to find (not uniform
      // noise, which would make nprobe recall unrepresentatively bad)
      .withColumn("embedding", transform(sequence(lit(0), lit(63)),
        i => ((pmod(xxhash64(col("vec_id"), i, lit("e")), lit(601)) - 300) / 1000.0
          + when(pmod(i, lit(10)) === col("label"), 0.2).otherwise(0.0))
          .cast("float")))
      .select("vec_id", "embedding", "label")
    vecs.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val heaps = sys.env.get("SPARK_GRAFT_SCALE_HEAPS").contains("1")
    val spark = Session.get()
    val out = s"${sys.props("java.io.tmpdir")}/graft_scale_${mult}x_" +
      (if (heaps) "heaps_" else "") +
      baseDir.replaceAll("[^A-Za-z0-9.]", "_")
    synthesize(spark, baseDir, mult, out, heaps)
    // Warm codegen/shuffle paths once (Bench's discipline) so the
    // rung-to-rung ratio compares plans, not JVM init.
    try SparkEntry.queries(ProbeQueries.head)(spark, out)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    ProbeQueries.filter(q => only.forall(_.contains(q))).foreach { name =>
      try {
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, out)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        timings(name) = times.min
        System.gc()
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    // The assignment-stage rung — the n·k law at the cell cap (the
    // engine's steepest measured slope, 464 s at the 100× rung) and
    // its published remedy measured side by side: exact argmin vs the
    // two-level coarse assignment (Ivf.assignCoarse) over the SAME
    // trained centroids. Stage-level — training is materialized out of
    // the clock — so the drop is attributable to assignment alone.
    if (only.forall(_.exists(_.startsWith("ivf_assign"))))
      try {
        val e = spark.read.parquet(s"$out/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val n = e.count()
        val k = graft.functions.Ivf.cellCount(n)
        val cents = graft.functions.Ivf.trainSampled(e, k, 2, n).localCheckpoint()
        def stage(df: => DataFrame): Double = {
          val ts = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          System.gc()
          ts.min
        }
        timings("ivf_assign_exact") =
          stage(graft.functions.Ivf.assign(e, cents))
        timings("ivf_assign_coarse") =
          stage(graft.functions.Ivf.assignCoarse(e, cents, k))
      } catch {
        case e: Throwable => errors("ivf_assign") =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    // The l33 WIRE-BYTES rung — string vs xxhash64 gram keys through
    // the identical span plan (SamplingQueries.substringSpans; the
    // hashed form is the published 100 TB wire format, spec-pinned ≡
    // string). The two arms differ ONLY in what the gram checkpoint,
    // the repeated-gram agg, and the hit semi-join ship per gram
    // (~8 B vs ~100 B at SpanK = 15), so their delta isolates shuffle
    // wire bytes from the pair/window arithmetic both arms share —
    // the separation VERDICT r17 #5 asked the Heaps rung to measure.
    if (only.forall(_.exists(_.startsWith("l33_spans"))))
      try {
        val corpus = graft.operators.LlmQueries.plantedFull(
          spark.read.parquet(s"$out/documents.parquet"))
        def stage(df: => DataFrame): Double = {
          val ts = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          System.gc()
          ts.min
        }
        timings("l33_spans_string") = stage(
          graft.operators.SamplingQueries.substringSpans(corpus,
            graft.operators.SamplingQueries.SpanK, hashed = false))
        timings("l33_spans_hashed") = stage(
          graft.operators.SamplingQueries.substringSpans(corpus,
            graft.operators.SamplingQueries.SpanK, hashed = true))
      } catch {
        case e: Throwable => errors("l33_spans") =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    def r3(x: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    // full JSON escape incl. control chars — an error message with an
    // embedded newline must not split the one-line contract
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
    val qs = timings.map { case (k, v) => s""""$k":${r3(v)}""" }.mkString(",")
    val es = errors.map { case (k, v) => s""""$k":${jstr(v)}""" }.mkString(",")
    println(s"""{"metric":"scale_probe","mult":$mult,"base":"$baseDir",""" +
      s""""heaps":$heaps,"runs":$runs,"queries":{$qs},"errors":{$es}}""")
    spark.stop()
  }
}
