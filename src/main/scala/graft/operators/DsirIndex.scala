package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED DSIR importance model — l39's build/probe split, the
  * [[VocabIndex]] lifecycle discipline applied to the sampler's only
  * trained state: a DSIR deployment trains the hashed-bigram
  * log-likelihood-ratio table ONCE per target corpus (one token-grain
  * pass over raw + target), then scores MANY corpus snapshots against
  * it — daily crawls, candidate mixes, ablation slices — so the
  * ≤B-row `(b, llr_milli)` table persists to parquet and every scoring
  * run probes from disk instead of re-training against the 100 TB raw
  * corpus per run.
  *
  * Like [[VocabIndex]] (and unlike the dedup artifacts) there is no
  * append path ON PURPOSE: the llr weights are GLOBAL functions of the
  * raw/target token totals — adding documents changes every bucket's
  * ratio — so a model is immutable once trained and a new raw-corpus
  * snapshot trains a new release directory.
  *
  * The probe side ([[weigh]]) is the exact integer dot the in-query
  * pipeline runs — [[SamplingQueries]]' shared `dsirWeightsFrom`, one
  * definition for both forms — so probe-from-parquet weights equal
  * in-query weights BIT-FOR-BIT (the milli-nat table is long-typed;
  * only the train step touches doubles, and it is not re-run at
  * probe time). Scale shape: the model is a broadcast literal table by
  * construction; scoring is one bigram explode + (doc, bucket) agg +
  * broadcast join — no shuffle wider than the snapshot's own feature
  * agg, nothing corpus-global.
  */
object DsirIndex {

  /** Train a model release: the ≤B-row (b, llr_milli) table of the
    * raw `corpus` (lang, text) against its `targetLang` slice. */
  def build(corpus: DataFrame, targetLang: String): DataFrame =
    SamplingQueries.dsirModelFrom(
      SamplingQueries.dsirFeats(corpus), targetLang)

  /** Persist a release. The frame is ≤B rows — one file, sorted by
    * bucket for clustered probes. */
  def write(model: DataFrame, base: String): Unit =
    model.coalesce(1).sortWithinPartitions("b")
      .write.mode("overwrite").parquet(s"$base/dsir_model")

  /** [[write]] plus the training-provenance stamp ([[TrainMeta]]) — the
    * form a deployment uses, because the llr table is REBUILD-class
    * state: a takedown cannot anti-join it (every bucket's ratio is a
    * global function of the token totals), so the retraction lifecycle
    * marks it stale ([[ReleaseFlow.retractAll]]) and a scoring run
    * checks [[TrainMeta.isStale]] before trusting the weights. */
  def write(model: DataFrame, corpus: DataFrame, base: String): Unit = {
    write(model, base)
    TrainMeta.stamp(corpus, base)
  }

  /** Read a release for scoring. Fails loudly when a retraction has
    * marked the model stale since its training stamp ([[TrainMeta
    * .assertFresh]]) — the scorer is where forgetting the rebuild
    * happens; `allowStale = true` opts into scoring against the stale
    * weights knowingly (e.g. an ablation comparing pre/post-takedown
    * models). */
  def read(spark: SparkSession, base: String,
      allowStale: Boolean = false): DataFrame = {
    TrainMeta.assertFresh(spark, base, allowStale, "DSIR model")
    spark.read.parquet(s"$base/dsir_model")
  }

  /** Score a corpus snapshot (doc_id, lang, text) against a trained
    * model: one row per document with its exact integer milli-nat
    * importance weight (docs with no bigram weigh 0). The model frame
    * broadcasts; nothing about the raw training corpus is re-read. */
  def weigh(snapshot: DataFrame, model: DataFrame): DataFrame = {
    val dd = snapshot.filter(col("text").isNotNull).select("doc_id", "lang")
    dd.join(
        SamplingQueries.dsirWeightsFrom(
          SamplingQueries.dsirFeats(snapshot), model),
        Seq("doc_id"), "left")
      .withColumn("w_milli", coalesce(col("w_milli"), lit(0L)))
  }
}
