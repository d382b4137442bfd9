package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The PERSISTED tokenizer vocabulary — the build/apply split behind
  * l41 (vocabulary training/audit) and l57 (id tokenization), same
  * lifecycle discipline as [[DedupIndex]] / [[AnnIndexes]] /
  * [[SubstringIndex]]: a vocabulary is a versioned RELEASE artifact —
  * trained once per release from a corpus-wide token-frequency pass,
  * then applied to every corpus that ships against that tokenizer —
  * so the (tok, id, cnt) table persists to parquet and consumers read
  * it instead of re-aggregating 100 TB of tokens per run.
  *
  * Unlike the dedup artifacts there is no append path ON PURPOSE: ids
  * are dense ranks of the FULL frequency table, so adding tokens
  * changes existing ids — a vocabulary is immutable once released
  * (exactly why real tokenizers version rather than patch), and a new
  * corpus snapshot trains a NEW release directory.
  *
  * The id-application side ships the vocabulary as a literal map
  * column ([[idMap]]) — the broadcast-artifact shape of every real
  * tokenizer, bounded by the vocabulary size by design — making
  * [[tokenize]] strictly ROW-LOCAL: no explode, no join, no shuffle
  * of token-grain data.
  */
object VocabIndex {

  /** The catalog's shared pre-tokenizer (l5/l41/l57): letter runs,
    * digit runs, single punctuation, lowercased. */
  private[operators] val TokRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Token array of a text column under [[TokRe]]. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokRe), lit(0))

  /** Train a vocabulary release from a corpus carrying `text`:
    * (tok, id, cnt), id = dense rank of (cnt desc, tok asc) − 1 — the
    * total deterministic order l41 audits. One partial-aggregable
    * token pass; ranking happens on the V-row cut, never the corpus. */
  def build(corpus: DataFrame, vocabSize: Int): DataFrame = {
    val cut = corpus.filter(col("text").isNotNull)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(vocabSize)
    // the un-partitioned window ranks the V-row cut (vocabSize bounded
    // by construction) — WindowExec's "No Partition Defined" warning is
    // the design here, not a scale hazard: the corpus-sized work ended
    // at the limit above
    cut.withColumn("id",
      (row_number().over(Window.orderBy(col("cnt").desc, col("tok"))) - 1)
        .cast("long"))
      .select("tok", "id", "cnt")
  }

  /** Persist a release. The frame is V rows — one file. */
  def write(vocab: DataFrame, base: String): Unit =
    vocab.coalesce(1).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$base/vocab")

  /** [[write]] plus the training-provenance stamp — vocabulary counts
    * are REBUILD-class (global token statistics), the same boundary as
    * [[DsirIndex]]/[[BpeIndex]]: a takedown marks the release stale
    * ([[ReleaseFlow.retractAll]]'s rebuildClass list) and the next
    * stamped retrain clears it. */
  def write(vocab: DataFrame, corpus: DataFrame, base: String): Unit = {
    write(vocab, base)
    TrainMeta.stamp(corpus, base)
  }

  /** Read a release for scoring — with the [[DsirIndex.read]] staleness
    * gate: a retraction-marked release fails loudly unless the caller
    * opts in with `allowStale = true`. */
  def read(spark: SparkSession, base: String,
      allowStale: Boolean = false): DataFrame = {
    TrainMeta.assertFresh(spark, base, allowStale, "vocabulary release")
    spark.read.parquet(s"$base/vocab")
  }

  /** The vocabulary as a literal tok→id map column — the broadcast
    * artifact every tokenize pass closes over. Collecting V rows is a
    * BOUNDED driver action (the band-key discipline): V is the
    * vocabulary size by construction, never the corpus. */
  def idMap(vocab: DataFrame): Column = {
    val rows = vocab.select("tok", "id").collect()
    // The empty branch must still be map<string,bigint>: a bare map()
    // defaults to map<string,string>, which would coerce tokenize's ids
    // to strings and fail the long-typed fp aggregate at analysis.
    if (rows.isEmpty) map().cast("map<string,bigint>")
    else map(rows.flatMap(r =>
      Seq(lit(r.getString(0)), lit(r.getLong(1)))).toSeq: _*)
  }

  /** Row-local id tokenization of `text` against a vocabulary map
    * column: appends `ids` (OOV → −1), `n_oov`, and the
    * order-sensitive `fp` = Σ (pos+1)·(id+2) — l57's arithmetic, one
    * definition for the in-query and probe-from-parquet forms.
    *
    * The zero-token guard matters: `sequence(1, 0)` is a DESCENDING
    * [1, 0], so the unguarded zip_with would null-pad an empty `ids`
    * and the fold would sum nulls — a whitespace-only doc must carry
    * the empty sequence's fp = 0, not NULL. */
  def tokenize(df: DataFrame, vmap: Column): DataFrame =
    df
      .withColumn("ids",
        transform(tokens(col("text")), t =>
          coalesce(element_at(vmap, t), lit(-1L))))
      .withColumn("n_oov",
        size(filter(col("ids"), id => id === -1L)).cast("long"))
      .withColumn("fp", when(size(col("ids")) === 0, 0L).otherwise(
        aggregate(
          zip_with(col("ids"), sequence(lit(1), size(col("ids"))),
            (id, pos) => pos.cast("long") * (id + lit(2L))),
          lit(0L), (acc, x) => acc + x)))
}
