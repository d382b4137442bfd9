package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Spark's OWN Bloom-filter machinery, surfaced as registered
  * functions: `graft_bloom_agg(longCol[, items[, bits]])` builds a
  * serialized Bloom filter (Catalyst's [[BloomFilterAggregate]] — the
  * aggregate behind the optimizer's runtime-filter injection) and
  * `graft_might_contain(bloom, longCol)` probes it
  * ([[BloomFilterMightContain]]). The engine is Spark 4's codegen'd
  * implementation; this file only exposes what `InjectRuntimeFilter`
  * keeps internal, because a TRAINING-DATA pipeline wants the same
  * trick applied where the optimizer can't see it: pre-screening a
  * corpus-sized gram stream against an eval-set membership sketch
  * (l35) before any join runs.
  *
  * Contract inherited from the internal expression: the Bloom argument
  * of `graft_might_contain` must be FOLDABLE or a SCALAR SUBQUERY —
  * pass `bloomDf.scalar()`, which is exactly the shape the runtime
  * filter uses, keeps plan construction action-free, and broadcasts
  * the sketch once per executor rather than once per row. Values are
  * `xxhash64` longs on both sides (the 8-byte wire format every gram
  * screen here already uses).
  */
object BloomExprs {

  private val aggBuilder: Seq[Expression] => Expression = {
    case Seq(c) => new BloomFilterAggregate(c)
    case Seq(c, items) => new BloomFilterAggregate(c, items)
    case Seq(c, items, bits) => new BloomFilterAggregate(c, items, bits)
    case other => throw new IllegalArgumentException(
      s"graft_bloom_agg takes (col[, estimatedItems[, numBits]]), got ${other.length} args")
  }

  private val mightBuilder: Seq[Expression] => Expression = {
    case Seq(bloom, value) => BloomFilterMightContain(bloom, value)
    case other => throw new IllegalArgumentException(
      s"graft_might_contain takes (bloom, value), got ${other.length} args")
  }

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      aggBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      mightBuilder))
  }

  /** Register into an already-built session if absent — same fallback
    * contract as [[NativeVectorExprs.ensureRegistered]]. Idempotent. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_agg")))
      reg.registerFunction(
        FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
        aggBuilder)
    if (!reg.functionExists(FunctionIdentifier("graft_might_contain")))
      reg.registerFunction(
        FunctionIdentifier("graft_might_contain"),
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
        mightBuilder)
  }
}
