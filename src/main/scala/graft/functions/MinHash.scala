package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.{Encoder, Encoders, functions}

/** MinHash signatures as a typed `Aggregator` (SURVEY.md §7.2 custom #a).
  *
  * Usage: explode a document into `(doc_id, shingle_hash)` rows (shingle
  * hash = any stable 64-bit hash, e.g. `xxhash64(shingle)`), then
  * `groupBy("doc_id").agg(MinHash.signature(col("h")))` yields the
  * K-minimum signature per document.
  *
  * Scale shape: this is a hash aggregation with a fixed 64-long buffer —
  * partial (map-side) aggregation applies, the shuffle carries one
  * 512-byte buffer per document per partition, and no document's shingle
  * set is ever materialized in one place. That is the property that makes
  * minhash viable at 100 TB where collect_set-based signatures are not.
  *
  * Hash family: h_i(x) = splitmix64(x ^ seed_i) — the SplitMix64
  * finalizer (Steele et al., "Fast splittable pseudorandom number
  * generators", OOPSLA 2014; public domain reference implementation),
  * giving K independent-enough permutations from one base hash.
  */
object MinHash {
  val K = 64

  private[graft] val seeds: Array[Long] = {
    val r = new scala.util.Random(20260812L)
    Array.fill(K)(r.nextLong())
  }

  @inline private[graft] def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  object SigAgg extends Aggregator[Long, Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

    def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < K) {
        val v = mix(h ^ seeds(i))
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < K) {
        if (b(i) < a(i)) a(i) = b(i)
        i += 1
      }
      a
    }

    def finish(b: Array[Long]): Seq[Long] = b.toIndexedSeq

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]]   = ExpressionEncoder()
  }

  /** Column form: `signature(hashCol)` inside a groupBy agg. */
  val signature: UserDefinedFunction = functions.udaf(SigAgg, Encoders.scalaLong)

  /** Exact single-permutation Jaccard estimate between two equal-length
    * signatures (fraction of agreeing minima) — driver/test helper. */
  def estimate(a: Seq[Long], b: Seq[Long]): Double =
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.size
}
