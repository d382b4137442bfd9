package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.{Encoder, Encoders, functions}

/** Misra–Gries frequent-items summary as a typed `Aggregator` — the
  * heavy-hitter ENUMERATOR Spark's built-in sketches lack (the built-in
  * `count_min_sketch` estimates a frequency you already ask about;
  * Misra–Gries produces the candidate SET, which is the half a 100 TB
  * vocabulary scan actually needs: l41's exact top-V pays a corpus-wide
  * (lang, token) shuffle, while this summary never shuffles tokens at
  * all — K-counter buffers combine map-side and only the ≤K-entry
  * summaries cross the wire).
  *
  * Algorithm: Misra & Gries 1982 ("Finding repeated elements", Sci.
  * Comput. Program. 2); mergeability per Agarwal et al. 2012
  * ("Mergeable summaries", PODS): sum counters pairwise, then subtract
  * the (K+1)-th largest count from every counter and drop the
  * non-positive — the merged summary keeps the MG guarantee.
  *
  * Guarantee (both forms): for every item x with true count n(x),
  *   est(x) ∈ [n(x) − n/(K+1), n(x)]
  * where n is the stream length — so any item with n(x) > n/(K+1) is
  * PRESENT in the summary (it cannot be decremented to zero), and the
  * estimate never overcounts. FreqItemsSpec pins both bounds against
  * exact counts.
  *
  * Buffer: an immutable Map[String, Long] capped at K entries —
  * encoder-friendly and obviously correct; a production variant would
  * pack parallel arrays (same contract, ~10× less per-row allocation).
  */
object FreqItems {

  /** Summary capacity — 32 counters bounds the underestimate at
    * n/33 ≈ 3% of the stream, ample for "which tokens dominate". */
  val K = 32

  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      if (x == null) b
      else b.get(x) match {
        case Some(c) => b.updated(x, c + 1L)
        case None if b.size < k => b.updated(x, 1L)
        case None =>
          // the MG step: a full table decrements everyone instead
          b.flatMap { case (key, c) =>
            if (c > 1L) Some(key -> (c - 1L)) else None
          }
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = b.foldLeft(a) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        // Agarwal et al.: subtract the (k+1)-th largest count, keep > 0
        val cut = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        combined.flatMap { case (key, c) =>
          if (c > cut) Some(key -> (c - cut)) else None
        }
      }
    }

    def finish(b: Map[String, Long]): Map[String, Long] = b

    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Column form: `summary(tokenCol)` inside an agg — yields one
    * map<string,bigint> of ≤ [[K]] candidate heavy hitters. */
  val summary: UserDefinedFunction =
    functions.udaf(new MisraGries(K), Encoders.STRING)

  /** A custom-capacity instance (spec use). */
  def summaryK(k: Int): UserDefinedFunction =
    functions.udaf(new MisraGries(k), Encoders.STRING)
}
