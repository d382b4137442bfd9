package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash-draw primitives — the reusable library form
  * behind the l20/l22/l23 catalog queries.
  *
  * Every draw is a pure per-row function of (key, salt): evaluated at
  * the scan (no shuffle, no RNG state), identical on any cluster size
  * or re-run, and engine-portable (the md5 of identical UTF-8 bytes is
  * identical everywhere, and fixed-width lowercase hex compares
  * lexicographically as a number — 'zzzz' > 'ffff' keeps everything).
  * Distinct salts give independent draws over the same keys, which is
  * what keeps a sampling decision from biasing a split decision.
  */
object Sampling {

  /** 4-hex-digit md5 prefix of (key ':' salt) — uniform on [0, 16^4).
    * The salt is a Column so a stratum value can salt its own draw.
    *
    * NULL-safe: a null key or salt draws NULL (null-propagating
    * `concat`, not the null-SKIPPING `concat_ws`, which would give
    * every null-key row the same `md5(salt)` draw and the same
    * keep/split decision). A null draw fails every `<` predicate, so
    * null-key rows are dropped by [[keep]]/[[stratifiedKeep]] and
    * label NULL in [[splitLabel]]. */
  def draw(key: Column, salt: Column): Column =
    substring(md5(concat(key.cast("string"), lit(":"), salt.cast("string"))), 1, 4)

  /** Keep-predicate at a fixed rate: threshold is the 4-hex upper bound
    * ('2000' ≈ 12.5%, '8000' ≈ 50%, 'zzzz' = keep all). Monotone in the
    * threshold: raising a rate only ADDS rows. */
  def keep(key: Column, salt: Column, thresholdHex: String): Column =
    draw(key, salt) < lit(thresholdHex)

  /** Per-stratum keep-predicate: each stratum value draws under its own
    * threshold, salted by the stratum itself (independent draws per
    * stratum); unlisted strata are dropped. */
  def stratifiedKeep(key: Column, stratum: Column,
      thresholds: Seq[(String, String)]): Column = {
    val thr = thresholds.foldLeft(lit("0000")) { case (acc, (v, t)) =>
      when(stratum === v, t).otherwise(acc)
    }
    draw(key, stratum) < thr
  }

  /** Total, disjoint split label: `cuts` are (label, upperHexExclusive)
    * in ascending order; keys at or past the last cut get `last`. Every
    * NON-NULL key lands in exactly one label by construction; a null
    * key labels NULL (not silently `last`). */
  def splitLabel(key: Column, salt: Column,
      cuts: Seq[(String, String)], last: String): Column = {
    val d = draw(key, salt)
    val label = cuts.foldRight(lit(last): Column) { case ((l, upper), acc) =>
      when(d < upper, l).otherwise(acc)
    }
    when(d.isNull, lit(null).cast("string")).otherwise(label)
  }
}
