package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash (Charikar, "Similarity estimation techniques from
  * rounding algorithms", STOC 2002) over token hashes.
  *
  * Input: a `(id, h)` frame with one row per token occurrence, `h` a
  * 64-bit token hash (e.g. `xxhash64(token)`). Per bit position the
  * aggregation sums +1/-1 by bit presence; the sign becomes the
  * signature bit. All 64 per-bit sums are plain conditional `sum`s in
  * ONE hash aggregation — partial-aggregable, codegen'd, no UDF, and the
  * shuffle carries 64 longs per id. Near-duplicate candidates then come
  * from banding the signature (exact match on one 16-bit band is
  * guaranteed for any pair within Hamming distance 3 by pigeonhole).
  */
object SimHash {
  val Bits = 64

  /** `(id, h)` token-hash rows → `(id, sig)` with one 64-bit signature
    * per id. */
  def signatures(tokHashes: DataFrame, id: String, h: String): DataFrame = {
    val sums = (0 until Bits).map { i =>
      sum(when(expr(s"(shiftright($h, $i) & 1) = 1"), 1).otherwise(-1)).as(s"_b$i")
    }
    val agg = tokHashes.groupBy(id).agg(sums.head, sums.tail: _*)
    val sig = (0 until Bits).foldLeft(lit(0L): Column) { (acc, i) =>
      acc.bitwiseOR(when(col(s"_b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
    }
    agg.select(col(id), sig.as("sig"))
  }

  /** Split a signature into `nBands` equal bit-slices for LSH bucketing:
    * returns an array of structs (band_id, band value). `sigBits` is the
    * real width of the signature — band width derives from it, so a
    * 16-bit signature split 4 ways yields 4-bit bands rather than the
    * degenerate 64/4 = 16-bit slices whose upper bands are all-zero
    * (every row would share them, collapsing LSH to brute force — the
    * round-3 advisor caught exactly that in the ANN path). */
  def bands(sig: Column, nBands: Int, sigBits: Int = Bits): Column = {
    require(sigBits % nBands == 0, s"$sigBits bits not divisible into $nBands bands")
    val width = sigBits / nBands
    val mask  = (1L << width) - 1
    array((0 until nBands).map { j =>
      struct(lit(j).as("band_id"),
        shiftright(sig, j * width).bitwiseAND(lit(mask)).as("bval"))
    }: _*)
  }
}
