package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-statistics expressions — same design stance as
  * [[NativeVectorExprs]]: when a per-DOCUMENT statistic needs only that
  * document's own tokens, a codegen'd Catalyst expression computing it
  * row-locally beats materializing an exploded intermediate through a
  * shuffle. The Gopher repetition ladder (reference: the published
  * Rae et al. 2021 Table A1 battery; engine query `l27b`) is the
  * motivating case: its top-n-gram coverages were previously computed by
  * exploding every 2/3/4-gram of every document into a (doc, n, gram)
  * frame (~3× token count rows of STRING payload through one shuffle)
  * and hash-aggregating; the per-doc answer never needed rows from any
  * other document, so the explode bought nothing but shuffle volume. At
  * 100 TB the row-local form is the difference between a pure map-side
  * scan and shuffling ~3× the corpus' token text.
  */
object NativeTextExprs {

  private val topgramBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 1,
      "graft_topgram_stats(tokens) takes exactly one array<string>")
    TopGramStats(children.head)
  }

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("graft_topgram_stats"),
      new ExpressionInfo(classOf[TopGramStats].getName, "graft_topgram_stats"),
      topgramBuilder))
}

/** `graft_topgram_stats(tokens)` → `array<bigint>` of length 6:
  * `[c2, cov2, c3, cov3, c4, cov4]` — for gram widths n = 2, 3, 4, the
  * occurrence count `c` of the document's most frequent word n-gram and
  * that gram's CHARACTER COVERAGE `c · numChars(gram)`, where the top
  * gram is the argmax of `(count, coverage)` in strict lexicographic
  * order — the identical integer-exact selection rule the DuckDB oracle
  * runs (`arg_max` over a `c · 2^64 + cov` HUGEINT key, exact for any
  * BIGINT coverage — no packed-integer bound). A width with no grams (fewer
  * than n tokens) reports 0s, which can never flag (`0 · 100 > pct ·
  * n_chars` is false for any non-negative char count).
  *
  * Exactness: gram identity is the exact token sequence (no hashing —
  * a hash-keyed count could merge colliding grams and silently disagree
  * with the string-keyed oracle), and lengths are Unicode CODE POINTS
  * (`UTF8String.numChars`), matching both Spark's `length()` and
  * DuckDB's `len()`.
  *
  * Memory bound: one count entry per distinct gram per width — ≤ 3 ·
  * tokens entries, i.e. O(document size), the same per-group state the
  * exploded hash-agg form kept, now without shuffling it. Documents are
  * the unit of parallelism; a corpus of pathological multi-GiB documents
  * should pre-chunk upstream (the same contract the tokenizer and
  * dedup shingling already assume). */
case class TopGramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_topgram_stats requires an array<string> argument, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_topgram_stats"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TopGramStats.compute(a.asInstanceOf[ArrayData])

  // Codegen delegates to the static helper: the hot loop is a hash-map
  // build over variable-length strings, which JIT compiles identically
  // whether emitted as Janino source or called as a static method — the
  // call form keeps the operator inside WholeStageCodegen (one static
  // call per row, no iterator boundary) without a page of quoted Java.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("topgramResult")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.TopGramStats.compute($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TopGramStats =
    copy(child = newChild)
}

object TopGramStats {
  private val Widths = Array(2, 3, 4)

  /** Static entry shared by interpreted eval and codegen. Returns null
    * iff the token array contains a null element (mirrors the
    * null-poisoning of the other native expressions). */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) return null
      toks(i) = tokens.getUTF8String(i)
      i += 1
    }
    val out = new Array[Long](Widths.length * 2)
    var w = 0
    while (w < Widths.length) {
      topStats(toks, Widths(w), out, w * 2)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Writes the argmax-(count, coverage) count and coverage of the
    * width-`g` grams into `out(at)` / `out(at + 1)`. */
  private def topStats(toks: Array[UTF8String], g: Int,
      out: Array[Long], at: Int): Unit = {
    val n = toks.length
    if (n < g) return
    // counts keyed by the exact gram; values are mutable {count, chars}
    val counts = new java.util.HashMap[UTF8String, Array[Long]](n * 2)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= n - g) {
      val parts = new Array[UTF8String](g)
      var k = 0
      while (k < g) { parts(k) = toks(i + k); k += 1 }
      val gram = UTF8String.concatWs(sep, parts: _*)
      val slot = counts.get(gram)
      if (slot == null) counts.put(gram, Array(1L, gram.numChars().toLong))
      else slot(0) += 1L
      i += 1
    }
    var bestC = 0L
    var bestCov = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val slot = it.next()
      val c = slot(0)
      val cov = c * slot(1)
      if (c > bestC || (c == bestC && cov > bestCov)) { bestC = c; bestCov = cov }
    }
    out(at) = bestC
    out(at + 1) = bestCov
  }
}
