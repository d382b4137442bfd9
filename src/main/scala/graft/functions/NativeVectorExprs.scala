package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * Why a custom Catalyst `Expression` exists here at all: Spark's
  * higher-order functions (`aggregate`, `zip_with`, `transform`) are
  * `CodegenFallback` — each row pays interpreted lambda dispatch per
  * element, even inside a WholeStageCodegen span. For the similarity
  * family (l3/l11/l12/l14/l16) the per-row O(d)=64 dot product IS the
  * hot loop, so this is the one place the build brief's preference
  * ladder — (b) "a custom Catalyst Expression (with doGenCode)" — beats
  * composing built-ins. `doGenCode` emits a tight primitive `for` loop
  * over `ArrayData.getDouble`; the interpreted `nullSafeEval` mirrors it
  * exactly for non-codegen paths.
  *
  * The accumulation is the same left-to-right fold as the HOF form
  * ([[VectorOps.dot]]) and DuckDB's `list_dot_product`, so results are
  * bit-identical and the DuckDB-oracle parity of every similarity query
  * is unchanged.
  *
  * Registered as SQL function `graft_dot` through the public
  * `SparkSessionExtensions.injectFunction` hook (see [[register]],
  * wired in `graft.Session`).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is off-limits (AbstractDataType is sql-private),
  // so the type contract is enforced manually at analysis time.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires two array<double> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // NULL parity with the HOF form, beyond child-null propagation:
  // `zip_with` pads unequal lengths with null and a null element nulls
  // the fold, so this expression can return null even for non-null
  // children.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd INT8 dot product over two `array<tinyint>` columns
  * → bigint — the quantized-probe shortlist's hot loop
  * ([[graft.operators.AnnIndexes.probeIvfInt8]]): the whole point of
  * int8 lists is that the heavy scoring pass touches quarter-width
  * data, and paying interpreted `zip_with` lambda dispatch per element
  * there would throw the saving away. Exact integer arithmetic
  * (|acc| ≤ 127²·d — no overflow below d ≈ 5·10¹⁴), identical fold
  * order to the HOF form it replaces, same null parity as
  * [[DotProduct]]. Registered as `graft_dot8`. */
case class Int8DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.ByteType, _),
            ArrayType(org.apache.spark.sql.types.ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot8 requires two array<tinyint> arguments, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot8"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) $a.getByte($i) * (long) $b.getByte($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd squared-L2 distance — same rationale and same
  * left-to-right fold order as the `zip_with` form it replaces
  * ([[Ivf.dist2]]'s hot loop in centroid assignment). */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_sqdist requires two array<double> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sqdist"
  // Same null parity as graft_dot: unequal lengths or a null element
  // null the result, even for non-null children.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd K=64 MinHash signature over an `array<bigint>` of
  * shingle hashes — `graft_minhash(shs)` yields the same signature as
  * folding [[MinHash.SigAgg]] over the exploded rows (min is
  * duplicate-insensitive, the hash family and seeds are shared), but
  * runs map-side in one generated loop. This is what lets l9 compute
  * per-document signatures with NO aggregation at all when the source
  * is already one row per document (the common case for a document
  * table): K×|shingles| SplitMix64 mixes per row inside the scan's
  * WholeStageCodegen span, vs. the typed Aggregator's per-row encoder
  * boundary plus an ObjectHashAggregate. The Aggregator remains the
  * right tool when shingles arrive pre-exploded or from multiple rows
  * per document ([[MinHash]] scaladoc). */
case class MinHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_minhash requires an array<bigint> argument, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  // A null element nulls the result (mirrors graft_dot's conservatism);
  // shingle hashes are never null in practice.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val buf = Array.fill(MinHash.K)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val h = xs.getLong(i)
      var k = 0
      while (k < MinHash.K) {
        val v = MinHash.mix(h ^ MinHash.seeds(k))
        if (v < buf(k)) buf(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(buf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seeds = ctx.addReferenceObj("minhashSeeds", MinHash.seeds, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      val buf = ctx.freshName("buf")
      s"""
         |int $n = $a.numElements();
         |long[] $buf = new long[${MinHash.K}];
         |java.util.Arrays.fill($buf, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $a.getLong($i);
         |  for (int $k = 0; $k < ${MinHash.K}; $k++) {
         |    long $z = ($h ^ $seeds[$k]) + 0x9E3779B97F4A7C15L;
         |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |    $z = $z ^ ($z >>> 31);
         |    if ($z < $buf[$k]) $buf[$k] = $z;
         |  }
         |}
         |if (!${ev.isNull}) ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($buf);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Native codegen'd hyperplane sign signature — `graft_hpsig(v, planes)`
  * with `planes` a FOLDABLE `array<array<double>>` literal: bit j of the
  * result is set iff `v · planes[j] > 0`, the dot product left-folding
  * in array order exactly like [[DotProduct]], so signatures are
  * bit-identical to the HOF form
  * (`aggregate(sequence(...), acc | if(graft_dot(...) > 0, ...))`) it
  * replaces. The HOF form pays interpreted dispatch for the outer fold
  * AND forces the inner dot through the interpreted eval path; here the
  * whole n·d loop (64×64 = 4096 multiply-adds for the near-dup path)
  * compiles into the consuming WholeStageCodegen span, with the plane
  * matrix attached once as a reference object, not evaluated per row.
  *
  * Null/mismatch parity with the HOF form: a null or length-mismatched
  * dot made `if(null > 0, ...)` take the else branch — bit unset, not a
  * null signature — so a plane whose dot is undefined contributes 0
  * here too; only a null vector nulls the result. */
case class HyperplaneSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_hpsig requires the plane matrix to be a literal")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_hpsig requires (array<double>, array<array<double>>), got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hpsig"
  override def nullable: Boolean = true

  /** The folded plane matrix, extracted once (≤ 64 planes by contract —
    * the signature is one long). */
  @transient private lazy val planes: Array[Array[Double]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    require(arr != null && arr.numElements() <= 64,
      "graft_hpsig: plane matrix must be non-null with at most 64 rows")
    (0 until arr.numElements()).map { j =>
      arr.getArray(j).toDoubleArray()
    }.toArray
  }

  override def nullSafeEval(a: Any, ignored: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      if (p.length == n) {
        var s = 0.0
        var i = 0
        var ok = true
        while (i < n && ok) {
          if (v.isNullAt(i)) ok = false
          else { s += v.getDouble(i) * p(i); i += 1 }
        }
        if (ok && s > 0.0) sig |= (1L << j)
      }
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("hpsigPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val ok = ctx.freshName("ok")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < $mat.length; $j++) {
         |  double[] $p = $mat[$j];
         |  if ($p.length == $n) {
         |    double $s = 0.0;
         |    boolean $ok = true;
         |    for (int $i = 0; $i < $n && $ok; $i++) {
         |      if ($a.isNullAt($i)) { $ok = false; }
         |      else { $s += $a.getDouble($i) * $p[$i]; }
         |    }
         |    if ($ok && $s > 0.0) $sig |= (1L << $j);
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneSignature =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd 64-bit SimHash over an `array<bigint>` of token
  * hashes — `graft_simhash(hs)` yields the same signature as
  * [[SimHash.signatures]]'s 64-conditional-sum aggregation (per bit:
  * +1/-1 by bit presence per token OCCURRENCE — duplicates weigh, so
  * the input array is the token multiset, not a set; sign of the sum is
  * the signature bit, ties to 0 exactly like the `when(sum > 0, ...)`
  * form). Lets l10 compute per-document signatures map-side when the
  * source is one row per document, with no explode and no aggregation;
  * [[SimHash.signatures]] remains the shuffle path for pre-exploded or
  * multi-row-per-id inputs. */
case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_simhash requires an array<bigint> argument, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val acc = new Array[Long](SimHash.Bits)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val h = xs.getLong(i)
      var k = 0
      while (k < SimHash.Bits) {
        acc(k) += (if (((h >>> k) & 1L) == 1L) 1L else -1L)
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < SimHash.Bits) {
      if (acc(k) > 0L) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |long[] $acc = new long[${SimHash.Bits}];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $a.getLong($i);
         |  for (int $k = 0; $k < ${SimHash.Bits}; $k++) {
         |    $acc[$k] += ((($h >>> $k) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $sig = 0L;
         |  for (int $k = 0; $k < ${SimHash.Bits}; $k++) {
         |    if ($acc[$k] > 0L) $sig |= (1L << $k);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}

object NativeVectorExprs {

  private val dotBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2, "graft_dot(a, b) takes exactly two arrays")
    DotProduct(children.head, children(1))
  }

  private val sqdistBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2, "graft_sqdist(a, b) takes exactly two arrays")
    SquaredDistance(children.head, children(1))
  }

  private val dot8Builder: Seq[Expression] => Expression = children => {
    require(children.length == 2, "graft_dot8(a, b) takes exactly two arrays")
    Int8DotProduct(children.head, children(1))
  }

  private val minhashBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 1, "graft_minhash(shingle_hashes) takes exactly one array")
    MinHashSignature(children.head)
  }

  private val simhashBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 1, "graft_simhash(token_hashes) takes exactly one array")
    SimHashSignature(children.head)
  }

  private val hpsigBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2, "graft_hpsig(v, planes) takes a vector and a plane matrix")
    HyperplaneSignature(children.head, children(1))
  }

  /** Inject the native vector expressions into a session being built —
    * the public extensions hook (`SparkSessionExtensions`), not a
    * private registry poke, so the registration survives session
    * cloning. */
  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "graft_sqdist"),
      sqdistBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_dot8"),
      new ExpressionInfo(classOf[Int8DotProduct].getName, "graft_dot8"),
      dot8Builder))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      minhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashSignature].getName, "graft_simhash"),
      simhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_hpsig"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "graft_hpsig"),
      hpsigBuilder))
  }

  /** Register into an ALREADY-BUILT session if absent — the fallback for
    * embedders whose SparkSession wasn't constructed via `graft.Session`
    * (e.g. a notebook's default session). `Session.get`'s extensions
    * hook remains the preferred path (it survives session cloning);
    * this makes the native-math call sites (l12/l14/l16, [[Ivf]]) work
    * on any session rather than failing at analysis. Idempotent. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_dot")))
      reg.registerFunction(
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        dotBuilder)
    if (!reg.functionExists(FunctionIdentifier("graft_sqdist")))
      reg.registerFunction(
        FunctionIdentifier("graft_sqdist"),
        new ExpressionInfo(classOf[SquaredDistance].getName, "graft_sqdist"),
        sqdistBuilder)
    if (!reg.functionExists(FunctionIdentifier("graft_dot8")))
      reg.registerFunction(
        FunctionIdentifier("graft_dot8"),
        new ExpressionInfo(classOf[Int8DotProduct].getName, "graft_dot8"),
        dot8Builder)
    if (!reg.functionExists(FunctionIdentifier("graft_minhash")))
      reg.registerFunction(
        FunctionIdentifier("graft_minhash"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
        minhashBuilder)
    if (!reg.functionExists(FunctionIdentifier("graft_simhash")))
      reg.registerFunction(
        FunctionIdentifier("graft_simhash"),
        new ExpressionInfo(classOf[SimHashSignature].getName, "graft_simhash"),
        simhashBuilder)
    if (!reg.functionExists(FunctionIdentifier("graft_hpsig")))
      reg.registerFunction(
        FunctionIdentifier("graft_hpsig"),
        new ExpressionInfo(classOf[HyperplaneSignature].getName, "graft_hpsig"),
        hpsigBuilder)
  }
}
