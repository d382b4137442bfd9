package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-vector arithmetic over `array<double>` columns, built purely
  * from codegen'd higher-order functions (`zip_with`/`aggregate`) — no
  * UDFs, so the whole similarity pipeline stays inside WholeStageCodegen
  * and is a per-row O(d) map with no shuffle.
  *
  * The fold is a sequential left-fold in array order, which is what the
  * DuckDB oracle (`list_dot_product`) computes too — IEEE-double parity
  * for the correctness gate.
  *
  * Callers cast `array<float>` storage to `array<double>` first
  * (exact widening) so both engines accumulate in double.
  */
object VectorOps {
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  // Native codegen'd forms (graft.functions.DotProduct, registered as
  // `graft_dot` by graft.Session's extensions hook): bit-identical to
  // the HOF forms above (same left-to-right fold), but the per-element
  // loop compiles into WholeStageCodegen instead of paying interpreted
  // lambda dispatch — the HOFs are CodegenFallback. Use these on the
  // similarity hot paths. On a session NOT built via graft.Session the
  // call sites self-register into the active session's function
  // registry (ensureRegistered), so these work everywhere; the HOF
  // forms above are kept for oracle-parity documentation and as the
  // registry-free alternative.

  def dotNative(a: Column, b: Column): Column = {
    NativeVectorExprs.ensureRegistered(SparkSession.active)
    call_function("graft_dot", a, b)
  }

  def normNative(a: Column): Column = {
    NativeVectorExprs.ensureRegistered(SparkSession.active)
    sqrt(call_function("graft_dot", a, a))
  }

  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (normNative(a) * normNative(b))
}
