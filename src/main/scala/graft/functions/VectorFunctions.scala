package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.{DotProduct, L2Norm, SquaredDistance}

/** Vector math over `array<float>`/`array<double>` embedding columns.
  *
  * The default entry points build the native codegen'd Catalyst expressions
  * ([[VectorExpressions]]) — a tight primitive loop inside whole-stage
  * codegen. The `*Hof` variants express the same math through built-in
  * higher-order functions (`zip_with`/`aggregate`); they produce BITWISE
  * identical results (same left-to-right accumulation from 0.0) but
  * evaluate interpreted, ~10x slower — kept as the cross-checking reference
  * implementation.
  */
object VectorFunctions {

  private def expr(c: Column) = ColumnBridge.expression(c)

  /** Elementwise cast to double (embeddings are stored float32). A plain
    * array cast, NOT `transform(v, _.cast("double"))`: Cast is codegen'd
    * while a transform lambda evaluates interpreted per element — this sits
    * under every vector path. float->double widening is exact, so the two
    * forms are bitwise identical.
    */
  def toDoubleArray(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(expr(a), expr(b)))

  def l2Norm(v: Column): Column =
    ColumnBridge.column(L2Norm(expr(v)))

  /** Squared L2 distance (the IVF assignment kernel). */
  def squaredDistance(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistance(expr(a), expr(b)))

  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine given precomputed norms (saves recomputing norms in self-joins). */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  // ------------- interpreted reference forms (for equivalence tests) -------

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2NormHof(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))
}
