package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` embedding columns, built
  * entirely from codegen'd higher-order functions (`transform`, `zip_with`,
  * `aggregate`) — no UDFs, so whole-stage codegen stays intact and the
  * expressions survive on any cluster size.
  *
  * Determinism note: `aggregate` folds left sequentially, which makes the
  * double summation order reproducible (and matchable by an oracle engine
  * folding in the same order).
  */
object VectorFunctions {

  /** Elementwise cast to double (embeddings are stored float32). */
  def toDoubleArray(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine given precomputed norms (saves recomputing norms in self-joins). */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
