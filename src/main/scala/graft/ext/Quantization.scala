package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.toDoubleArray

/** Embedding compression for memory-bound similarity search (north star,
  * SURVEY §7.6): per-vector symmetric int8 scalar quantization — the
  * standard first rung of the ANN memory ladder (float32 -> int8 is 4x
  * smaller with recall loss usually < 1% at 64-256 dims; product
  * quantization would be the next rung).
  *
  * Engine-portable math on purpose, so the whole codec is DuckDB-oracle
  * checkable bitwise:
  *  - scale = max |x_i| (max of exact doubles — order-independent);
  *  - q_i = floor(x_i / scale * 127) — floor, NOT round: round-half rules
  *    differ across engines at midpoints, floor of the identical double is
  *    identical everywhere. q_i ∈ [-127, 127];
  *  - dequant x̂_i = q_i * scale / 127; reconstruction error folds
  *    left-to-right like every other vector reduction in this library.
  *
  * Expressed through Catalyst higher-order functions: this is a once-per
  * -corpus compression pass (write-amortized), not a per-query hot path —
  * if it ever becomes one, the [[graft.functions.VectorExpressions]]
  * pattern (native expression with a primitive loop) is the upgrade.
  */
object Quantization {

  /** id, e (double vector), scale, q (int8 codes as array<int>). */
  def scalarQuantize(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = toDoubleArray(col(vecCol))
    embeddings
      .select(col(idCol), e.as("e"))
      .withColumn("scale", aggregate(col("e"), lit(0.0), (a, x) => greatest(a, abs(x))))
      .withColumn("q",
        when(col("scale") > 0,
          transform(col("e"), x => floor(x / col("scale") * 127).cast("int")))
          .otherwise(transform(col("e"), _ => lit(0))))
  }

  /** Quantization quality per vector: the code checksum (exact) and the
    * squared reconstruction error (left fold). `q_sum` is the cheap
    * integrity probe a backfill job logs per shard; `recon_err` is the
    * quality metric that decides whether int8 suffices or PQ is needed.
    */
  def quantizationStats(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    scalarQuantize(embeddings, idCol, vecCol)
      .select(
        col(idCol),
        col("scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
        aggregate(
          zip_with(col("e"), col("q"), (x, qv) =>
            (x - qv.cast("double") * col("scale") / 127) * (x - qv.cast("double") * col("scale") / 127)),
          lit(0.0), (a, x) => a + x).as("recon_err"))
}
