package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget batch packing for training-data pipelines: assign documents
  * to consecutive batches so each batch carries ~`budget` tokens.
  *
  * The assignment is the cumulative variant: within a partition key, docs in
  * id order get `batch_id = floor(tokens_before / budget)` — a batch may
  * overflow by at most one document past the budget boundary, in exchange
  * for the whole assignment being ONE window expression (exact int64 math,
  * identical on any engine). First-fit/greedy bin packing is sequential by
  * nature and buys little for LLM batch assembly, where the consumer packs
  * sequences up to a context length and an overflow doc simply starts the
  * next batch.
  *
  * Scale: the window partitions on `partitionCols` (e.g. the source shard),
  * NEVER globally — a global ORDER BY window would serialize 100 TB through
  * one task. Batches are therefore per-shard, which is what a distributed
  * training job wants anyway (shard-local shuffling, no cross-shard
  * coordination).
  */
object Packing {

  def packByBudget(
      docs: DataFrame,
      budget: Long,
      partitionCols: Seq[String],
      tokensCol: Column,
      idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(partitionCols.nonEmpty,
      "partitionCols must be non-empty: a global ordered window serializes the corpus through one task")
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("doc_tokens", tokensCol.cast("long"))
      .withColumn("cum_before", coalesce(sum(col("doc_tokens")).over(w), lit(0L)))
      .withColumn("batch_id", expr(s"cum_before DIV ${budget}L"))
      .drop("cum_before")
  }
}
