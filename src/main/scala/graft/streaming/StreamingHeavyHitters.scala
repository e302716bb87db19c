package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAggregator
import graft.functions.TextFunctions.tokens

/** Streaming heavy-hitters over a document stream: the live twin of
  * [[graft.ext.TextAnalysis.approxVocabulary]], for "what terms are
  * trending right now" over an unbounded ingest (spam-burst detection,
  * vocabulary drift monitoring between corpus snapshots).
  *
  * Design: tokens are sharded by term hash, and each shard maintains ONE
  * bounded Misra-Gries summary as a streaming aggregation state — the
  * standard typed-`Aggregator`-as-UDAF path, so the state store holds
  * exactly `shards` MgBuffers of at most `k` entries each, regardless of
  * stream length or vocabulary size. Sharding by TERM (not round-robin)
  * means every occurrence of a term lands in the same summary, so each
  * shard's classic MG bound applies to its own sub-stream: a term with
  * true count > n_shard / (k + 1) is guaranteed present. Under
  * near-uniform shard loads (n_shard ~ n / shards) that per-term bound,
  * n / (shards * (k + 1)), is comparable to a global MG of size
  * shards * k — what the sharding actually buys is PARALLELISM (shards
  * aggregate independently; a single global summary would serialize
  * every update through one state row). On a skewed stream a shard
  * holding a hot term sees a larger n_shard and its bound loosens
  * proportionally — size `k` to the hottest expected shard, not to the
  * average.
  *
  * Output (one row per surviving summary entry, refreshed every trigger):
  * `shard`, `term`, `est_count` — est_count within n_shard / (k + 1)
  * below the true count, the classic MG bound. Run the sink in `update`
  * mode; for an exact top-m, recount the emitted candidate set against
  * the archived corpus exactly as the batch path does.
  *
  * Works identically on a batch DataFrame (the aggregation is the same
  * plan), which is what the spec uses to pin the summary semantics.
  */
object StreamingHeavyHitters {

  def heavyHitters(
      docs: DataFrame,
      k: Int = 64,
      shards: Int = 16,
      textCol: String = "text"): DataFrame = {
    require(k >= 1, "need k >= 1")
    require(shards >= 1, "need shards >= 1")
    val mg = udaf(new MisraGriesAggregator(k), Encoders.STRING)
    docs
      .select(explode(tokens(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .withColumn("shard", pmod(xxhash64(col("t")), lit(shards)).cast("int"))
      .groupBy("shard")
      .agg(mg(col("t")).as("summary"))
      .select(col("shard"), explode(col("summary")).as(Seq("term", "est_count")))
  }
}
