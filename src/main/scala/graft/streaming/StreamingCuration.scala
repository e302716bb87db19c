package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.CurationPipeline
import graft.functions.TextFunctions._

/** The live-ingest twin of [[graft.ext.CurationPipeline]]: the same
  * dedup -> quality -> language stages, expressed over an unbounded
  * document stream so a crawl feed is curated as it arrives instead of in
  * nightly batches.
  *
  *  1. exact dedup via `dropDuplicatesWithinWatermark` on the content
  *     fingerprint — the keeper is the FIRST arrival (batch curation keeps
  *     the min doc_id; arrival order is the only total order a stream
  *     has), and the watermark bounds dedup state so a year-long ingest
  *     does not accumulate a year of fingerprints;
  *  2. quality gate on the same single-pass column expressions
  *     ([[CurationPipeline.Params]] — min chars, distinct-token ratio);
  *  3. language-ID tag kept in the output.
  *
  * Near-dup (MinHash) removal is deliberately NOT in the streaming path:
  * LSH banding needs corpus-wide gram statistics and a candidate
  * self-join, neither of which has bounded streaming state — run the
  * batch [[CurationPipeline]] over the curated archive periodically (the
  * standard lambda split: cheap exact hygiene inline, quadratic-candidate
  * hygiene in the batch pass).
  *
  * Streaming-only by construction (`dropDuplicatesWithinWatermark` has no
  * batch form — Spark rejects it at analysis); run with an `append` sink.
  * The batch equivalent IS [[CurationPipeline.curate]].
  *
  * Output: doc_id, ts, n_chars, n_tokens, distinct_ratio, lang_pred.
  */
object StreamingCuration {

  def curate(
      docs: DataFrame,
      watermarkDelay: String,
      params: CurationPipeline.Params = CurationPipeline.Params(),
      idCol: String = "doc_id",
      tsCol: String = "ts",
      textCol: String = "text"): DataFrame = {
    val deduped = docs
      .withColumn("__fp", fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
    // the ONE quality/language tail, shared with the batch pipeline — the
    // "live-ingest twin" contract holds by construction
    CurationPipeline.qualityLangTail(
      deduped, params, passthrough = Seq(idCol, tsCol), textCol = textCol)
  }
}
