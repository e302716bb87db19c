package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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

  /** One doc keyed by its content fingerprint, flowing through
    * [[TtlDedupProcessor]].
    */
  final case class FpDoc(doc_id: Long, ts: java.sql.Timestamp, text: String, fp: String)

  /** Exact-dedup with an EXPLICIT state-retention bound — the
    * `transformWithState` form of [[curate]]'s dedup stage, for the
    * 100 TB ingest where "how much fingerprint state does a year of
    * crawling hold" must be a configured number, not an emergent one:
    * each fingerprint's RocksDB entry lives until the event-time
    * watermark passes (arrival watermark + `ttl`), enforced by an
    * event-time TIMER that clears the state — so steady-state store
    * size is (ingest rate × ttl) keys, independent of total corpus
    * age. A duplicate arriving after its fingerprint expired is
    * re-admitted — the documented retention trade, identical to
    * `dropDuplicatesWithinWatermark`'s, but with the bound chosen
    * independently of the lateness watermark (a 10-minute lateness
    * bound no longer forces a 10-minute dedup memory: ttl can be days
    * while lateness stays minutes).
    *
    * The keeper under duplicate arrivals in ONE micro-batch is the
    * (ts, doc_id)-minimal row (a deterministic stand-in for arrival
    * order, which a shuffled micro-batch does not have); across
    * micro-batches the earlier batch wins, as in [[curate]].
    *
    * Requires the RocksDB state store provider (the
    * `transformWithState` contract) and an append sink.
    */
  def curateWithTtl(
      docs: DataFrame,
      watermarkDelay: String,
      ttl: java.time.Duration,
      params: CurationPipeline.Params = CurationPipeline.Params(),
      idCol: String = "doc_id",
      tsCol: String = "ts",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val deduped = docs
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        col(textCol).as("text"), fingerprint(col(textCol)).as("fp"))
      .withWatermark("ts", watermarkDelay)
      .as[FpDoc]
      .groupByKey(_.fp)
      .transformWithState(
        new TtlDedupProcessor(ttl.toMillis), TimeMode.EventTime(), OutputMode.Append())
      .toDF()
      .drop("fp")
    CurationPipeline.qualityLangTail(
      deduped, params, passthrough = Seq("doc_id", "ts"), textCol = "text")
  }

  /** First-arrival-wins fingerprint dedup with timer-driven eviction:
    * state is one boolean-shaped ValueState per live fingerprint plus
    * one event-time timer; [[handleExpiredTimer]] clears both when the
    * watermark passes (registration watermark + ttl).
    */
  final class TtlDedupProcessor(ttlMs: Long)
      extends StatefulProcessor[String, FpDoc, FpDoc] {

    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seenExpiry", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        inputRows: Iterator[FpDoc],
        timerValues: TimerValues): Iterator[FpDoc] = {
      if (seen.exists()) Iterator.empty
      else {
        val keeper = inputRows.reduceLeft { (a, b) =>
          val c = a.ts.compareTo(b.ts)
          if (c < 0 || (c == 0 && a.doc_id <= b.doc_id)) a else b
        }
        val expiry = timerValues.getCurrentWatermarkInMs + ttlMs
        seen.update(expiry)
        getHandle.registerTimer(expiry)
        Iterator.single(keeper)
      }
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[FpDoc] = {
      seen.clear()
      Iterator.empty
    }
  }
}
