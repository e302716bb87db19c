package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded Misra-Gries frequency buffer: parallel (term, count) arrays with
  * `size` valid slots, at most `k` entries regardless of stream length.
  */
final case class MgBuffer(terms: Array[String], counts: Array[Long], size: Int)

/** Misra-Gries heavy-hitters sketch as a mergeable Spark aggregate — the
  * bounded-memory scale path for "top terms over a corpus": the exact
  * vocabulary count shuffles EVERY distinct term with its count, a
  * vocabulary-sized exchange that at web scale is itself corpus-sized,
  * while this sketch reduces each partition to at most `k` (term, count)
  * entries before the shuffle and merges summaries associatively.
  *
  * Guarantees (classic MG + the Agarwal et al. mergeable-summaries
  * result, which the merge implements): after any sequence of reduces and
  * merges over a stream of `n` items, every term's estimated count is
  * within `n / (k + 1)` below its true count, and every term with true
  * count > `n / (k + 1)` is PRESENT in the summary. So a downstream exact
  * recount of the surviving candidates returns the exact top-m whenever
  * the true m-th frequency clears that threshold — the caller sizes `k`
  * to the skew, exactly like `nlist` sizes the IVF quantizer.
  *
  * The candidate SET (not the recounted result) depends on encounter
  * order and is therefore partition-dependent in the slack band
  * [true - n/(k+1), true]; callers needing a deterministic final answer
  * recount candidates exactly, as [[graft.ext.TextAnalysis
  * .approxVocabulary]] does.
  *
  * Reduce keeps the entries unordered and scans linearly (k is small by
  * construction; the scan short-circuits on reference-equal or
  * length-mismatched strings). The decrement-on-full step compacts zeros
  * in place — amortized O(1) decrements per insertion overall.
  */
final class MisraGriesAggregator(k: Int) extends Aggregator[String, MgBuffer, Map[String, Long]] {
  require(k >= 1, "k must be >= 1")

  override def zero: MgBuffer = MgBuffer(new Array[String](k), new Array[Long](k), 0)

  private def indexOf(b: MgBuffer, term: String): Int = {
    var i = 0
    while (i < b.size) {
      if (b.terms(i) == term) return i
      i += 1
    }
    -1
  }

  override def reduce(b: MgBuffer, term: String): MgBuffer = {
    if (term == null) return b
    val idx = indexOf(b, term)
    if (idx >= 0) { b.counts(idx) += 1; b }
    else if (b.size < k) {
      b.terms(b.size) = term
      b.counts(b.size) = 1L
      b.copy(size = b.size + 1)
    } else {
      // MG eviction: decrement every counter (the arriving term's +1 and
      // the -1 cancel, so it is not inserted); compact the zeroed slots
      var w = 0
      var i = 0
      while (i < b.size) {
        val c = b.counts(i) - 1
        if (c > 0) { b.terms(w) = b.terms(i); b.counts(w) = c; w += 1 }
        i += 1
      }
      b.copy(size = w)
    }
  }

  override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = {
    if (b2.size == 0) return b1
    if (b1.size == 0) return b2
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < b1.size) { m.update(b1.terms(i), b1.counts(i)); i += 1 }
    i = 0
    while (i < b2.size) { m.update(b2.terms(i), m.getOrElse(b2.terms(i), 0L) + b2.counts(i)); i += 1 }
    if (m.size <= k) {
      val out = zero
      var w = 0
      m.foreach { case (t, c) => out.terms(w) = t; out.counts(w) = c; w += 1 }
      out.copy(size = w)
    } else {
      // mergeable-summaries step: subtract the (k+1)-th largest count from
      // every entry and keep the strictly positive ones — at most k survive,
      // and the total undercount stays bounded by n/(k+1)
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1))
      val out = zero
      var w = 0
      m.foreach { case (t, c) =>
        if (c - sub > 0) { out.terms(w) = t; out.counts(w) = c - sub; w += 1 }
      }
      out.copy(size = w)
    }
  }

  override def finish(b: MgBuffer): Map[String, Long] =
    (0 until b.size).map(i => b.terms(i) -> b.counts(i)).toMap

  override def bufferEncoder: Encoder[MgBuffer] = Encoders.product[MgBuffer]
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
}
