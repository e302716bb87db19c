package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored id, ordered by (score desc, id asc). */
final case class ScoredId(id: Long, score: Double)

/** Bounded top-k buffer: parallel arrays sorted best-first, `size` valid slots. */
final case class TopKBuffer(ids: Array[Long], scores: Array[Double], size: Int)

/** Bounded top-k aggregate by (score desc, id asc).
  *
  * This is the scale-safe form of "rank per group then filter rank <= k": the
  * window-function form shuffles EVERY scored row to the rank stage (|Q|*|C|
  * rows for a similarity search), while an Aggregator participates in partial
  * aggregation — each map task reduces its partition to at most k entries per
  * group, so the shuffle carries O(k) rows per (group, partition). At 100 TB
  * that is the difference between shuffling the cross product and shuffling
  * the answer.
  *
  * The buffer keeps its entries sorted best-first; inserts are O(k) (k is
  * small by construction).
  */
final class TopKAggregator(k: Int) extends Aggregator[ScoredId, TopKBuffer, Array[ScoredId]] {
  require(k >= 1, "k must be >= 1")

  override def zero: TopKBuffer = TopKBuffer(new Array[Long](k), new Array[Double](k), 0)

  /** Ordering matches SQL `ORDER BY score DESC, id ASC`: NaN sorts GREATER
    * than every double (so NaN ranks first, as Spark and DuckDB rank it),
    * +/-0.0 compare equal, ties break by id ascending.
    */
  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    if (s1 == s2 || (s1.isNaN && s2.isNaN)) i1 < i2
    else java.lang.Double.compare(s1, s2) > 0

  /** Insert (id, score) keeping best-first order; mutates the arrays in place
    * (TypedImperativeAggregate buffers are owned by the operator).
    */
  private def insert(b: TopKBuffer, id: Long, score: Double): TopKBuffer = {
    if (b.size == k && !beats(score, id, b.scores(k - 1), b.ids(k - 1))) return b
    var pos = if (b.size == k) k - 1 else b.size
    while (pos > 0 && beats(score, id, b.scores(pos - 1), b.ids(pos - 1))) {
      b.ids(pos) = b.ids(pos - 1)
      b.scores(pos) = b.scores(pos - 1)
      pos -= 1
    }
    b.ids(pos) = id
    b.scores(pos) = score
    if (b.size == k) b else b.copy(size = b.size + 1)
  }

  override def reduce(b: TopKBuffer, a: ScoredId): TopKBuffer = insert(b, a.id, a.score)

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    var out = b1
    var i = 0
    while (i < b2.size) { out = insert(out, b2.ids(i), b2.scores(i)); i += 1 }
    out
  }

  override def finish(b: TopKBuffer): Array[ScoredId] =
    Array.tabulate(b.size)(i => ScoredId(b.ids(i), b.scores(i)))

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[Array[ScoredId]] = ExpressionEncoder[Array[ScoredId]]()
}
