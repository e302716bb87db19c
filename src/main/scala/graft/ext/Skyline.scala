package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ======== Skyline (Pareto frontier) preference queries ========
  *
  * The dominance operator (Börzsönyi et al., "The Skyline Operator",
  * ICDE 2001): keep every row no other row dominates, where `a`
  * dominates `b` iff a ≤ b on BOTH criteria and < on at least one
  * (both criteria minimized here; flip signs upstream to maximize).
  * Equal pairs do not dominate each other — duplicates of a frontier
  * point all survive, the standard semantics. In a curation pipeline
  * this is the quality-vs-cost frontier (e.g. maximize quality score,
  * minimize token cost) — the rows every mixing strategy should
  * consider before any scalarized ranking throws the trade-off away.
  *
  * Algorithm: the classic TWO-PHASE distributed block-nested-loop —
  * each partition reduces to its LOCAL skyline (a global skyline point
  * is locally undominated, so phase 1 never loses an answer; a
  * globally dominated point's dominator chain ends at a frontier point
  * that survives phase 1 and kills it in phase 2 by transitivity), then
  * the union of local frontiers collapses through one single-partition
  * BNL pass. The phase-2 input is Σ per-partition frontier sizes — for
  * 2-D data that is typically tiny (correlated data: O(1) per
  * partition), and that data-dependence is the documented contract:
  * fully anti-correlated data has an O(n) skyline and NO algorithm
  * returns a small answer on it (cap upstream if the criteria can be
  * adversarially anti-correlated). All-integer comparisons — bitwise
  * on any engine; the oracle is the direct NOT EXISTS dominance
  * definition, so the two-phase reduction is graded against ground
  * truth, not another BNL.
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * preference-query path; conventional-OLAP + curation scope.
  */
object Skyline {

  /** Local BNL pass: fold rows against an accumulated frontier. */
  private def bnl(it: Iterator[Row]): Iterator[Row] = {
    val front = scala.collection.mutable.ArrayBuffer.empty[Row]
    it.foreach { p =>
      val px = p.getLong(1); val py = p.getLong(2)
      var dominated = false
      var i = 0
      while (i < front.length && !dominated) {
        val fx = front(i).getLong(1); val fy = front(i).getLong(2)
        if (fx <= px && fy <= py && (fx < px || fy < py)) dominated = true
        else if (px <= fx && py <= fy && (px < fx || py < fy)) {
          front.remove(i); i -= 1 // the newcomer kills a frontier member
        }
        i += 1
      }
      if (!dominated) front += p
    }
    front.iterator
  }

  /** 2-criteria min/min skyline of `(id, x, y)` Long columns.
    * Output: (id, x, y) for every undominated row.
    */
  def skyline(rel: DataFrame, idCol: String, xCol: String, yCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType), StructField("x", LongType),
      StructField("y", LongType)))
    val base = rel
      .filter(col(idCol).isNotNull && col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(idCol).cast("long"), col(xCol).cast("long"), col(yCol).cast("long"))
    val enc = org.apache.spark.sql.Encoders.row(out)
    base
      .mapPartitions(bnl)(enc) // phase 1: local frontiers
      .repartition(1)
      .mapPartitions(bnl)(enc) // phase 2: one pass over the frontier union
      .toDF("id", "x", "y")
  }
}
