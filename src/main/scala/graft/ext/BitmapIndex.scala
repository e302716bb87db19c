package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ======== Bitmap secondary indexes (word-aligned, boolean algebra) ====
  *
  * The columnar secondary index for low-cardinality attributes (the
  * Oracle/Druid/Pinot bitmap-index construction, word-aligned like the
  * uncompressed base layer of WAH/Roaring): for each attribute VALUE,
  * one 62-bit word per 62-document id block with a set bit per matching
  * document — built by a single `bit_or` hash aggregate (map-side
  * combinable; the shuffle carries one row per (value, word), never per
  * document). Boolean predicates then run entirely on the INDEX:
  * `lang = x AND source = y` is a word-aligned `&` + popcount — no scan
  * of the base relation, which is the entire point at 100 TB (the
  * word-join cost is |ids| / 62 per value pair).
  *
  * 62 (not 64) bits per word: DuckDB's BIGINT shift is
  * overflow-checked, so `1 << 63` errors there while the JVM wraps —
  * 62 keeps every shift, or-fold, and popcount bit-identical in both
  * engines with two bits of headroom. Documents need non-negative ids
  * (the id IS the bit position); negatives are excluded, not wrapped.
  *
  * [[andCounts]] grades the index against ground truth: for every
  * (lang, source) pair present in the data, the popcount of the ANDed
  * bitmaps must equal the exact count — an index that drops a word,
  * misaligns a block, or double-sets a bit fails on the first pair.
  */
object BitmapIndex {

  val WordBits = 62

  /** Per-value word bitmaps: (v, w, bits, popcnt). */
  def build(rel: DataFrame, idCol: String, attrCol: String): DataFrame =
    rel
      .filter(col(idCol).isNotNull && col(idCol) >= 0 && col(attrCol).isNotNull)
      .select(col(attrCol).as("v"),
        expr(s"$idCol DIV $WordBits").as("w"),
        expr(s"shiftleft(1L, CAST($idCol % $WordBits AS INT))").as("bit"))
      .groupBy("v", "w")
      .agg(expr("bit_or(bit)").as("bits"))
      .withColumn("popcnt", expr("bit_count(bits)").cast("long"))

  /** Conjunctive counts THROUGH the index, next to the exact counts:
    * (a, b, n_bitmap, n_exact) for every (attrA, attrB) pair in `rel`.
    */
  def andCounts(rel: DataFrame, idCol: String, attrA: String, attrB: String): DataFrame = {
    val base = rel.filter(col(idCol).isNotNull && col(idCol) >= 0 &&
      col(attrA).isNotNull && col(attrB).isNotNull)
    val ia = build(base, idCol, attrA)
      .select(col("v").as("a"), col("w"), col("bits").as("ba"))
    val ib = build(base, idCol, attrB)
      .select(col("v").as("b"), col("w"), col("bits").as("bb"))
    val viaIndex = ia.join(ib, Seq("w"))
      .groupBy("a", "b")
      .agg(sum(expr("CAST(bit_count(ba & bb) AS LONG)")).as("n_bitmap"))
    val exact = base.groupBy(col(attrA).as("a"), col(attrB).as("b"))
      .agg(count(lit(1)).as("n_exact"))
    exact.join(viaIndex, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("n_bitmap"), lit(0L)).as("n_bitmap"),
        col("n_exact"))
  }
}
