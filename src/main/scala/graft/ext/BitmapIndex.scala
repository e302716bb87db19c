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

  /** All 62 payload bits set — the fill-word sentinel for [[compress]]. */
  val FullWord: Long = (1L << WordBits) - 1L

  /** Words per container: runs are detected WITHIN fixed containers of
    * 1024 words (the Roaring container model — 2^16 bits there, 1024×62
    * here), so the run-detection window is partitioned by (value,
    * container) and bounded by 1024 rows at ANY corpus size. A
    * per-value window would be corpus/62 rows for a frequent value —
    * the same single-task skew the SNM rank fix removed. Runs crossing
    * a container boundary split in two: a bounded compression loss
    * traded for a bounded window, exactly Roaring's trade.
    */
  val ContainerWords = 1024

  /** WAH-style run-length compression of a [[build]] index: maximal
    * runs of FULL words (all 62 bits set — every doc in the block has
    * the value, the clustered-attribute case: date partitions, range
    * shards, sorted ingest) collapse to one row. Output: (v, ctr, ws,
    * we, bits, popcnt) — a literal has ws == we and its word's bits; a
    * run has ws < we, bits == [[FullWord]]; popcnt counts the whole
    * segment. Gaps-and-islands (w − row_number) inside each (v,
    * container) group finds maximal runs; the window is bounded by
    * [[ContainerWords]].
    */
  def compress(index: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seg = index.withColumn("ctr", expr(s"w DIV $ContainerWords"))
    val lit0 = seg.filter(col("bits") =!= FullWord)
      .select(col("v"), col("ctr"), col("w").as("ws"), col("w").as("we"), col("bits"))
    val runs = seg.filter(col("bits") === FullWord)
      .withColumn("isl",
        col("w") - row_number().over(Window.partitionBy("v", "ctr").orderBy("w")))
      .groupBy("v", "ctr", "isl")
      .agg(min(col("w")).as("ws"), max(col("w")).as("we"))
      .select(col("v"), col("ctr"), col("ws"), col("we"), lit(FullWord).as("bits"))
    lit0.unionByName(runs)
      .withColumn("popcnt",
        (expr("bit_count(bits)").cast("long") * (col("we") - col("ws") + 1L)))
  }

  /** Conjunctive counts through the COMPRESSED index: the AND runs on
    * segments, so a run of 1 000 full words ANDs in one row instead of
    * 1 000. Segments never cross containers, so segment overlap is an
    * EQUI-join on the container followed by a range-overlap filter
    * within it — no theta join; each overlapping pair contributes
    * `bit_count(ba & bb) × overlap_words` (run ∧ run = run, run ∧
    * literal = the literal — the WAH algebra). Output contract
    * identical to [[andCounts]]: (a, b, n_bitmap, n_exact), and the
    * gate is the identity n_bitmap == n_exact over the compressed form.
    */
  def andCountsCompressed(rel: DataFrame, idCol: String,
      attrA: String, attrB: String): DataFrame = {
    val base = rel.filter(col(idCol).isNotNull && col(idCol) >= 0 &&
      col(attrA).isNotNull && col(attrB).isNotNull)
    val ca = compress(build(base, idCol, attrA))
      .select(col("v").as("a"), col("ctr"),
        col("ws").as("was"), col("we").as("wae"), col("bits").as("ba"))
    val cb = compress(build(base, idCol, attrB))
      .select(col("v").as("b"), col("ctr"),
        col("ws").as("wbs"), col("we").as("wbe"), col("bits").as("bb"))
    val viaIndex = ca.join(cb, Seq("ctr"))
      .filter(col("was") <= col("wbe") && col("wbs") <= col("wae"))
      .select(col("a"), col("b"),
        (expr("CAST(bit_count(ba & bb) AS LONG)") *
          (least(col("wae"), col("wbe")) - greatest(col("was"), col("wbs")) + 1L))
          .as("c"))
      .groupBy("a", "b").agg(sum(col("c")).as("n_bitmap"))
    val exact = base.groupBy(col(attrA).as("a"), col(attrB).as("b"))
      .agg(count(lit(1)).as("n_exact"))
    exact.join(viaIndex, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("n_bitmap"), lit(0L)).as("n_bitmap"),
        col("n_exact"))
  }

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
