package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** ======== Mergeable cardinality / frequency sketches ========
  *
  * The two sketch structures a 100 TB corpus profile actually runs on:
  * HyperLogLog registers for "how many distinct tokens" and a Count-Min
  * sketch for "roughly how often does each token occur" — both computed
  * as ordinary aggregations whose PARTIAL states are the sketches
  * themselves, so Spark's map-side combine bounds every task's shuffle
  * output at the sketch size (64 rows for HLL, d*w cells for CMS) no
  * matter how many tokens a partition holds. That is the whole point of
  * sketching at scale: the shuffle carries registers, not tokens.
  *
  * Both use md5-derived hashes (not engine-native xxhash) so the DuckDB
  * oracle replays every register bitwise — the [[Dedup.simhashMd5]]
  * portability pattern. The rank of an HLL hash (position of the first
  * set bit) is computed by an integer CASE cascade, NOT floor(log2(x)):
  * float log at a power-of-two boundary is exactly the kind of
  * engine-divergent edge the bitwise gate exists to catch.
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * sketch path; north-star LLM-pipeline scope.
  */
object Sketches {

  /** 60-bit positive hash from the first 15 hex chars of md5(prefix||s). */
  private def md5Hash60(s: Column, prefix: String): Column =
    conv(substring(md5(if (prefix.isEmpty) s else concat(lit(prefix), s)), 1, 15), 16, 10)
      .cast("long")

  /** rank = 1 + leading zeros of `r` within a `bits`-wide window (the HLL
    * register value); r == 0 maps to bits + 1. Pure integer comparisons.
    */
  private def rankCase(r: Column, bits: Int): Column = {
    // WHEN r >= 2^(bits-1) THEN 1 ... WHEN r >= 1 THEN bits ELSE bits+1
    (1 to bits).foldLeft(when(lit(false), 0)) { (acc, k) =>
      acc.when(r >= (1L << (bits - k)), k)
    }.otherwise(bits + 1).cast("long")
  }

  /** The identical cascade as SQL text for the DuckDB oracle. */
  def rankCaseSql(rExpr: String, bits: Int): String =
    (1 to bits).map(k => s"WHEN $rExpr >= ${1L << (bits - k)} THEN $k")
      .mkString("CASE ", " ", s" ELSE ${bits + 1} END")

  /** HyperLogLog register table over the corpus token stream: bucket =
    * low `b` bits of the 60-bit md5 hash, register = max over tokens of
    * (1 + leading zeros of the remaining 60-b bits). Every bucket in
    * [0, 2^b) is emitted (rank 0 when unhit), so the output IS the
    * complete sketch state — directly mergeable with another corpus's
    * table by cellwise max, which is also exactly what Spark's partial
    * aggregation does on each map task before the one 2^b-row shuffle.
    *
    * The estimate itself (alpha_m * m^2 / sum 2^-M) is a float harmonic
    * sum — order-dependent, so it lives in SketchesSpec's accuracy
    * check, never in the oracled projection.
    */
  def hllRegisters(docs: DataFrame, b: Int = 6, textCol: String = "text"): DataFrame = {
    require(b >= 1 && b <= 16)
    val m = 1 << b
    val rembits = 60 - b
    val spark = docs.sparkSession
    val h = md5Hash60(col("token"), "")
    val regs = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      // h is 60-bit: bucket/remainder must be integer ops (a double
      // division would be inexact past 2^53), hence the shift
      .select((h % m).as("bucket"), rankCase(shiftright(h, b), rembits).as("rank"))
      .groupBy("bucket")
      .agg(max("rank").as("max_rank"))
    spark.range(m).select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("max_rank"), lit(0L)).as("max_rank"))
  }

  /** Count-Min sketch of token frequencies: `d` independent md5-derived
    * hash rows, `w` columns; cell (i, c) counts tokens with
    * hash_i(token) mod w == c. Plan shape: explode -> project d (row,
    * col) pairs -> ONE partially-aggregated count shuffle whose map-side
    * combine caps every task at d*w rows. Unhit cells are emitted as 0
    * so the d*w-row output is the full mergeable state (cellwise SUM —
    * the merge SketchesSpec pins).
    *
    * Point queries (min over rows of cell(hash_i(x))) overestimate only:
    * est >= true always; the spec pins the classic e/w error bound on
    * the corpus top terms.
    */
  def cmsCounts(docs: DataFrame, d: Int = 4, w: Int = 1024, textCol: String = "text"): DataFrame = {
    require(d >= 1 && w >= 2)
    val spark = docs.sparkSession
    val cells = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .select(explode(array((0 until d).map { i =>
        struct(lit(i.toLong).as("sketch_row"),
          (md5Hash60(col("token"), s"$i:") % w).as("col"))
      }: _*)).as("cell"))
      .groupBy(col("cell.sketch_row").as("sketch_row"), col("cell.col").as("col"))
      .agg(count(lit(1)).as("cnt"))
    spark.range(d.toLong * w)
      .select(expr(s"id DIV $w").as("sketch_row"), (col("id") % w).as("col"))
      .join(cells, Seq("sketch_row", "col"), "left")
      .select(col("sketch_row"), col("col"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }
}
