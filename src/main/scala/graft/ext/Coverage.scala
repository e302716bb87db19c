package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ======== Greedy max-coverage data selection (submodular curation) ====
  *
  * The coverage-driven subset-selection baseline for training-data
  * curation: pick `k` documents maximizing the number of DISTINCT word
  * bigrams covered — the classic greedy algorithm for monotone
  * submodular maximization, whose (1 − 1/e) approximation guarantee
  * (Nemhauser, Wolsey & Fisher 1978) is the reason every
  * coverage/facility-location data-selection paper starts here: after
  * dedup removes copies, coverage selection removes REDUNDANCY — ten
  * unique-but-interchangeable documents add ten near-zero marginal
  * gains, which frequency sampling cannot see.
  *
  * Semantics: rounds r = 1..k; each round scores every unselected doc
  * by its marginal gain (distinct grams not yet covered) and takes the
  * argmax, ties toward the smallest doc id; selection STOPS at
  * saturation (no doc adds a new gram — emitting zero-gain picks would
  * be redundancy by construction). Deterministic, mirrored by the
  * oracle, which unrolls every round as MATERIALIZED CTE levels (an
  * empty level stays empty through all later levels, so the oracle
  * truncates exactly where the operator stops).
  *
  * 100 TB shape: the gram relation materializes ONCE (one distinct
  * shuffle); each round is one anti-join + one count aggregate over it
  * (gram-keyed, map-side combinable) and collects exactly ONE row — the
  * bounded-driver-collect convention. k rounds = k linear passes, the
  * same inherently-multi-pass budget precedent as `bpe_train`'s 8
  * corpus rewrites; CELF-style lazy evaluation would skip passes when
  * gains are stable and is the documented next rung if k grows.
  */
object Coverage {

  /** Greedy top-`k` coverage selection over distinct word bigrams.
    * Output: (rank, doc_id, marginal_gain) — one row per round, fewer
    * if the corpus runs out of documents.
    */
  def greedySelect(docs: DataFrame, k: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = docs.sparkSession
    val norm = lower(trim(regexp_replace(col(textCol), "[ \\t\\n\\f\\r]+", " ")))
    val grams = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("d"), split(norm, " ").as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col("d"), explode(expr(
        "array_distinct(transform(sequence(1, size(__w) - 1), " +
          "i -> concat_ws(' ', slice(__w, i, 2))))")).as("gr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val ids: Seq[Long] = selected.map(_._2).toSeq
      val remaining = if (ids.isEmpty) grams else grams.filter(!col("d").isin(ids: _*))
      val marg =
        if (ids.isEmpty) remaining.groupBy("d").agg(count(lit(1)).as("marg"))
        else {
          val covered = grams.filter(col("d").isin(ids: _*)).select("gr").distinct()
          remaining.join(covered, Seq("gr"), "left_anti")
            .groupBy("d").agg(count(lit(1)).as("marg"))
        }
      val best = marg.orderBy(col("marg").desc, col("d").asc).limit(1).collect()
      if (best.isEmpty) exhausted = true // saturation: nothing adds a new gram
      else {
        selected += ((r.toLong, best(0).getLong(0), best(0).getLong(1)))
        r += 1
      }
    }
    grams.unpersist()
    val out = StructType(Seq(
      StructField("rank", LongType), StructField("doc_id", LongType),
      StructField("marginal_gain", LongType)))
    spark.createDataFrame(
      java.util.Arrays.asList(selected.toSeq.map(t => Row(t._1, t._2, t._3)): _*), out)
  }
}
