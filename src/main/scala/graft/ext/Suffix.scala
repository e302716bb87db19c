package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ======== Suffix arrays by prefix doubling, under the gate ========
  *
  * The index structure behind exact-substring deduplication of training
  * corpora (find every repeated span above a length threshold by
  * adjacent-suffix comparison): per-document suffix arrays, built with
  * the classic prefix-doubling algorithm — and built out of exactly two
  * relational primitives per round, `lead` and `dense_rank`, so the
  * WHOLE construction is replayable in SQL:
  *
  *  - round 0: rank each position by its codepoint (`dense_rank` over
  *    the doc partition);
  *  - round k: pair each position's rank with the rank `2^(k-1)` ahead
  *    (`lead`, 0 as the beyond-end sentinel — ranks start at 1, so the
  *    sentinel sorts first, which is exactly "shorter suffix wins");
  *    re-rank by the pair. After ceil(log2 maxLen) rounds every rank is
  *    distinct and equals the suffix's lexicographic rank.
  *
  * Everything is integer arithmetic over window functions both engines
  * implement identically, so the oracle unrolls the rounds as
  * MATERIALIZED CTEs and hash-compares the resulting suffix ORDER
  * per document (positions folded in SA order). `rounds` must cover
  * log2 of the longest document; under-provisioning stays deterministic
  * (the final order tie-breaks by position) but is no longer a true
  * suffix order — callers size it from their corpus contract.
  *
  * 100 TB shape: positions live (doc_id, i) — every window partitions
  * by doc_id, so after the first shuffle the partitioning is reused
  * round to round; work is O(n log maxLen) rows through codegen'd
  * window exchanges, no driver state. Documents are the natural
  * parallel unit — exactly how the published exact-substring pipelines
  * shard.
  */
object Suffix {

  final case class SuffixStats(doc_id: Long, n: Long, sa_checksum: Long)

  def suffixArrayStats(docs: DataFrame, rounds: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): Dataset[SuffixStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // a small corpus parquet arrives as ONE scan split, which would run the
    // whole codepoint explosion single-core before the first window
    // exchange; spread the (tiny) doc rows first. No-op at scale, where the
    // scan already has enough splits.
    val target = spark.sparkContext.defaultParallelism
    val spread = if (docs.rdd.getNumPartitions < target) docs.repartition(target) else docs
    // one typed pass for codepoint discipline (UTF-16 chars would
    // disagree with DuckDB's per-character substr on astral symbols)
    val positions = spread
      .filter(col(idCol).isNotNull && col(idCol) >= 0 && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val out = Vector.newBuilder[(Long, Int, Int)]
        val it = text.codePoints().iterator()
        var i = 0
        while (it.hasNext) { out += ((id, i, it.next())); i += 1 }
        out.result()
      }
      .toDF("doc_id", "i", "c")
    val byDoc = Window.partitionBy("doc_id")
    var ranked = positions
      .withColumn("r", dense_rank().over(byDoc.orderBy(col("c"))))
      .select(col("doc_id"), col("i"), col("r"))
    var k = 0
    while (k < rounds) {
      val d = 1 << k
      ranked = ranked
        .withColumn("r2", lead(col("r"), d, 0).over(byDoc.orderBy(col("i"))))
        .withColumn("rn", dense_rank().over(byDoc.orderBy(col("r"), col("r2"))))
        .select(col("doc_id"), col("i"), col("rn").as("r"))
      k += 1
    }
    ranked
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n"),
        aggregate(
          transform(sort_array(collect_list(struct(col("r"), col("i")))), x => x.getField("i").cast("long")),
          lit(0L),
          (acc, x) => (acc * 31 + x) % 1000000007L).as("sa_checksum"))
      .as[SuffixStats]
  }

  /** The same construction as DuckDB SQL, rounds unrolled. */
  private[graft] def oracleSql(textCol: String, rounds: Int): String = {
    val roundsSql = (1 to rounds).map { k =>
      val d = 1 << (k - 1)
      s"""s$k AS MATERIALIZED (SELECT doc_id, i, r,
         |    coalesce(lead(r, $d) OVER (PARTITION BY doc_id ORDER BY i), 0) AS r2
         |  FROM r${k - 1}),
         |r$k AS MATERIALIZED (SELECT doc_id, i,
         |    dense_rank() OVER (PARTITION BY doc_id ORDER BY r, r2) AS r
         |  FROM s$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT doc_id, $textCol AS t FROM documents
       |           WHERE doc_id IS NOT NULL AND doc_id >= 0 AND $textCol IS NOT NULL),
       |p AS (SELECT doc_id, CAST(unnest(range(length(t))) AS INT) AS i, t FROM d),
       |r0 AS MATERIALIZED (SELECT doc_id, i,
       |    dense_rank() OVER (PARTITION BY doc_id ORDER BY unicode(substr(t, i + 1, 1))) AS r
       |  FROM p),
       |$roundsSql
       |SELECT doc_id, count(*)::BIGINT AS n,
       |       list_reduce(list_prepend(0::BIGINT, list(i::BIGINT ORDER BY r, i)),
       |         (a, x) -> (a * 31 + x) % 1000000007) AS sa_checksum
       |FROM r$rounds
       |GROUP BY doc_id""".stripMargin
  }
}
