package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== Suffix arrays by prefix doubling, under the gate ========
  *
  * The index structure behind exact-substring deduplication of training
  * corpora (find every repeated span above a length threshold by
  * adjacent-suffix comparison): per-document suffix arrays, built with
  * the classic prefix-doubling algorithm:
  *
  *  - round 0: rank each position by its codepoint;
  *  - round k: pair each position's rank with the rank `2^(k-1)` ahead
  *    (beyond-end sentinel sorts FIRST — exactly "shorter suffix
  *    wins"); re-rank by the pair. After ceil(log2 maxLen) rounds every
  *    rank is distinct and equals the suffix's lexicographic rank.
  *
  * The construction runs LOCALLY per document (round 16 — it was
  * previously 2·rounds global window passes over the exploded position
  * table, the suite's hottest window pipeline at ~21 partition sorts of
  * |corpus| rows; a document is bounded by definition, so per-doc
  * O(n log² n) in a map is the published exact-substring pipelines'
  * own sharding and removes EVERY shuffle from the operator). The
  * oracle still unrolls the identical doubling as MATERIALIZED
  * relational CTEs in DuckDB and hash-compares the suffix ORDER per
  * document — the result is algorithm-shape-independent, so the local
  * build must land on the same fold bit-for-bit, including the
  * `rounds`-capped semantics: under-provisioned rounds tie-break by
  * position, exactly like the relational form.
  *
  * 100 TB shape: map-only — zero shuffles, documents are the parallel
  * unit, no driver state.
  */
object Suffix {

  final case class SuffixStats(doc_id: Long, n: Long, sa_checksum: Long)

  /** Positions sorted by (rank after ≤ `rounds` doubling iterations,
    * position) — the relational construction's exact order, including
    * the under-provisioned-rounds tie-break.
    */
  private[ext] def saOrder(cps: Array[Int], rounds: Int): Array[Int] = {
    val n = cps.length
    val sa = Array.range(0, n)
    if (n <= 1) return sa
    var rank = cps.clone() // round 0: codepoint order (dense ranks not needed)
    var tmp = new Array[Int](n)
    val boxed = new Array[Integer](n)
    var i = 0
    while (i < n) { boxed(i) = Integer.valueOf(i); i += 1 }
    var k = 0
    var distinct = false
    while (k < rounds && !distinct) {
      val d = 1 << k
      val r = rank // stable capture for the comparator
      def key2(p: Int): Int = if (p + d < n) r(p + d) else Int.MinValue // sentinel first
      java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
        def compare(a: Integer, b: Integer): Int = {
          val c1 = Integer.compare(r(a), r(b))
          if (c1 != 0) c1 else Integer.compare(key2(a), key2(b))
        }
      })
      var rr = 0
      tmp(boxed(0)) = 0
      var j = 1
      while (j < n) {
        val a = boxed(j - 1).intValue
        val b = boxed(j).intValue
        if (r(a) != r(b) || key2(a) != key2(b)) rr += 1
        tmp(b) = rr
        j += 1
      }
      val sw = rank; rank = tmp; tmp = sw
      distinct = rr == n - 1
      k += 1
    }
    // final order: (rank, position) — ties by position when rounds were
    // capped below ceil(log2 n), exactly the relational tie-break
    val fr = rank
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      def compare(a: Integer, b: Integer): Int = {
        val c1 = Integer.compare(fr(a), fr(b))
        if (c1 != 0) c1 else Integer.compare(a.intValue, b.intValue)
      }
    })
    i = 0
    while (i < n) { sa(i) = boxed(i).intValue; i += 1 }
    sa
  }

  def suffixArrayStats(docs: DataFrame, rounds: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): Dataset[SuffixStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // a small corpus parquet arrives as ONE scan split; spread the doc
    // rows so the per-doc builds parallelize. No-op at scale.
    val target = spark.sparkContext.defaultParallelism
    val spread = if (docs.rdd.getNumPartitions < target) docs.repartition(target) else docs
    spread
      .filter(col(idCol).isNotNull && col(idCol) >= 0 && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        // codepoint discipline: UTF-16 chars would disagree with DuckDB's
        // per-character substr on astral symbols
        val cps = text.codePoints().toArray
        if (cps.isEmpty) None // the relational form emits no row for ""
        else {
          val sa = saOrder(cps, rounds)
          var ck = 0L
          sa.foreach(i => ck = (ck * 31 + i) % 1000000007L)
          Some(SuffixStats(id, cps.length.toLong, ck))
        }
      }
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
