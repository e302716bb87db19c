package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ======== Declarative data-quality expectation audit ========
  *
  * The admission gate a production ingest runs before a snapshot is
  * allowed into training: a rule set (null checks, accepted-value
  * predicates, key uniqueness, referential integrity) evaluated into one
  * small (rule, violations, total, pass) report — the dbt-tests /
  * Deequ-style contract surface, expressed as pure Spark aggregates.
  *
  * Scale shape, by rule type:
  *  - [[NotNull]] / [[Accepted]] rules on the same table FUSE into one
  *    scan: a single hash aggregate computes `count(*)` plus one
  *    conditional sum per rule (map-side combinable, no shuffle beyond
  *    the 1-row aggregate), then explodes into one report row per rule
  *    — N column rules cost ONE pass, not N.
  *  - [[Unique]]: one (key → count) hash aggregate, then excess rows
  *    (Σ(cnt−1) over duplicated keys) in a second 1-row aggregate. The
  *    shuffle carries distinct keys, never rows.
  *  - [[ForeignKey]]: the child side collapses to (distinct key, count)
  *    BEFORE the join, so the anti-join probes one row per distinct
  *    child key against the parent's distinct keys (AQE picks broadcast
  *    when the parent is small, sort-merge at scale — nothing forced).
  *
  * Every rule reports exact BIGINT counts — deterministic under any
  * partitioning, and the whole report is plain ANSI SQL, so the DuckDB
  * oracle replays it bitwise.
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * batch admission path; north-star pipeline-hygiene scope.
  */
object DataQuality {

  /** One expectation. `table` names a key in the `tables` map given to
    * [[audit]].
    */
  sealed trait Rule { def table: String; def name: String }

  /** `column IS NOT NULL` for every row. */
  final case class NotNull(table: String, column: String) extends Rule {
    def name = s"not_null:$table.$column"
  }

  /** `predicateSql` must hold wherever `column` is non-null (null rows are
    * [[NotNull]]'s job, not a value violation — the dbt convention).
    * `label` keys the report row.
    */
  final case class Accepted(table: String, column: String, predicateSql: String,
      label: String) extends Rule {
    def name = s"accepted:$table.$column:$label"
  }

  /** The column set is a candidate key over rows where every component is
    * non-null; violations = excess rows (Σ(cnt−1) over duplicated keys —
    * "rows a dedup would drop").
    */
  final case class Unique(table: String, columns: Seq[String]) extends Rule {
    def name = s"unique:$table.${columns.mkString("+")}"
  }

  /** Every non-null `column` value must exist in `refTable.refColumn`;
    * violations = child ROWS (not keys) whose key has no parent.
    */
  final case class ForeignKey(table: String, column: String,
      refTable: String, refColumn: String) extends Rule {
    def name = s"fk:$table.$column->$refTable.$refColumn"
  }

  /** Evaluate `rules` over `tables` into (rule, violations, total, pass).
    * `total` is the count of rows the rule examined (all rows for
    * not_null/unique, non-null rows for accepted/fk).
    */
  def audit(tables: Map[String, DataFrame], rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    rules.foreach(r => require(tables.contains(r.table), s"unknown table ${r.table}"))

    // -- scan rules (not_null + accepted): one fused aggregate per table
    val scanRules = rules.collect {
      case r: NotNull => (r.table, r.name, col(r.column).isNull, lit(true))
      case r: Accepted =>
        (r.table, r.name, col(r.column).isNotNull && !expr(r.predicateSql),
          col(r.column).isNotNull)
    }
    val scanReports = scanRules.groupBy(_._1).toSeq.map { case (t, rs) =>
      val aggs = rs.zipWithIndex.flatMap { case ((_, _, viol, scope), i) =>
        Seq(sum(when(viol, 1L).otherwise(0L)).as(s"__v$i"),
          sum(when(scope, 1L).otherwise(0L)).as(s"__t$i"))
      }
      val row = tables(t).agg(aggs.head, aggs.tail: _*)
      val entries = rs.zipWithIndex.map { case ((_, name, _, _), i) =>
        struct(lit(name).as("rule"),
          coalesce(col(s"__v$i"), lit(0L)).as("violations"), // empty table: sums are NULL
          coalesce(col(s"__t$i"), lit(0L)).as("total"))
      }
      row.select(explode(array(entries: _*)).as("r"))
        .select(col("r.rule"), col("r.violations"), col("r.total"))
    }

    // -- unique rules: (key -> count) then excess rows
    val uniqueReports = rules.collect { case r: Unique =>
      val keyed = tables(r.table)
        .filter(r.columns.map(col(_).isNotNull).reduce(_ && _))
        .groupBy(r.columns.map(col): _*)
        .agg(count(lit(1)).as("__cnt"))
      keyed.agg(
        coalesce(sum(when(col("__cnt") > 1, col("__cnt") - 1)), lit(0L)).as("violations"),
        coalesce(sum(col("__cnt")), lit(0L)).as("total"))
        .select(lit(r.name).as("rule"), col("violations"), col("total"))
    }

    // -- fk rules: distinct child keys (with row counts) anti-join parent
    val fkReports = rules.collect { case r: ForeignKey =>
      val keyed = tables(r.table)
        .filter(col(r.column).isNotNull)
        .groupBy(col(r.column).as("__k"))
        .agg(count(lit(1)).as("__cnt"))
      val parents = tables(r.refTable)
        .filter(col(r.refColumn).isNotNull)
        .select(col(r.refColumn).as("__k")).distinct()
      val orphans = keyed.join(parents, Seq("__k"), "left_anti")
        .agg(coalesce(sum(col("__cnt")), lit(0L)).as("violations"))
      val totals = keyed.agg(coalesce(sum(col("__cnt")), lit(0L)).as("total"))
      orphans.crossJoin(totals) // two 1-row frames
        .select(lit(r.name).as("rule"), col("violations"), col("total"))
    }

    (scanReports ++ uniqueReports ++ fkReports)
      .reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
  }

  /** Chi-square independence audit between two categorical columns — the
    * dataset-bias check ("is language independent of source?") a corpus
    * card reports before training. Emits ONE ROW PER CELL of the
    * contingency table with observed count, marginals, expected count
    * `e = (na·nb)/n`, and the cell's chi-square contribution
    * `(o − e)²/e` — each a FIXED IEEE tree over exact BIGINT counts, so
    * every row is bitwise portable. The statistic total is deliberately
    * NOT emitted: a cross-cell double sum is aggregation-order-dependent
    * and would break the bitwise gate; consumers sum contributions in a
    * pinned order (or accept last-bit noise) themselves.
    *
    * Scale shape: one hash aggregate on (a, b) — the only corpus-wide
    * shuffle, carrying one row per CELL, not per input row — then three
    * window sums over the cell relation, whose size is |A|·|B|
    * (categorical cardinalities, not data size). The `OVER ()` grand
    * total routes all cells through one task — bounded by the same
    * |A|·|B|, the documented contract (this is a contingency-table
    * operator, not a join).
    */
  /** Two-level Merkle-style content manifest — the integrity fingerprint
    * a 100 TB pipeline publishes with each dataset snapshot so a
    * consumer (or the next pipeline stage) can verify WHAT it read, and
    * localize a corruption to a bucket without rehashing the corpus:
    * level-0 rows carry one digest per id-bucket (the chained md5 of
    * that bucket's per-doc `md5(text)` leaves in id order), level 1 the
    * root (the chained md5 of bucket digests in bucket order). Two
    * snapshots differ ⇔ roots differ; WHERE they differ is the bucket
    * whose digest moved.
    *
    * The chained fold `acc ← md5(acc ∥ leaf)` is order-PINNED by an
    * explicit array_sort before a deterministic fold (the quality_logit
    * aggregate pattern), so the digest is identical under any
    * partitioning — and SQL-replayable, unlike a tree hash keyed on
    * physical file layout. Scale shape: one hash aggregate on the
    * bucket (per-bucket rows collect within their task; bucket count
    * bounds driver output), then a buckets-row root aggregate. Negative
    * ids are excluded (bucket arithmetic), NULL text rows excluded —
    * both mirrored by the oracle.
    *
    * SIZING RULE (the 100 TB contract): each bucket `collect_list`s its
    * leaves into ONE task, so per-task memory is
    * `~(n_docs / buckets) × 48 bytes` (a 32-hex digest + id per leaf) —
    * the bucket count must GROW with the corpus, it is not a constant.
    * Use [[manifestBuckets]] (buckets = next power of two ≥
    * n / docsPerBucket, default 1M docs ≈ 48 MB of leaf state per task)
    * or pass an explicit count; the fixture catalogs pin 64 at sf scale
    * for oracle stability. Any count yields the same
    * corruption-localization property — two snapshots are comparable
    * only at EQUAL bucket counts (the count is part of the manifest's
    * identity, like a hash algorithm choice).
    */
  /** Corpus-proportional bucket count for [[manifest]]: the next power
    * of two ≥ `nDocs / docsPerBucket` (≥ 1). Power-of-two counts keep
    * re-manifests at adjacent scales comparable in cost and make the
    * per-task leaf state bound explicit: `docsPerBucket × 48 bytes`.
    */
  def manifestBuckets(nDocs: Long, docsPerBucket: Long = 1000000L): Int = {
    require(nDocs >= 0 && docsPerBucket >= 1, "need nDocs >= 0, docsPerBucket >= 1")
    val needed = math.max(1L, (nDocs + docsPerBucket - 1L) / docsPerBucket)
    var b = 1
    while (b < needed && b < (1 << 30)) b <<= 1
    b
  }

  def manifest(docs: DataFrame, buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    val leaves = docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0 && col(textCol).isNotNull)
      .select((col(idCol).cast("long") % buckets).as("bucket"),
        col(idCol).cast("long").as("id"), md5(col(textCol)).as("h"))
    val level0 = leaves
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        expr("aggregate(array_sort(collect_list(struct(id, h))), '', (a, x) -> md5(concat(a, x.h)))")
          .as("digest"))
    val root = level0
      .agg(sum(col("n_docs")).as("n_docs"),
        expr("aggregate(array_sort(collect_list(struct(bucket, digest))), '', (a, x) -> md5(concat(a, x.digest)))")
          .as("digest"))
      .select(lit(1L).as("level"), lit(-1L).as("bucket"), col("n_docs"), col("digest"))
    level0
      .select(lit(0L).as("level"), col("bucket"), col("n_docs"), col("digest"))
      .unionByName(root)
  }

  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val counts = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("cnt"))
    // Marginals as aggregations over the OBSERVED pairs (zero cells add
    // nothing to a sum, so these equal the window-over-the-grid values),
    // and the grand total as a 1-row aggregate broadcast onto every cell.
    // Round 16: this replaces a `sum().over(Window.partitionBy())` global
    // window that moved the whole a×b grid to ONE partition — fine for
    // lang×source, a scale-killer for any high-cardinality caller.
    val na = counts.groupBy("a").agg(sum("cnt").as("na"))
    val nb = counts.groupBy("b").agg(sum("cnt").as("nb"))
    val n = counts.agg(sum("cnt").as("n"))
    // the FULL grid, zero cells included — an empty cell contributes its
    // whole expected count to the statistic; omitting it understates chi².
    // Built from the marginal relations themselves: |a| rows × a broadcast
    // of |b| rows carries the grid AND both marginals in one pass.
    val cells = na
      .crossJoin(broadcast(nb))
      .join(counts, Seq("a", "b"), "left")
      .withColumn("observed", coalesce(col("cnt"), lit(0L))).drop("cnt")
      .crossJoin(broadcast(n))
      .withColumn("expected",
        (col("na").cast("double") * col("nb").cast("double")) / col("n").cast("double"))
    cells.select(
      col("a").as(aCol), col("b").as(bCol),
      col("observed"), col("na"), col("nb"), col("n"), col("expected"),
      ((col("observed").cast("double") - col("expected")) *
        (col("observed").cast("double") - col("expected")) / col("expected"))
        .as("contribution"))
  }
}
