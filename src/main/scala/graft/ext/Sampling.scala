package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training-data
  * pipelines. A 100 TB corpus split must be (a) reproducible under any
  * partitioning, retries, and engine version, (b) stable as the corpus
  * grows (a document's split never changes when other rows are added), and
  * (c) auditable by an external engine. `rand()`-based splits are none of
  * these; hashing the stable id is all three.
  */
object Sampling {

  /** Assign each row a split label by the first 8 hex chars of
    * `md5(cast(id AS string))` compared against cumulative-fraction
    * thresholds. MD5-hex (not xxhash64) on purpose: every SQL engine
    * produces the identical lowercase hex digest, so the assignment is
    * portable and externally auditable — a fixed-length lowercase-hex
    * string compare IS the numeric compare.
    *
    * `splits` are (label, fraction) pairs; fractions must sum to 1. The
    * fractions are exact over the hash space (first 32 bits), so realized
    * proportions converge at O(1/sqrt(n)) like any hash split.
    */
  def deterministicSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    df.withColumn(splitCol, splitExpr(col(idCol), splits))
  }

  /** Boundary for a cumulative fraction, as 8 lowercase hex chars — or the
    * sentinel "g" (which sorts after every hex digit) once the fraction
    * covers the whole hash space. Two failure modes are excluded by
    * construction:
    *  - formatting floor(1.0 * 2^32) directly would yield 9 chars
    *    ("100000000") and the fixed-length string compare — the invariant
    *    the whole scheme rests on — would silently misroute 15/16 of rows;
    *  - clamping to "ffffffff" (the previous fix) made `hexKey < boundary`
    *    FALSE for keys that hash to exactly ffffffff — a fraction-1.0
    *    stratum silently dropped 1-in-2^32 rows instead of keeping all.
    */
  private def boundaryHex(cum: Double): String = {
    val scaled = math.floor(cum * 4294967296.0).toLong
    if (scaled >= 4294967296L) "g" else f"$scaled%08x"
  }

  /** The assignment expression alone (for composing into larger selects). */
  def splitExpr(id: Column, splits: Seq[(String, Double)]): Column = {
    val hexKey = substring(md5(id.cast("string")), 1, 8)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.init.zip(cums.init.map(boundaryHex)).foldRight(lit(splits.last._1): Column) {
      case (((name, _), bHex), rest) => when(hexKey < lit(bHex), name).otherwise(rest)
    }
  }

  /** Deterministic stratified Bernoulli sample: keep a row iff the first 8
    * hex chars of `md5('v' || stratum || ':' || id)` (marker `n` in place
    * of `'v' || stratum` when the stratum is null) fall below the stratum's
    * fraction boundary. Hashing the (stratum, id) PAIR — not the id alone —
    * decorrelates the strata: the same id can be kept in one stratum and
    * dropped in another, so per-stratum fractions are independent Bernoulli
    * draws, while staying fully reproducible and external-engine-auditable
    * (same argument as [[deterministicSplit]]). Rows whose stratum is not in
    * `fractions` are sampled at `defaultFraction`; a NULL stratum is one
    * such stratum, hashed under an INJECTIVE encoding (non-null strata are
    * prefixed `v`, the null stratum is the marker `n`) so its rows still
    * get independent per-id draws AND no real stratum string can alias the
    * null sentinel — a NUL-byte sentinel would make a literal U+0000
    * stratum share every draw with the null stratum. Rows with a NULL id
    * are always EXCLUDED:
    * with no stable identity there is nothing deterministic to hash, and
    * hashing a sentinel instead would make every null-id row of a stratum
    * share one draw — all kept or all dropped together, which is not a
    * Bernoulli sample.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val hexKey = substring(
      md5(concat(coalesce(concat(lit("v"), col(strataCol).cast("string")), lit("n")),
        lit(":"), col(idCol).cast("string"))), 1, 8)
    val boundary = fractions.toSeq.sortBy(_._1).foldRight(lit(boundaryHex(defaultFraction))) {
      case ((stratum, f), rest) =>
        when(col(strataCol) === stratum, lit(boundaryHex(f))).otherwise(rest)
    }
    df.filter(hexKey < boundary)
  }

  /** Deterministic weight-proportional Bernoulli sample: keep a row with
    * probability `weight / max(weight)` (the heaviest row is always kept),
    * decided by exact integer math so an external engine replays the exact
    * kept set, not just its size:
    *
    *   keep  <=>  u32 * max_w < w * 2^32
    *
    * with `u32` = first 8 hex chars of `md5(cast(id AS string))` as a
    * uint32. No division, no floats, no transcendentals — the comparison is
    * exact in both engines (decimal(38) here, hugeint in DuckDB), so the
    * cross-engine boundary-rounding hazard that plagues float thresholds
    * cannot occur by construction.
    *
    * The max-weight scalar travels as a broadcast single-row relation (one
    * extra reduce, no driver collect). Null or non-positive weights never
    * survive (`null > anything` is never-true). The weight column must be
    * integral; at 100 TB the scan + filter is one pass, and the broadcast
    * is 16 bytes.
    */
  def weightedBernoulli(
      df: DataFrame,
      idCol: String,
      weightCol: String): DataFrame = {
    val u32 = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("decimal(38,0)")
    val mw = df.select(max(col(weightCol).cast("long")).as("__max_w"))
    df.crossJoin(broadcast(mw))
      .filter(u32 * col("__max_w").cast("decimal(38,0)") <
        col(weightCol).cast("decimal(38,0)") * lit(4294967296L).cast("decimal(38,0)"))
      .drop("__max_w")
  }

  /** Deterministic per-stratum cap ("domain balancing"): keep at most `k`
    * rows of each stratum — the standard guard against one hot domain
    * dominating a training mix. The kept rows are the `k` smallest draws
    * `u32 = first 32 bits of md5('v' || stratum || ':' || id)` (marker `n`
    * for a null stratum — the same injective encoding as
    * [[stratifiedSample]], so no real stratum string can alias the
    * sentinel), ties broken by id ascending: a uniform, reproducible
    * k-subset of every stratum, stable under partitioning and retries, and
    * replayable by an external engine as a rank window over the same hash.
    *
    * Scale shape: selection runs through
    * [[graft.plans.ScaleOps.groupedTopK]]'s bounded aggregator (score =
    * the NEGATED draw, exact in a double since u32 < 2^32 < 2^53), so each
    * map task reduces its partition to at most k entries per stratum and
    * the shuffle carries O(k) rows per (stratum, partition) — not a rank
    * window's full sort of the corpus. The kept (stratum, id) set —
    * k rows per stratum, i.e. the answer — then joins back to restore full
    * rows. Null-id rows are always excluded (no stable identity to hash);
    * ids must be castable to long and unique within their stratum, or the
    * join fans out and the cap is per unique id, not per row.
    */
  def stratumCapK(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val draw = conv(substring(md5(concat(
      coalesce(concat(lit("v"), col(strataCol).cast("string")), lit("n")),
      lit(":"), col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val kept = graft.plans.ScaleOps.groupedTopK(
      df.filter(col(idCol).isNotNull)
        .select(col(strataCol).as("__stratum"), col(idCol).as("__cap_id"), (-draw).cast("double").as("__neg")),
      "__stratum", "__cap_id", "__neg", k)
      .select(col("__stratum"), col("__cap_id"))
    df.join(kept,
      col(strataCol) <=> col("__stratum") && col(idCol) === col("__cap_id"),
      "left_semi")
  }

  /** Source-mixture sampling to per-source token budgets — the "data
    * mixing" step that reweights a multi-source corpus (web / code / books
    * / reference) toward a target composition before training. Each listed
    * source `s` with token total `T_s` and budget `B_s` is thinned by an
    * independent per-row Bernoulli draw at rate `min(1, B_s / T_s)`, so
    * the expected surviving token mass per source is `min(T_s, B_s)`;
    * sources not in `budgets` are dropped (a mixture spec is exhaustive by
    * design — pass `Long.MaxValue` to keep a source whole).
    *
    * Draw determinism follows [[weightedBernoulli]]: keep a row iff
    *
    *   B_s >= T_s  OR  u32 * T_s < B_s * 2^32
    *
    * with `u32` = first 32 bits of `md5('v' || source || ':' || id)` (the
    * [[stratifiedSample]] pair hash, so draws are decorrelated across
    * sources), all in exact decimal(38,0) integer math — an external
    * engine replays the exact kept set via the identical hugeint compare,
    * no float-boundary hazard. Null-id rows are dropped (nothing stable to
    * hash); null weights contribute 0 to `T_s` but their rows still draw.
    *
    * One aggregation over sources (a map-side-combined sum into one row
    * per source) broadcast back, then a map-only filter: at 100 TB the
    * cost is one corpus pass + one scan, no data-sized shuffle.
    */
  def mixtureSample(
      df: DataFrame,
      budgets: Map[String, Long],
      sourceCol: String,
      idCol: String,
      weightCol: String): DataFrame = {
    require(budgets.nonEmpty, "need at least one source budget")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val budget = budgets.toSeq.sortBy(_._1).foldRight(lit(null).cast("long"): Column) {
      case ((src, b), rest) => when(col(sourceCol) === src, b).otherwise(rest)
    }
    // coalesce BEFORE the sum: an all-null-weight source must total 0 (its
    // rows still draw, and budget >= 0 keeps them all), not a NULL total
    // that nulls the filter and silently drops the whole source
    val totals = df.groupBy(col(sourceCol).as("__mix_src"))
      .agg(sum(coalesce(col(weightCol).cast("long"), lit(0L))).as("__T"))
    val u32 = conv(substring(md5(concat(
      concat(lit("v"), col(sourceCol).cast("string")),
      lit(":"), col(idCol).cast("string"))), 1, 8), 16, 10).cast("decimal(38,0)")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    df.filter(col(idCol).isNotNull)
      .join(broadcast(totals), col(sourceCol) === col("__mix_src"))
      .withColumn("__B", budget)
      .filter(col("__B").isNotNull &&
        (col("__B") >= col("__T") || u32 * dec(col("__T")) < dec(col("__B")) * dec(lit(4294967296L))))
      .drop("__mix_src", "__T", "__B")
  }

  /** Exact per-stratum quantile bucketing (curriculum assignment): rank
    * every row within its stratum by `(valueCol, idCol)` — both ascending,
    * NULLS FIRST pinned explicitly because engines disagree on the default
    * — and deal the stratum into `k` equal buckets (`ntile`: earlier
    * buckets take the remainder row). The standard curriculum/difficulty
    * split: bucket 1 = shortest/easiest quartile per language, etc.
    *
    * Output: the input columns + `bucket` (1..k). The id tiebreak makes
    * the assignment a pure function of the data — reproducible under any
    * partitioning and externally replayable.
    *
    * Scale honesty: `ntile` sorts each stratum inside one task, so the
    * hottest stratum bounds this form (fine up to tens of millions of
    * rows per stratum; the correctness-gate regime). At 100 TB derive
    * boundaries once (exact via this form on a sample, or
    * `approx_percentile` in one pass) and assign with the map-only
    * [[boundaryBuckets]] instead.
    */
  def quantileBuckets(
      df: DataFrame,
      k: Int,
      valueCol: String,
      idCol: String,
      strataCol: String): DataFrame = {
    require(k >= 1, "need k >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col(valueCol).asc_nulls_first, col(idCol).asc_nulls_first)
    df.withColumn("bucket", ntile(k).over(w))
  }

  /** Map-only bucket assignment against precomputed ascending boundaries:
    * bucket i (1-based) is the first with `value <= boundaries(i-1)`, else
    * `boundaries.length + 1`. NULL values land in bucket 1 (the NULLS
    * FIRST convention of [[quantileBuckets]]). The 100 TB path: boundaries
    * are a handful of doubles, the assignment is one codegen'd CASE chain,
    * no shuffle at all.
    */
  def boundaryBuckets(
      df: DataFrame,
      valueCol: String,
      boundaries: Seq[Double]): DataFrame = {
    require(boundaries.nonEmpty, "need at least one boundary")
    require(boundaries == boundaries.sorted, "boundaries must be ascending")
    val bucket = boundaries.zipWithIndex.foldRight(lit(boundaries.length + 1): Column) {
      case ((b, i), rest) => when(col(valueCol) <= b, i + 1).otherwise(rest)
    }
    df.withColumn("bucket", when(col(valueCol).isNull, 1).otherwise(bucket))
  }

  /** Deterministic negative sampling for contrastive training pairs: for
    * every anchor row, `k` pseudo-random OTHER-label items drawn from a
    * small shared candidate pool — the (anchor, negative) pairs a
    * triplet/InfoNCE loss consumes. Randomness is md5 throughout (the
    * [[deterministicSplit]] convention): the POOL is the `poolSize`
    * items with the lexicographically smallest `md5(id)` (a fixed
    * pseudo-random subset, identical on every run/engine), and each
    * anchor's negatives are the `k` pool items with the smallest
    * `md5(anchor_id || '_' || cand_id)` — a per-anchor permutation, so
    * anchors don't all pick the same negatives. Same-label and self
    * candidates are excluded; anchors with fewer than `k` cross-label
    * pool items get what exists.
    *
    * 100 TB shape: the pool is a bounded global top-`poolSize`
    * (TakeOrdered, no full sort) collected once (≤ poolSize rows on the
    * driver — the bounded-collect convention), inlined as an array
    * literal; the per-anchor select is then MAP-ONLY — filter,
    * transform, sort_array (poolSize elements), slice, posexplode — no
    * join, no window, no shuffle anywhere. Output rows: anchors × k.
    *
    * Output: `(anchor_id, neg_id, rnk)` with `rnk` 1-based in hash
    * order.
    */
  def negativeSamples(
      items: DataFrame,
      k: Int = 5,
      poolSize: Int = 64,
      idCol: String = "vec_id",
      labelCol: String = "label"): DataFrame = {
    require(k >= 1 && poolSize >= 1, "k and poolSize must be positive")
    val clean = items
      .filter(col(idCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(labelCol).cast("long").as("lbl"))
    val pool = clean
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    if (pool.isEmpty)
      return clean.select(col("id").as("anchor_id"), lit(0L).as("neg_id"),
        lit(0L).as("rnk")).limit(0)
    val poolArr = array(pool.map { case (i, l) =>
      struct(lit(i).as("pid"), lit(l).as("plbl"))
    }.toIndexedSeq: _*)
    clean
      .select(col("id").as("anchor_id"),
        slice(
          sort_array(transform(
            filter(poolArr, p => p.getField("plbl") =!= col("lbl") && p.getField("pid") =!= col("id")),
            p => struct(
              md5(concat(col("id").cast("string"), lit("_"), p.getField("pid").cast("string"))).as("m"),
              p.getField("pid").as("cid")))),
          1, k).as("top"))
      .select(col("anchor_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("anchor_id"), col("s.cid").as("neg_id"), (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Reference implementation for tests (and for consumers outside Spark). */
  def splitOf(id: String, splits: Seq[(String, Double)]): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8")).map(b => f"$b%02x").mkString.substring(0, 8)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.init.zip(cums.init).collectFirst {
      case ((name, _), c) if hex < boundaryHex(c) => name
    }.getOrElse(splits.last._1)
  }
}
