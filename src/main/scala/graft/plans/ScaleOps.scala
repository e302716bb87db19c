package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout tools for the 100 TB regime: bucketed co-located joins
  * (amortize the shuffle of a repeatedly-joined fact table into its storage
  * layout) and salted joins (split a hot key across reducers when AQE's
  * skew-join splitting isn't available or the skew is in an aggregation
  * input).
  */
object ScaleOps {

  /** Persist `df` bucketed and sorted by `key`: subsequent equi-joins or
    * aggregations on `key` between tables bucketed with the SAME bucket
    * count read co-located data and skip the exchange entirely (verified by
    * plan in `ScaleOpsSpec`). This is the storage-layout answer to "this
    * fact table is joined on this key by every query" — shuffle once at
    * write time, never again at read time.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Inner equi-join resilient to left-side key skew: every left row gets a
    * deterministic pseudo-random salt in [0, salts), the right side is
    * replicated `salts` times, and the join runs on (key, salt) — a hot key's
    * rows land on `salts` reducers instead of one. Cost: right side scans
    * `salts`x (use for dimension-sized right sides that are still too big or
    * too skew-prone to broadcast).
    *
    * The salt derives from xxhash64 of the whole left row, so results are
    * deterministic under any partitioning (no rand()).
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1)
    val leftCols = left.columns.map(col).toSeq
    val saltedL = left.withColumn("__salt", pmod(xxhash64(struct(leftCols: _*)), lit(salts)).cast("int"))
    val saltedR = right.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedL.join(saltedR, Seq(key, "__salt")).drop("__salt")
  }

  /** Grouped top-k without a rank window: the window form (`row_number()
    * OVER (PARTITION BY g ORDER BY s DESC)` then `rank <= k`) shuffles and
    * sorts EVERY row; this form aggregates through the bounded
    * [[graft.functions.TopKAggregator]], so each map task reduces its
    * partition to at most k entries per group and the shuffle carries O(k)
    * rows per (group, partition) — the answer, not the input. Ordering is
    * (score desc, id asc), the window form's total order, so the two paths
    * agree row-for-row.
    *
    * Output: groupCol, rnk (1-based), idCol, scoreCol.
    */
  def groupedTopK(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String,
      k: Int): DataFrame = {
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKAggregator(k),
      org.apache.spark.sql.Encoders.product[graft.functions.ScoredId])
    // null ids/scores are DROPPED up front: the bounded buffer has no null
    // slot (a null would crash the primitive encoder), whereas the window
    // twin ranks nulls last — callers needing null rows must rank them
    // separately. Ids must be castable to long, scores to double.
    df.select(col(groupCol), col(idCol).cast("long").as("__id"), col(scoreCol).cast("double").as("__s"))
      .filter(col("__id").isNotNull && col("__s").isNotNull)
      .groupBy(groupCol)
      .agg(topk(col("__id"), col("__s")).as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(
        col(groupCol),
        (col("__pos") + 1).cast("long").as("rnk"),
        col("__e.id").as(idCol),
        col("__e.score").as(scoreCol))
  }

  /** Morton (Z-order) code: interleave the low `bitsPerDim` bits of two
    * non-negative dimension columns — bit b of x lands at position 2b, bit
    * b of y at 2b+1. Sorting or range-partitioning by the code clusters
    * rows that are close in BOTH dimensions into the same files/row groups,
    * so a scan filtered on either (or both) dimensions prunes by min/max
    * statistics — the standard multi-dimensional-locality layout for a
    * fact table queried on two independent range axes, where sorting by
    * either column alone scatters the other.
    *
    * Pure integer bit arithmetic on built-in expressions (codegen'd,
    * engine-portable, oracle-checkable). `bitsPerDim` <= 31; values must
    * fit in that many bits for the interleave to be injective (bits above
    * are dropped — callers bucket or clamp first).
    */
  def mortonCode(x: Column, y: Column, bitsPerDim: Int = 20): Column = {
    require(bitsPerDim >= 1 && bitsPerDim <= 31, "bitsPerDim must be in [1, 31]")
    (0 until bitsPerDim).map { b =>
      val xb = shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b)
      val yb = shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
      xb + yb
    }.reduce(_ + _)
  }

  /** Rewrite `df` Z-ordered on (xCol, yCol): range-partition then sort
    * within partitions by the Morton code, so downstream parquet row
    * groups carry tight min/max bounds on BOTH columns.
    */
  def zorderBy(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bitsPerDim: Int = 20,
      numPartitions: Option[Int] = None): DataFrame = {
    val code = mortonCode(col(xCol).cast("long"), col(yCol).cast("long"), bitsPerDim)
    val withZ = df.withColumn("__z", code)
    // explicit partition count bypasses AQE coalescing when the caller is
    // sizing output FILES (the point of the layout), not shuffle tasks
    numPartitions.fold(withZ.repartitionByRange(col("__z")))(
        n => withZ.repartitionByRange(n, col("__z")))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Rendezvous (highest-random-weight) shard assignment for key `idCol`
    * under `n` shards: shard = argmax over s of md5(id || '#' || s)
    * (hex-string order — identical ASCII comparison in every engine;
    * first-position ties, unreachable short of an md5 collision).
    *
    * This is how a 100 TB corpus re-shards ELASTICALLY: unlike
    * `hash(id) % n`, growing to n+1 shards moves ONLY the keys whose new
    * (n+1)-th weight wins — every moved key lands on the NEW shard and
    * the expected moved fraction is exactly 1/(n+1), versus ~100% churn
    * for modulo (Thaler & Ravishankar, "Using Name-Based Mappings to
    * Increase Hit Rates", ToN 1998). Pure codegen'd expressions — one
    * md5 array + argmax per row, no shuffle, no state.
    *
    * Output: one row per key — (id, shard, shard_next, moved).
    */
  def rendezvousShards(rel: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n >= 1, "need at least one shard")
    def weights(k: Int): Column = array((0 until k).map(s =>
      md5(concat(col("id").cast("string"), lit(s"#$s")))): _*)
    def argmax(arr: Column): Column = (array_position(arr, array_max(arr)) - 1).cast("long")
    rel
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"))
      .distinct()
      .withColumn("shard", argmax(weights(n)))
      .withColumn("shard_next", argmax(weights(n + 1)))
      .withColumn("moved", col("shard") =!= col("shard_next"))
  }
}
