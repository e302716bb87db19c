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
}
