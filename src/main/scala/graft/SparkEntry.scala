package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual catalog lives in [[QueryCatalog]]; every entry reads
  * `/root/testdata/<sf>` parquet and (where SQL-expressible) has a DuckDB
  * oracle producing the identical columns/types/values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's core 5-minute keyed window aggregate (O4/O5) over the
    * events table.
    */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.queries("window_agg_5min")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + north-star ext. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (pipeline_replay, datagen_batch, simhash_pairs, ivf_topk) -> rows-only.
    */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
