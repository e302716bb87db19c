package graft

import org.apache.spark.sql.types.{ArrayType, MapType}
import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness harness row-sorts every registered query's
  * output with pandas before hashing. Pandas cannot order array/map cells
  * (`TypeError: unhashable type: 'numpy.ndarray'` in `sort_values`), so an
  * array-typed output column nulls even the rows-only `spark_rows` signal —
  * the round-6 `pq_codes` defect. This spec closes that trap for every
  * current AND future key: each registered query's top-level schema must be
  * harness-sortable (scalars only). Library operators may still return
  * arrays (productQuantize does); the registered projection must fold them
  * (positional pack / size / checksum — the `quantize_stats` q_sum pattern).
  */
class HarnessContractSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  test("every registered query emits only harness-sortable (scalar) columns") {
    val offenders = QueryCatalog.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      q(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"array/map output columns crash the driver's pandas row-sort; " +
        s"fold them into scalars in the QueryCatalog projection:\n${offenders.mkString("\n")}")
  }

  test("every oracle key has a registered query") {
    val orphans = QueryCatalog.oracleSql.keySet -- QueryCatalog.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys with no query: $orphans")
  }
}
