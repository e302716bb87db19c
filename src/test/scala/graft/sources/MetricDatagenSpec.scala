package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Datagen value-model checks vs /root/reference/src/datagen.py:25-76 and
  * flinkarima.py:79-99: bounds, rounding, determinism under repartitioning
  * (the property Spark's rand() lacks and a 100 TB backfill needs).
  */
class MetricDatagenSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("values clamped to [0, 100] and rounded to 2 decimals (datagen.py:74-76)") {
    val rows = MetricDatagen.batch(spark, numNodes = 3, samplesPerNode = 500).collect()
    assert(rows.length == 1500)
    rows.foreach { m =>
      assert(m.cpu >= 0.0 && m.cpu <= 100.0, s"$m")
      assert(math.abs(m.cpu * 100 - math.round(m.cpu * 100)) < 1e-6, s"not 2-decimal: $m")
    }
  }

  test("node ids follow the reference naming (node-01..)") {
    val ids = MetricDatagen.batch(spark, numNodes = 3, samplesPerNode = 2).collect().map(_.nodeId).distinct.sorted
    assert(ids.toSeq == Seq("node-01", "node-02", "node-03"))
  }

  test("deterministic under any partitioning") {
    val a = MetricDatagen.batch(spark, 4, 250).collect().sortBy(m => (m.nodeId, m.eventTime))
    val b = MetricDatagen.batch(spark, 4, 250).repartition(13).collect().sortBy(m => (m.nodeId, m.eventTime))
    assert(a.toSeq == b.toSeq)
  }

  test("hour-of-day factor shapes the day (9-17h busiest, 0-6h quietest)") {
    val rows = MetricDatagen.batch(spark, 1, 24 * 3600 / 2, intervalMs = 2000L).collect()
    def avgIn(fromH: Int, toH: Int): Double = {
      val xs = rows.filter { m =>
        val h = ((m.eventTime / 3600000L) % 24).toInt
        h >= fromH && h < toH
      }
      xs.map(_.cpu).sum / xs.length
    }
    assert(avgIn(9, 17) > avgIn(0, 6), "business hours must exceed night load")
  }
}
