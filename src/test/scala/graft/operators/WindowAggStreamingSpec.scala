package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.Metric

/** Streaming semantics of the sliding and session window builders (the
  * tumbling variant's streaming test lives in WindowAggSpec): watermarked
  * Append emission, overlap multiplicity for hopping windows, gap-merge and
  * strict-gap split for sessions.
  */
class WindowAggStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("streaming sliding windows: each event lands in width/hop windows, emitted on close") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Metric]
    // width 2s, hop 1s: event at t=1500 belongs to windows [0,2s) and [1s,3s)
    val query = WindowAgg
      .sliding(input.toDS(), windowMillis = 2000L, slideMillis = 1000L, watermark = Some("0 seconds"))
      .writeStream.format("memory").queryName("slide_out").outputMode("append").start()
    try {
      input.addData(Seq(Metric("a", 10.0, 1500L)))
      query.processAllAvailable()
      assert(spark.table("slide_out").count() == 0, "open windows must not emit under Append")

      // watermark to 5s closes both windows of the first event
      input.addData(Seq(Metric("a", 40.0, 5000L)))
      query.processAllAvailable()
      val rows = spark.table("slide_out")
        .select("nodeId", "windowStart", "cpu", "n")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sortBy(_._2)
      assert(rows.toSeq == Seq(("a", 0L, 10.0, 1L), ("a", 1000L, 10.0, 1L)))
    } finally query.stop()
  }

  test("streaming session windows: gap-merge within a session, split at the gap, emit on close") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Metric]
    val query = WindowAgg
      .sessions(input.toDS(), gapMillis = 1000L, watermark = Some("0 seconds"))
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // two events 500ms apart merge (gap 1s); session = [1000, 1500+1000)
      input.addData(Seq(Metric("a", 1.0, 1000L), Metric("a", 2.0, 1500L)))
      query.processAllAvailable()
      assert(spark.table("sess_out").count() == 0, "open session must not emit under Append")

      // an event 10s later starts a NEW session and closes the first
      input.addData(Seq(Metric("a", 3.0, 12000L)))
      query.processAllAvailable()
      val first = spark.table("sess_out")
        .select("nodeId", "sessionStart", "sessionEnd", "n", "lastTs")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(first.toSeq == Seq(("a", 1000L, 2500L, 2L, 1500L)))

      // close the second session too: 1 event, [12000, 13000)
      input.addData(Seq(Metric("a", 4.0, 30000L)))
      query.processAllAvailable()
      val all = spark.table("sess_out")
        .select("sessionStart", "sessionEnd", "n")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(all.toSeq == Seq((1000L, 2500L, 2L), (12000L, 13000L, 1L)))
    } finally query.stop()
  }
}
