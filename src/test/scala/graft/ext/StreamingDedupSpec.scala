package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streaming exact dedup over a MemoryStream: duplicates (by normalized
  * content) are dropped across micro-batches while the watermark bounds the
  * dedup state.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("dropDuplicatesWithinWatermark on the content fingerprint") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = Dedup.streamingExact(docs, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      def ts(m: Int) = new Timestamp(m * 60000L)
      input.addData((1L, ts(1), "Hello   World"), (2L, ts(2), "fresh content"))
      query.processAllAvailable()
      // same normalized content in a later batch within the watermark -> dropped
      input.addData((3L, ts(3), "hello world"), (4L, ts(4), "another doc"))
      query.processAllAvailable()
      val kept = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq == Seq(1L, 2L, 4L), s"doc 3 duplicates doc 1: ${kept.toSeq}")
    } finally query.stop()
  }
}
