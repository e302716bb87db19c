package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ext.CurationPipeline

class StreamingCurationSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val params = CurationPipeline.Params(minChars = 20, minDistinctRatio = 0.3)

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("streaming curation: dedups across batches, gates quality, tags language") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = StreamingCuration.curate(
      input.toDF().toDF("doc_id", "ts", "text"), watermarkDelay = "10 minutes", params)
      .writeStream.format("memory").queryName("cur_out").outputMode("append").start()
    try {
      input.addData(
        (1L, ts(1), "the dog and the cat keep the house warm and happy"),
        (2L, ts(1), "short"), // < minChars -> gated
        (3L, ts(2), "aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa")) // low distinct ratio -> gated
      query.processAllAvailable()
      input.addData(
        // duplicate of doc 1 (same normalized content) in a later batch
        (4L, ts(3), "The  DOG and the cat keep the house warm and happy"),
        (5L, ts(3), "der hund und die katze sind sehr gute freunde und das haus ist warm"))
      query.processAllAvailable()
      val rows = spark.table("cur_out").collect()
        .map(r => r.getLong(0) -> r.getString(5)).toMap
      assert(rows.keySet == Set(1L, 5L), s"survivors: $rows")
      assert(rows(1L) == "en" && rows(5L) == "de")
    } finally query.stop()
  }

  test("same-micro-batch duplicates collapse to one survivor") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = StreamingCuration.curate(
      input.toDF().toDF("doc_id", "ts", "text"), watermarkDelay = "10 minutes", params)
      .writeStream.format("memory").queryName("cur_out2").outputMode("append").start()
    try {
      input.addData(
        (1L, ts(1), "the dog and the cat keep the house warm and happy"),
        (2L, ts(1), "the dog and the cat keep the house warm and happy"))
      query.processAllAvailable()
      val ids = spark.table("cur_out2").collect().map(_.getLong(0)).toSet
      assert(ids.size == 1 && (ids == Set(1L) || ids == Set(2L)), s"survivors: $ids")
    } finally query.stop()
  }
}
