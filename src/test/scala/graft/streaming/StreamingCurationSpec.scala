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

  test("TTL dedup: state evicts under watermark advance — late duplicates re-admit, live ones drop") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevProvider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Timestamp, String)]
      // lateness 1 min; dedup memory 5 min — INDEPENDENT bounds (the point
      // of the transformWithState form over dropDuplicatesWithinWatermark)
      val query = StreamingCuration.curateWithTtl(
        input.toDF().toDF("doc_id", "ts", "text"),
        watermarkDelay = "1 minute", ttl = java.time.Duration.ofMinutes(5), params)
        .writeStream.format("memory").queryName("cur_ttl").outputMode("append").start()
      try {
        val text = "the dog and the cat keep the house warm and happy"
        input.addData((1L, ts(1), text))
        query.processAllAvailable()
        // duplicate while the fingerprint is live (watermark ~0m, expiry ~5m)
        input.addData((2L, ts(2), text))
        query.processAllAvailable()
        // advance the watermark far past expiry (event 30m -> watermark 29m),
        // firing the eviction timer...
        input.addData((3L, ts(30), "der hund und die katze sind sehr gute freunde im haus"))
        query.processAllAvailable()
        // ...so the SAME content is re-admitted after eviction
        input.addData((4L, ts(31), text))
        query.processAllAvailable()
        val ids = spark.table("cur_ttl").collect().map(_.getLong(0)).toSet
        assert(ids == Set(1L, 3L, 4L),
          s"doc 2 dedups against live state, doc 4 re-admits after TTL eviction: $ids")
      } finally query.stop()
    } finally spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
  }

  test("TTL dedup: same-batch duplicates keep the (ts, doc_id)-minimal row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevProvider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Timestamp, String)]
      val query = StreamingCuration.curateWithTtl(
        input.toDF().toDF("doc_id", "ts", "text"),
        watermarkDelay = "1 minute", ttl = java.time.Duration.ofMinutes(5), params)
        .writeStream.format("memory").queryName("cur_ttl2").outputMode("append").start()
      try {
        val text = "the dog and the cat keep the house warm and happy"
        input.addData((9L, ts(2), text), (7L, ts(1), text), (8L, ts(1), text))
        query.processAllAvailable()
        val ids = spark.table("cur_ttl2").collect().map(_.getLong(0)).toSet
        assert(ids == Set(7L), s"deterministic keeper is min (ts, doc_id): $ids")
      } finally query.stop()
    } finally spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
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
