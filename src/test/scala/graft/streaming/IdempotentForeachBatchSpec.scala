package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The exactly-once contract of [[IdempotentForeachBatch]]: a re-delivered
  * (batchId, data) — Structured Streaming's at-least-once failure mode for
  * foreachBatch — must be a no-op, while distinct batch ids all commit.
  */
class IdempotentForeachBatchSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("re-delivery of a committed batch id is a no-op; a failed body retries") {
    import spark.implicits._
    val ledger = Files.createTempDirectory("graft-ledger-").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var failFirst = true
    val body: (org.apache.spark.sql.DataFrame, Long) => Unit = { (df, id) =>
      if (failFirst && id == 7L) { failFirst = false; sys.error("transient sink failure") }
      seen += ((id, df.count()))
    }
    val sink = IdempotentForeachBatch.once(ledger)(body)
    val df = Seq(1L, 2L, 3L).toDF("v")

    // batch 7 fails once (no marker written), then retries successfully
    intercept[RuntimeException](sink(df, 7L))
    sink(df, 7L)
    // re-delivery after success: ledger short-circuits
    sink(df, 7L)
    sink(df, 7L)
    // a new batch id commits independently
    sink(df, 8L)
    assert(seen.toList == List((7L, 3L), (8L, 3L)),
      s"each batch id must execute exactly once after success: $seen")
  }

  test("end-to-end: stream through the ledgered sink lands each row exactly once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ledger = Files.createTempDirectory("graft-ledger-e2e-").toString
    val outDir = Files.createTempDirectory("graft-sink-out-").toString
    val input = MemoryStream[Long]
    // idempotent-per-batch body (overwrite by batch id) + ledger on top
    val query = input.toDF().writeStream
      .foreachBatch(IdempotentForeachBatch.once(ledger) { (df, id) =>
        df.write.mode("overwrite").parquet(s"$outDir/batch=$id")
      })
      .start()
    try {
      input.addData(1L, 2L, 3L)
      query.processAllAvailable()
      input.addData(4L, 5L)
      query.processAllAvailable()
      val got = spark.read.parquet(outDir).select("value")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L, 3L, 4L, 5L))
    } finally query.stop()
  }
}
