package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("binary attach + partition-batched decode: schema, sizes, determinism") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.decodeFeatures(Multimodal.attachBinary(docs))
      .collect().sortBy(_.doc_id)
    assert(out.length == 2)
    val h = out(0)
    assert(h.n_bytes == 11)
    assert(h.width == 11 % 640 + 1 && h.height == 11 % 480 + 1)
    assert(h.features.length == 8)
    val empty = out(1)
    assert(empty.n_bytes == 0 && empty.features.forall(_ == 0f))
    // deterministic across runs/partitionings
    val again = Multimodal.decodeFeatures(Multimodal.attachBinary(docs.repartition(7)))
      .collect().sortBy(_.doc_id)
    assert(again.map(_.features.toSeq).toSeq == out.map(_.features.toSeq).toSeq)
  }

  test("metadata struct carries byte length and header hex") {
    val withBin = Multimodal.attachBinary(
      SparkSpec.spark.createDataFrame(Seq((5L, "ABCDEFGHIJ"))).toDF("doc_id", "text"))
    val meta = withBin.select("meta.n_bytes", "meta.header_hex", "meta.mime").collect().head
    assert(meta.getLong(0) == 10)
    assert(meta.getString(1) == "4142434445464748") // first 8 bytes hex
    assert(meta.getString(2) == "application/octet-stream")
  }
}
