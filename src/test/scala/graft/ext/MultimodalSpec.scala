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

  test("resize stub produces exact WxH grids, zero-filled for empty payloads") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 100), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.resize(Multimodal.attachBinary(docs), targetW = 4, targetH = 3)
      .collect().sortBy(_.doc_id)
    assert(out.forall(r => r.pixels.length == 12 && r.width == 4 && r.height == 3))
    // "x" payload: every bucket averages to the byte value of 'x'
    assert(out(0).pixels.forall(p => math.abs(p - 'x'.toInt) < 1e-6))
    assert(out(1).pixels.forall(_ == 0f))
  }

  test("frame sampling fans one payload out to every-Nth fixed-size chunks") {
    import spark.implicits._
    val docs = Seq((7L, "abcdefghij" * 100)).toDF("doc_id", "text") // 1000 bytes
    val frames = Multimodal.sampleFrames(Multimodal.attachBinary(docs), frameBytes = 100, everyN = 3, maxFrames = 3)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 3, 6)) // 10 frames, every 3rd, capped
    assert(frames.map(_.offset).toSeq == Seq(0L, 300L, 600L))
    assert(frames.forall(_.frame.length == 100))
    assert(new String(frames(1).frame).startsWith("abcdefghij"))
  }

  test("pcm16 decode: little-endian sign fix-up, frame stats, odd tail ignored") {
    import spark.implicits._
    // samples (s16le): 1, -1, 32767, -32768, 0 — plus one odd trailing byte
    val bytes = Array[Byte](
      0x01, 0x00, // 1
      0xFF.toByte, 0xFF.toByte, // -1
      0xFF.toByte, 0x7F, // 32767
      0x00, 0x80.toByte, // -32768
      0x00, 0x00, // 0
      0x7F) // trailing odd byte -> ignored
    val df = Seq((1L, bytes)).toDF("doc_id", "payload")
    val out = Multimodal.decodePcm16Frames(df, frameSize = 2).collect().sortBy(_.frame_idx)
    assert(out.map(f => (f.frame_idx, f.n_samples, f.peak)).toSeq ==
      Seq((0, 2L, 1L), (1, 2L, 32768L), (2, 1L, 0L)))
    assert(math.abs(out(0).rms - math.sqrt((1.0 + 1.0) / 2)) < 1e-15)
    assert(out(1).rms == math.sqrt((32767.0 * 32767 + 32768.0 * 32768) / 2))
    assert(out(2).rms == 0.0)
  }

  test("pcm16 decode: empty, sub-sample, and null payloads yield no frames; null ids excluded") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(Array[Byte](0x42))), // 1 byte < 1 sample
      (Some(2L), Some(Array.emptyByteArray)),
      (Some(3L), None),
      (None, Some(Array[Byte](1, 0, 2, 0)))).toDF("doc_id", "payload")
    assert(Multimodal.decodePcm16Frames(df).collect().isEmpty)
  }

  test("pcm16 resample: every factor-th sample survives, byte-exact; guards hold") {
    import spark.implicits._
    // samples 1,2,3,4,5,6,7 (s16le) + odd trailing byte
    val bytes = (1 to 7).flatMap(v => Seq(v.toByte, 0.toByte)).toArray :+ 0x7F.toByte
    val df = Seq((1L, bytes)).toDF("doc_id", "payload")
    val out = Multimodal.resamplePcm16(df, factor = 3).collect().head
    assert(out.n_samples_in == 7 && out.n_samples_out == 3)
    // samples 1, 4, 7 re-encoded little-endian
    assert(out.resampled.toSeq == Seq[Byte](1, 0, 4, 0, 7, 0))
    val identity = Multimodal.resamplePcm16(df, factor = 1).collect().head
    assert(identity.resampled.toSeq == bytes.dropRight(1).toSeq)
    intercept[IllegalArgumentException](Multimodal.resamplePcm16(df, factor = 0))
    val empties = Multimodal.resamplePcm16(
      Seq((Some(2L), Some(Array.emptyByteArray)), (Some(3L), None), (None, Some(bytes)))
        .toDF("doc_id", "payload"), factor = 2).collect()
    assert(empties.map(r => (r.doc_id, r.n_samples_out, r.resampled.length)).toSet ==
      Set((2L, 0L, 0), (3L, 0L, 0)))
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
