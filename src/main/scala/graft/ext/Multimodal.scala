package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star, SURVEY §7.6): image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct; decoding
  * and feature extraction run batch-wise per partition.
  *
  * The actual codec step is a STUB (this container ships no image/audio
  * libraries): [[DecodedFeatures]] are a deterministic function of the bytes,
  * clearly marked below. Everything Spark-side — schema, binary columns,
  * partition-batched iteration, output shape — is real and tested; swapping
  * the stub for a JNI/ONNX decoder changes only `decodeStub`.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct to a text-bearing table
    * (bytes = UTF-8 of the text here; in production the binary comes from the
    * source parquet/blob store directly).
    */
  def attachBinary(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      col(textCol).cast("binary").as("payload"),
      struct(
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        hex(substring(col(textCol), 1, 8).cast("binary")).as("header_hex"),
        lit("application/octet-stream").as("mime")).as("meta"))

  final case class DecodedFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Int, // stub: derived, stands in for decoded image width
      height: Int, // stub: derived, stands in for decoded image height
      features: Array[Float]) // stub: 8-dim byte-statistics "embedding"

  /** ======== STUB decode ========
    * Deterministic fake decoder: byte statistics instead of pixel decoding.
    * Real implementation would hand `bytes` to an image/audio codec here.
    */
  private def decodeStub(id: Long, bytes: Array[Byte]): DecodedFeatures = {
    val n = bytes.length
    val dim = 8
    val sums = new Array[Long](dim)
    var i = 0
    while (i < n) { sums(i % dim) += bytes(i) & 0xff; i += 1 }
    val feats = sums.map(s => if (n == 0) 0f else (s.toDouble / n).toFloat)
    DecodedFeatures(id, n.toLong, width = (n % 640) + 1, height = (n % 480) + 1, feats)
  }

  /** Partition-batched decode + feature extraction: the Scala analog of a
    * `mapInPandas` batch UDF — one decoder instance per partition, iterator
    * in / iterator out, constant memory.
    */
  def decodeFeatures(withBinary: DataFrame, idCol: String = "doc_id", binCol: String = "payload"): Dataset[DecodedFeatures] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (expensive init amortized)
        it.map { case (id, bytes) => decodeStub(id, Option(bytes).getOrElse(Array.empty)) }
      }
  }

  final case class ResizedImage(doc_id: Long, width: Int, height: Int, pixels: Array[Float])

  /** ======== STUB resize ========
    * "Resize" the decoded payload to a target WxH grid by averaging byte
    * buckets (stands in for bilinear resampling of decoded pixels — a real
    * codec would resize the pixel matrix here). The Spark plumbing is the
    * real part: partition-batched, constant memory, typed output rows of
    * exactly width*height values.
    */
  def resize(
      withBinary: DataFrame,
      targetW: Int,
      targetH: Int,
      idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[ResizedImage] = {
    require(targetW >= 1 && targetH >= 1)
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytesOrNull) =>
          val bytes = Option(bytesOrNull).getOrElse(Array.empty[Byte])
          val cells = targetW * targetH
          val sums = new Array[Long](cells)
          val counts = new Array[Long](cells)
          var i = 0
          while (i < bytes.length) {
            val cell = (i.toLong * cells / math.max(1, bytes.length)).toInt
            sums(cell) += bytes(i) & 0xff
            counts(cell) += 1
            i += 1
          }
          val px = Array.tabulate(cells)(c => if (counts(c) == 0) 0f else (sums(c).toDouble / counts(c)).toFloat)
          ResizedImage(id, targetW, targetH, px)
        }
      }
  }

  final case class SampledFrame(doc_id: Long, frame_idx: Int, offset: Long, frame: Array[Byte])

  /** ======== STUB frame sampling ========
    * Treat the payload as a "video": fixed-size chunks are frames; emit
    * every `everyN`-th frame up to `maxFrames` (a real implementation would
    * seek keyframes via the container index). One input row fans out to
    * multiple typed frame rows — the flatMap shape a real frame sampler
    * needs.
    */
  def sampleFrames(
      withBinary: DataFrame,
      frameBytes: Int = 1024,
      everyN: Int = 2,
      maxFrames: Int = 8,
      idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[SampledFrame] = {
    require(frameBytes >= 1 && everyN >= 1 && maxFrames >= 1)
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytesOrNull) =>
        val bytes = Option(bytesOrNull).getOrElse(Array.empty[Byte])
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by everyN).take(maxFrames).map { f =>
          val from = f * frameBytes
          SampledFrame(id, f, from.toLong, java.util.Arrays.copyOfRange(bytes, from, math.min(bytes.length, from + frameBytes)))
        }
      }
  }
}
