package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star, SURVEY §7.6): image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct; decoding
  * and feature extraction run batch-wise per partition.
  *
  * The image/video codec steps are STUBS (this container ships no image
  * libraries): [[DecodedFeatures]] are a deterministic function of the
  * bytes, clearly marked below. The AUDIO path is real: raw s16le PCM
  * needs no codec library, so [[decodePcm16Frames]] performs an actual
  * byte-level decode with an exact SQL oracle replay. Everything
  * Spark-side — schema, binary columns, partition-batched iteration,
  * output shape — is real and tested; swapping a stub for a JNI/ONNX
  * decoder changes only `decodeStub`.
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

  final case class PcmFrameStats(doc_id: Long, frame_idx: Int, n_samples: Long, rms: Double, peak: Long)

  /** ======== REAL codec: raw s16le PCM ========
    * Unlike the stubbed image/video steps above, this decode is the actual
    * format: the payload is interpreted as raw little-endian signed 16-bit
    * PCM (the interchange format every audio toolchain reads and writes
    * without a container), framed into `frameSize`-sample windows, and
    * reduced to the waveform statistics an audio-curation pipeline filters
    * on — per-frame RMS (silence / clipping detection) and peak |sample|.
    * A trailing odd byte is ignored; an empty or null payload yields no
    * frames. No codec library is involved because raw PCM needs none —
    * this is the one modality the sandbox lets us decode for real.
    *
    * Exactness: samples and peaks are integers; each frame's sum of
    * squares fits a long at any frame size up to 2^23; `rms` is one IEEE
    * division + sqrt on exact operands — so the whole operator is bitwise
    * engine-portable, and the oracle replays the byte-level decode in SQL
    * (substring/hex on the blob, the same sign fix-up).
    */
  def decodePcm16Frames(
      withBinary: DataFrame,
      frameSize: Int = 256,
      idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[PcmFrameStats] = {
    require(frameSize >= 1 && frameSize <= (1 << 23), "need 1 <= frameSize <= 2^23")
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytesOrNull) =>
        val bytes = Option(bytesOrNull).getOrElse(Array.empty[Byte])
        val nSamples = bytes.length / 2
        val nFrames = (nSamples + frameSize - 1) / frameSize
        (0 until nFrames).map { f =>
          val from = f * frameSize
          val until = math.min(nSamples, from + frameSize)
          var sumSq = 0L
          var peak = 0L
          var i = from
          while (i < until) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1) & 0xff
            val u = hi * 256 + lo
            val s = if (u > 32767) u - 65536 else u
            sumSq += s.toLong * s
            val a = math.abs(s.toLong)
            if (a > peak) peak = a
            i += 1
          }
          val n = until - from
          PcmFrameStats(id, f, n.toLong, math.sqrt(sumSq.toDouble / n), peak)
        }
      }
  }

  final case class ResampledPcm(doc_id: Long, n_samples_in: Long, n_samples_out: Long, resampled: Array[Byte])

  /** Decimation resample of the raw s16le PCM payload: keep every
    * `factor`-th sample (sample 0, factor, 2*factor, ...) and re-encode
    * as s16le — the rate-reduction step a 48 kHz ingest applies before a
    * 16 kHz feature extractor. Decimation without a low-pass is the
    * honest scope here (a windowed-sinc filter needs real DSP state; this
    * is the indexing/re-encoding half, byte-exact and oracle-replayable —
    * same split as everywhere else in this module: the Spark-side
    * plumbing is real, and here the codec itself is too).
    *
    * A trailing odd byte is ignored; empty/null payloads yield 0-sample
    * outputs with empty binary; null ids are excluded.
    */
  def resamplePcm16(
      withBinary: DataFrame,
      factor: Int,
      idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[ResampledPcm] = {
    require(factor >= 1, "need factor >= 1")
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytesOrNull) =>
        val bytes = Option(bytesOrNull).getOrElse(Array.empty[Byte])
        val nIn = bytes.length / 2
        val nOut = (nIn + factor - 1) / factor
        val out = new Array[Byte](nOut * 2)
        var j = 0
        while (j < nOut) {
          out(2 * j) = bytes(2 * j * factor)
          out(2 * j + 1) = bytes(2 * j * factor + 1)
          j += 1
        }
        ResampledPcm(id, nIn.toLong, nOut.toLong, out)
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
