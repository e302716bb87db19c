package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star, SURVEY §7.6): image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct; decoding
  * and feature extraction run batch-wise per partition.
  *
  * Every modality here is a real codec — no stubs. IMAGE: binary PPM (P6)
  * needs no image library — [[parsePpm]] performs an actual header parse
  * (magic, comments, whitespace, dimensions, maxval) plus raw RGB
  * extraction, [[encodePpm]] writes the format, and
  * [[ppmFeatures]]/[[resizePpm]] operate on decoded pixels. AUDIO: raw
  * s16le PCM ([[decodePcm16Frames]], [[resamplePcm16]],
  * [[resamplePcm16Filtered]]) is an actual byte-level decode (and a real
  * anti-aliasing FIR). VIDEO: RIFF/AVI needs no library either —
  * [[parseAvi]] is a genuine RIFF chunk walker (hdrl/avih header, movi
  * frame chunks, padding rules, rec groups) and [[sampleAviFrames]] emits
  * real demuxed frames; what WOULD need a codec library is decoding
  * compressed frame payloads — our containers carry uncompressed RGB24.
  * Everything replays byte-for-byte in the SQL oracle. Swapping in a
  * JNI/ONNX decoder for compressed payloads changes only the per-row
  * decode function.
  */
object Multimodal {

  /** Null-safe UTF-8 bytes of a doc's text — the shared plane/payload
    * source for every synthetic encoder here (null text encodes as empty,
    * which each writer paints as zeros).
    */
  private def utf8Bytes(textOrNull: String): Array[Byte] =
    Option(textOrNull).getOrElse("").getBytes(java.nio.charset.StandardCharsets.UTF_8)


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

  /** A decoded binary-PPM image: dimensions, sample depth, and the raw
    * interleaved RGB plane (3 bytes per pixel, row-major).
    */
  final case class PpmImage(width: Int, height: Int, maxval: Int, pixels: Array[Byte])

  /** ======== REAL codec: PPM (P6) parse ========
    * An actual format decode, the image analog of [[decodePcm16Frames]]:
    * binary PPM is the uncompressed interchange format every image
    * toolchain reads and writes without a library, so the full codec —
    * magic check, `#` comments, arbitrary header whitespace, decimal
    * dimension/maxval parse, the single post-maxval whitespace byte, raw
    * RGB extraction — fits in plain JVM code.
    *
    * Returns None for malformed payloads (wrong magic, missing/overflowing
    * header fields, maxval outside [1, 255] — 2-byte-sample images are out
    * of scope — or a pixel plane shorter than 3*w*h): the metric_parse
    * malformed-drop convention. The 3L*w*h length check runs in Long, so a
    * hostile header claiming a multi-GB image fails cleanly instead of
    * allocating.
    */
  private[ext] def parsePpm(bytes: Array[Byte]): Option[PpmImage] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c
    def skipWsAndComments(): Unit = {
      var done = false
      while (!done && i < bytes.length) {
        if (isWs(bytes(i))) i += 1
        else if (bytes(i) == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else done = true
      }
    }
    def parseNat(): Long = { // -1 = malformed; values capped at 2^31
      skipWsAndComments()
      val start = i
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        if (v <= Int.MaxValue) v = v * 10 + (bytes(i) - '0')
        i += 1
      }
      if (i == start || v > Int.MaxValue) -1L else v
    }
    val w = parseNat()
    val h = parseNat()
    val maxval = parseNat()
    if (w < 1 || h < 1 || maxval < 1 || maxval > 255) return None
    // exactly ONE whitespace byte separates the header from the pixel plane
    if (i >= bytes.length || !isWs(bytes(i))) return None
    i += 1
    val need = 3L * w * h
    if (bytes.length - i < need) return None
    Some(PpmImage(w.toInt, h.toInt, maxval.toInt,
      java.util.Arrays.copyOfRange(bytes, i, i + need.toInt)))
  }

  /** ======== REAL codec: PPM (P6) encode ========
    * Attach a genuine binary-PPM payload to a text-bearing table: per doc,
    * a deterministic w x h canvas (w = 8 + id % 8, h = 8 + (id/8) % 8 —
    * floor semantics, matching SQL `//`/`%` on non-negative ids) whose RGB
    * plane is the doc's UTF-8 bytes cycled to fill 3*w*h (an empty or null
    * text paints black). In production the payload column comes from a blob
    * store; this writer exists so the decode path has real images to parse
    * end to end, fixture-deterministically, with a SQL-replayable byte
    * model. Null and negative ids are excluded: the canvas derivation uses
    * floorMod/floorDiv while the SQL oracles replay it with truncating
    * `%`/`//` — the two agree only on non-negative ids, so the filter
    * ENFORCES the domain the equivalence needs instead of assuming it.
    */
  def encodePpm(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol).cast("long") >= 0)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, textOrNull) =>
        val data = utf8Bytes(textOrNull)
        val w = 8 + java.lang.Math.floorMod(id, 8L).toInt
        val h = 8 + java.lang.Math.floorMod(java.lang.Math.floorDiv(id, 8L), 8L).toInt
        val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        val plane = 3 * w * h
        val out = new Array[Byte](header.length + plane)
        System.arraycopy(header, 0, out, 0, header.length)
        if (data.length > 0) {
          var k = 0
          while (k < plane) { out(header.length + k) = data(k % data.length); k += 1 }
        }
        (id, out, w, h)
      }
      .toDF(idCol, "payload", "w", "h")
      .select(
        col(idCol), col("payload"),
        struct(
          col("w").as("width"), col("h").as("height"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("image/x-portable-pixmap").as("mime")).as("meta"))
  }

  final case class PpmFeatures(
      doc_id: Long, width: Int, height: Int, maxval: Int, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Partition-batched REAL image decode + per-channel statistics: parse
    * each payload as binary PPM ([[parsePpm]]) and reduce the pixel plane
    * to exact per-channel sums plus means — the brightness/color-cast
    * numbers an image-curation filter thresholds on. Malformed payloads
    * are dropped (the decode's analog of malformed-JSON drop); sums are
    * exact integers and each mean is one IEEE division of exact operands,
    * so the whole operator is engine-portable bitwise.
    */
  def ppmFeatures(withBinary: DataFrame, idCol: String = "doc_id", binCol: String = "payload"): Dataset[PpmFeatures] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (expensive init amortized)
        it.flatMap { case (id, bytesOrNull) =>
          parsePpm(Option(bytesOrNull).getOrElse(Array.empty)).map { img =>
            var r = 0L; var g = 0L; var b = 0L
            var p = 0
            while (p < img.pixels.length) {
              r += img.pixels(p) & 0xff
              g += img.pixels(p + 1) & 0xff
              b += img.pixels(p + 2) & 0xff
              p += 3
            }
            val n = img.width.toLong * img.height
            PpmFeatures(id, img.width, img.height, img.maxval, n, r, g, b,
              r.toDouble / n, g.toDouble / n, b.toDouble / n)
          }
        }
      }
  }

  final case class PpmResized(
      doc_id: Long, src_w: Int, src_h: Int, out_w: Int, out_h: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, checksum: Long)

  /** REAL image resize on decoded pixels: nearest-neighbor resample of the
    * parsed PPM grid to `targetW` x `targetH` — source pixel (tx*W/tw,
    * ty*H/th), floor division, the integer-exact choice that a SQL oracle
    * can replay byte for byte (bilinear's fractional weights cannot be
    * compared bitwise across engines). Output per image: exact per-channel
    * sums of the resized plane plus a base-31 rolling checksum over its
    * bytes in RGB scan order (the [[graft.ext.TextAnalysis.fingerprints]]
    * modulus), which pins every byte position, not just totals. Malformed
    * payloads are dropped, like [[ppmFeatures]].
    */
  /** Nearest-neighbor resample of a parsed image's RGB plane to tw x th:
    * source pixel (tx*W/tw, ty*H/th), floor division — the integer-exact
    * choice a SQL oracle can replay byte for byte. Shared by the stats
    * view ([[resizePpm]]) and the thumbnail emitter ([[resizePpmImage]]),
    * so the two cannot disagree on an index.
    */
  private def resizePlane(img: PpmImage, tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](3 * tw * th)
    var o = 0
    var ty = 0
    while (ty < th) {
      val sy = ty * img.height / th
      var tx = 0
      while (tx < tw) {
        val base = 3 * (sy * img.width + tx * img.width / tw)
        out(o) = img.pixels(base)
        out(o + 1) = img.pixels(base + 1)
        out(o + 2) = img.pixels(base + 2)
        o += 3
        tx += 1
      }
      ty += 1
    }
    out
  }

  def resizePpm(
      withBinary: DataFrame,
      targetW: Int,
      targetH: Int,
      idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[PpmResized] = {
    require(targetW >= 1 && targetH >= 1)
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytesOrNull) =>
          parsePpm(Option(bytesOrNull).getOrElse(Array.empty)).map { img =>
            val plane = resizePlane(img, targetW, targetH)
            var r = 0L; var g = 0L; var b = 0L
            var checksum = 0L
            var j = 0
            while (j < plane.length) {
              val v = plane(j) & 0xff
              (j % 3: @annotation.switch) match {
                case 0 => r += v
                case 1 => g += v
                case 2 => b += v
              }
              checksum = (checksum * 31 + v) % 1000000007L
              j += 1
            }
            PpmResized(id, img.width, img.height, targetW, targetH, r, g, b, checksum)
          }
        }
      }
  }

  /** REAL image resize emitting a REAL image: parse the PPM, resample the
    * pixel grid ([[resizePlane]] — the same indexing [[resizePpm]] audits),
    * and re-encode as canonical P6 — the thumbnail-production step a
    * vision-encoder prep pipeline runs, completing the image path's
    * decode -> transform -> re-encode round trip (the audio path's
    * resample already has this shape). Output: (id, payload, meta);
    * malformed inputs drop; map-only.
    */
  def resizePpmImage(
      withBinary: DataFrame,
      targetW: Int,
      targetH: Int,
      idCol: String = "doc_id",
      binCol: String = "payload"): DataFrame = {
    require(targetW >= 1 && targetH >= 1)
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytesOrNull) =>
          parsePpm(Option(bytesOrNull).getOrElse(Array.empty)).map { img =>
            val header = s"P6\n$targetW $targetH\n255\n"
              .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
            val plane = resizePlane(img, targetW, targetH)
            val out = new Array[Byte](header.length + plane.length)
            System.arraycopy(header, 0, out, 0, header.length)
            System.arraycopy(plane, 0, out, header.length, plane.length)
            (id, out)
          }
        }
      }
      .toDF(idCol, "payload")
      .select(
        col(idCol), col("payload"),
        struct(
          lit(targetW).as("width"), lit(targetH).as("height"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("image/x-portable-pixmap").as("mime")).as("meta"))
  }

  /** ======== REAL codec: BMP (BITMAPINFOHEADER, 24-bit) ========
    * A second real image format, and a genuinely different parse from PPM:
    * binary little-endian headers instead of ASCII, BOTTOM-UP row order
    * (positive biHeight stores the last scanline first), BGR channel order
    * instead of RGB, and each row padded to a 4-byte boundary — so a
    * decoder that ignores any of flip/swap/stride reads garbage, and the
    * oracle's byte replay catches it. Parses the uncompressed
    * BI_RGB 24-bit subset (the format every paint/screenshot tool emits);
    * anything else — bad magic, biSize < 40, other bit depths or
    * compressions, pixel data out of bounds — returns None, the
    * malformed-drop convention. Negative biHeight (top-down BMP, rare but
    * legal) is handled: rows are then already in logical order. Returns
    * the image normalized to a [[PpmImage]] — logical top-down RGB plane —
    * so every downstream pixel operator (features, resize, thumbnail)
    * works on BMP input unchanged.
    */
  private[ext] def parseBmp(bytes: Array[Byte]): Option[PpmImage] = {
    val n = bytes.length
    if (n < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    def u16(pos: Int): Int = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
    def u32(pos: Int): Long =
      (bytes(pos) & 0xffL) | ((bytes(pos + 1) & 0xffL) << 8) |
        ((bytes(pos + 2) & 0xffL) << 16) | ((bytes(pos + 3) & 0xffL) << 24)
    val dataOffset = u32(10)
    val biSize = u32(14)
    val width = u32(18).toInt // i32: top bit would make it negative below
    val rawHeight = u32(22).toInt
    if (biSize < 40L) return None
    if (u16(26) != 1 || u16(28) != 24 || u32(30) != 0L) return None // planes/BI_RGB 24bpp only
    val topDown = rawHeight < 0
    val height = if (topDown) -rawHeight else rawHeight
    if (width <= 0 || height <= 0) return None
    // dims are attacker-controlled: all products in Long before any allocate
    val stride = ((3L * width + 3L) / 4L) * 4L
    val need = stride * height
    if (width > (1 << 14) || height > (1 << 14)) return None // 16k x 16k cap
    if (dataOffset < 14L + biSize || dataOffset + need > n) return None
    val out = new Array[Byte](3 * width * height)
    var y = 0
    while (y < height) {
      val fileRow = if (topDown) y else height - 1 - y
      val rowBase = (dataOffset + fileRow * stride).toInt
      var x = 0
      while (x < width) {
        val src = rowBase + 3 * x
        val dst = 3 * (y * width + x)
        out(dst) = bytes(src + 2) // R <- file's B,G,R triple reversed
        out(dst + 1) = bytes(src + 1)
        out(dst + 2) = bytes(src)
        x += 1
      }
      y += 1
    }
    Some(PpmImage(width, height, 255, out))
  }

  /** ======== REAL codec: BMP encode ========
    * The BMP analog of [[encodePpm]], same deterministic canvas (w = 8 +
    * id % 8, h = 8 + (id/8) % 8 — w in 8..15 makes the row stride exercise
    * every padding width 0..3) and the same SQL-replayable byte model:
    * the 54-byte BITMAPFILEHEADER + BITMAPINFOHEADER, then file byte
    * 54 + k = text byte k % n for the WHOLE stride*h pixel area — pad
    * bytes carry cycled text too (BMP leaves pad content unspecified;
    * cycling through them keeps the byte model one modulus, and the
    * decoder must SKIP them to read correct pixels, which the oracle's
    * logical-order replay verifies). Null and negative ids are excluded
    * ([[encodePpm]]'s floorMod-vs-`%` rationale).
    */
  def encodeBmp(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol).cast("long") >= 0)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, textOrNull) =>
        val data = utf8Bytes(textOrNull)
        val w = 8 + java.lang.Math.floorMod(id, 8L).toInt
        val h = 8 + java.lang.Math.floorMod(java.lang.Math.floorDiv(id, 8L), 8L).toInt
        val stride = ((3 * w + 3) / 4) * 4
        val area = stride * h
        val bb = java.nio.ByteBuffer
          .allocate(54 + area)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put('B'.toByte).put('M'.toByte)
        bb.putInt(54 + area) // bfSize
        bb.putInt(0) // bfReserved
        bb.putInt(54) // bfOffBits
        bb.putInt(40) // biSize
        bb.putInt(w)
        bb.putInt(h) // positive: bottom-up
        bb.putShort(1) // biPlanes
        bb.putShort(24) // biBitCount
        bb.putInt(0) // BI_RGB
        bb.putInt(area) // biSizeImage
        bb.putInt(2835).putInt(2835) // 72 DPI
        bb.putInt(0).putInt(0) // biClrUsed/Important
        var k = 0
        while (k < area) {
          bb.put(if (data.length == 0) 0.toByte else data(k % data.length))
          k += 1
        }
        (id, bb.array(), w, h)
      }
      .toDF(idCol, "payload", "w", "h")
      .select(
        col(idCol), col("payload"),
        struct(
          col("w").as("width"), col("h").as("height"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("image/bmp").as("mime")).as("meta"))
  }

  final case class BmpFeatures(
      doc_id: Long, width: Int, height: Int, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, checksum: Long)

  /** BMP decode + statistics: parse each payload ([[parseBmp]]) and reduce
    * the normalized logical RGB plane to exact per-channel sums plus a
    * base-31 rolling checksum over the plane in scan order (the
    * [[resizePpm]] modulus). The checksum is what makes the bottom-up flip
    * observable: channel sums alone are row-order-invariant, but the
    * rolling hash pins every byte POSITION, so reading rows in file order
    * (or forgetting the BGR swap, or reading pad bytes as pixels) fails
    * the oracle. Malformed payloads drop; map-only, no shuffle.
    */
  def bmpFeatures(withBinary: DataFrame, idCol: String = "doc_id", binCol: String = "payload"): Dataset[BmpFeatures] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytesOrNull) =>
          parseBmp(Option(bytesOrNull).getOrElse(Array.empty)).map { img =>
            var r = 0L; var g = 0L; var b = 0L
            var checksum = 0L
            var j = 0
            while (j < img.pixels.length) {
              val v = img.pixels(j) & 0xff
              (j % 3: @annotation.switch) match {
                case 0 => r += v
                case 1 => g += v
                case 2 => b += v
              }
              checksum = (checksum * 31 + v) % 1000000007L
              j += 1
            }
            BmpFeatures(id, img.width, img.height, img.width.toLong * img.height, r, g, b, checksum)
          }
        }
      }
  }

  final case class PcmFrameStats(doc_id: Long, frame_idx: Int, n_samples: Long, rms: Double, peak: Long)

  /** ======== REAL codec: raw s16le PCM ========
    * Like the PPM and AVI codecs in this module, this decode is the actual
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
    * as s16le. Decimation WITHOUT a low-pass aliases anything above the
    * target Nyquist — this raw form exists as the indexing/re-encoding
    * baseline; [[resamplePcm16Filtered]] is the production path (same
    * output contract, windowed-sinc anti-aliasing first).
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

  /** Q15 fixed-point windowed-sinc low-pass for decimation by `factor`:
    * cutoff 0.45/factor of the source rate (just under the target Nyquist),
    * Hamming window, `2*halfTaps + 1` taps (default halfTaps = 2*factor),
    * coefficients rounded to integers scaled by 2^15 so the convolution is
    * EXACT integer arithmetic — engine-portable and SQL-replayable. DC gain
    * is ~1 (sum of taps ~ 32768). Pure and deterministic: the oracle
    * inlines these exact integers into its SQL, so the two engines cannot
    * disagree on a coefficient.
    */
  def firLowpassQ15(factor: Int, halfTaps: Int = -1): Array[Int] = {
    require(factor >= 1, "need factor >= 1")
    val h = if (halfTaps > 0) halfTaps else 2 * factor
    val fc = 0.45 / factor
    Array.tabulate(2 * h + 1) { t =>
      val k = t - h
      val sinc = if (k == 0) 2 * fc else math.sin(2 * math.Pi * fc * k) / (math.Pi * k)
      val win = 0.54 + 0.46 * math.cos(math.Pi * k / h)
      Math.round(sinc * win * 32768.0).toInt
    }
  }

  /** Anti-aliased s16le resample: windowed-sinc low-pass ([[firLowpassQ15]])
    * + decimation in ONE pass — the real 48 kHz -> 16 kHz shape, unlike
    * [[resamplePcm16]]'s documented decimation-only scope. The convolution
    * is evaluated ONLY at the decimated positions (keep-every-`factor`-th),
    * so per-payload cost is `taps * nOut`, not `taps * nIn` — still
    * map-only, no shuffle, no state.
    *
    * Exactness: samples and Q15 taps are integers, each accumulator fits a
    * long with 2^5 headroom, the >>15 normalize is `Math.floorDiv` (the SQL
    * replay adds a positive offset first so truncating division IS floor
    * division), and the result clamps to s16 before re-encoding — every
    * byte of the output is integer-determined, so the whole filter sits
    * under the bitwise oracle. Signal edges are zero-padded; a trailing odd
    * byte is ignored; empty/null payloads yield 0-sample outputs; null ids
    * are excluded.
    */
  def resamplePcm16Filtered(
      withBinary: DataFrame,
      factor: Int,
      halfTaps: Int = -1,
      idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[ResampledPcm] = {
    require(factor >= 1, "need factor >= 1")
    val q = firLowpassQ15(factor, halfTaps)
    val h = (q.length - 1) / 2
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
          val center = j * factor
          var acc = 0L
          var t = 0
          while (t < q.length) {
            val idx = center + t - h
            if (idx >= 0 && idx < nIn) {
              val lo = bytes(2 * idx) & 0xff
              val hi = bytes(2 * idx + 1) & 0xff
              val u = hi * 256 + lo
              val s = if (u > 32767) u - 65536 else u
              acc += q(t).toLong * s
            }
            t += 1
          }
          var y = Math.floorDiv(acc, 32768L).toInt
          if (y > 32767) y = 32767
          if (y < -32768) y = -32768
          val u = y & 0xffff
          out(2 * j) = (u & 0xff).toByte
          out(2 * j + 1) = (u >> 8).toByte
          j += 1
        }
        ResampledPcm(id, nIn.toLong, nOut.toLong, out)
      }
  }

  /** A parsed RIFF/AVI container: dimensions + declared frame count from
    * the `avih` main header, and the (data offset, length) of every video
    * frame chunk (`00db`/`00dc`) in the `movi` list, in stream order.
    */
  final case class AviIndex(
      width: Int, height: Int, totalFrames: Int, frames: Seq[(Long, Int)])

  /** ======== REAL codec: RIFF/AVI demux ========
    * An actual container parse — the video analog of [[parsePpm]]: AVI is a
    * RIFF file, and RIFF needs no library, just a chunk walker. The parser
    * verifies the `RIFF`/`AVI ` magic, walks top-level chunks honoring the
    * even-byte padding rule, finds the `avih` main header wherever the
    * `hdrl` list put it, reads width/height/frame count little-endian,
    * and scans the `strl` stream-description lists for the FIRST stream
    * whose `strh` declares fccType `vids` — AVI numbers streams by strl
    * order, and data chunks carry that number as a two-digit prefix. The
    * `movi` walk then collects only THAT stream's `NNdb`/`NNdc` frame
    * chunks — including inside `rec ` groups — with their REAL byte
    * offsets and lengths, so a multi-stream container (audio at stream 00,
    * video at 01, or a second video stream) cannot interleave foreign
    * chunks into the frame list. A container with no strl lists at all
    * (the minimal-writer subset) defaults to stream 00, the number a
    * sole video stream gets. Returns None for malformed containers (bad
    * magic, truncated chunk, no avih, no movi): the malformed-drop
    * convention. All sizes are read into Long before bounds checks, so a
    * hostile header cannot index out or allocate.
    */
  private[ext] def parseAvi(bytes: Array[Byte]): Option[AviIndex] = {
    val n = bytes.length
    def u32(pos: Int): Long =
      (bytes(pos) & 0xffL) | ((bytes(pos + 1) & 0xffL) << 8) |
        ((bytes(pos + 2) & 0xffL) << 16) | ((bytes(pos + 3) & 0xffL) << 24)
    def fourcc(pos: Int): String =
      new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (n < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var avih: Option[(Int, Int, Int)] = None
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var sawMovi = false
    var nStreams = 0 // strl lists seen, in order = AVI stream numbering
    var videoStream = -1 // first stream whose strh says fccType 'vids'
    // walk a chunk range; `inMovi` collects the video stream's frame
    // chunks, recursing into `rec ` groups; `inHdrl` scans for avih and
    // the strl stream descriptions; `inStrl` scans one stream's headers
    def walk(from: Long, until: Long, inMovi: Boolean, inHdrl: Boolean, inStrl: Boolean): Boolean = {
      var p = from
      while (p + 8 <= until) {
        val id = fourcc(p.toInt)
        val sz = u32(p.toInt + 4)
        val dataStart = p + 8
        if (dataStart + sz > until) return false // truncated chunk
        if (id == "LIST") {
          if (sz < 4) return false
          val listType = fourcc(dataStart.toInt)
          if (listType == "hdrl") { if (!walk(dataStart + 4, dataStart + sz, inMovi = false, inHdrl = true, inStrl = false)) return false }
          else if (listType == "movi") { sawMovi = true; if (!walk(dataStart + 4, dataStart + sz, inMovi = true, inHdrl = false, inStrl = false)) return false }
          else if (inMovi && listType == "rec ") { if (!walk(dataStart + 4, dataStart + sz, inMovi = true, inHdrl = false, inStrl = false)) return false }
          else if (inHdrl && listType == "strl") {
            if (!walk(dataStart + 4, dataStart + sz, inMovi = false, inHdrl = false, inStrl = true)) return false
            nStreams += 1
          }
        } else if (inHdrl && id == "avih") {
          if (sz < 40) return false
          avih = Some((u32(dataStart.toInt + 32).toInt, u32(dataStart.toInt + 36).toInt, u32(dataStart.toInt + 16).toInt))
        } else if (inStrl && id == "strh") {
          if (sz < 4) return false
          if (videoStream < 0 && fourcc(dataStart.toInt) == "vids") videoStream = nStreams
        } else if (inMovi && (id.endsWith("db") || id.endsWith("dc"))) {
          // two-digit decimal stream prefix; -1 = not a data chunk
          val c0 = id.charAt(0); val c1 = id.charAt(1)
          val streamNo =
            if (c0 >= '0' && c0 <= '9' && c1 >= '0' && c1 <= '9') (c0 - '0') * 10 + (c1 - '0') else -1
          // no strl (minimal writer) -> a sole video stream is number 00
          val want = if (videoStream >= 0) videoStream else 0
          if (streamNo == want) frames += ((dataStart, sz.toInt))
        }
        p = dataStart + sz + (sz & 1L) // RIFF pads chunks to even length
      }
      true
    }
    val riffEnd = math.min(n.toLong, 8L + u32(4))
    if (!walk(12L, riffEnd, inMovi = false, inHdrl = false, inStrl = false)) return None
    avih match {
      case Some((w, h, tf)) if sawMovi => Some(AviIndex(w, h, tf, frames.toSeq))
      case _ => None
    }
  }

  /** ======== REAL codec: minimal AVI writer ========
    * Attach a genuine RIFF/AVI payload to a text-bearing table so the
    * demux path has real containers to parse end to end: per doc,
    * `1 + id % 5` uncompressed 8x6 RGB24 frames (144 bytes each), frame
    * k's plane being the doc's UTF-8 bytes cycled starting at offset k
    * (frames differ, deterministically). The writer emits the minimal
    * structurally-valid subset (RIFF/AVI + hdrl/avih + movi/00db);
    * [[parseAvi]] is the general walker and is additionally spec-tested
    * against containers with strl lists, junk chunks, odd-size padding,
    * and rec-grouped frames. Null and negative ids are excluded (the
    * frame-count derivation is floorMod vs the oracle's truncating `%`,
    * [[encodePpm]]'s rationale); null text paints black frames.
    */
  def encodeAvi(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (w, h) = (8, 6)
    val fb = 3 * w * h // 144, even: no pad bytes
    docs
      .filter(col(idCol).isNotNull && col(idCol).cast("long") >= 0)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, textOrNull) =>
        val data = utf8Bytes(textOrNull)
        val nf = (1 + java.lang.Math.floorMod(id, 5L)).toInt
        val bb = java.nio.ByteBuffer
          .allocate(12 + 76 + 12 + nf * (8 + fb))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def cc(s: String): Unit = bb.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        cc("RIFF"); bb.putInt(bb.capacity - 8); cc("AVI ")
        cc("LIST"); bb.putInt(68); cc("hdrl")
        cc("avih"); bb.putInt(56)
        bb.putInt(100000) // dwMicroSecPerFrame (10 fps)
        bb.putInt(0); bb.putInt(0); bb.putInt(0) // maxBytesPerSec, padding, flags
        bb.putInt(nf) // dwTotalFrames
        bb.putInt(0); bb.putInt(1); bb.putInt(fb) // initialFrames, streams, bufSize
        bb.putInt(w); bb.putInt(h)
        (0 until 4).foreach(_ => bb.putInt(0)) // dwReserved
        cc("LIST"); bb.putInt(4 + nf * (8 + fb)); cc("movi")
        var k = 0
        while (k < nf) {
          cc("00db"); bb.putInt(fb)
          var j = 0
          while (j < fb) {
            bb.put(if (data.length == 0) 0.toByte else data((k + j) % data.length))
            j += 1
          }
          k += 1
        }
        (id, bb.array())
      }
      .toDF(idCol, "payload")
      .select(
        col(idCol), col("payload"),
        struct(
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("video/x-msvideo").as("mime")).as("meta"))
  }

  final case class AviFrameStats(
      doc_id: Long, frame_idx: Int, width: Int, height: Int, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Per-frame channel statistics over demuxed RIFF/AVI video — the video
    * analog of [[decodePcm16Frames]]: every frame the container indexes is
    * reduced to exact per-channel sums over its uncompressed RGB24 plane,
    * the brightness/color numbers a video-curation filter thresholds on
    * (black-frame detection, color-cast drift across frames). Real demux
    * ([[parseAvi]]) + exact integer sums; frames whose chunk length is not
    * 3*width*height (a compressed or foreign stream) are skipped rather
    * than misread; malformed containers drop; map-only.
    */
  def aviFrameStats(
      withBinary: DataFrame,
      idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[AviFrameStats] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytesOrNull) =>
        val bytes = Option(bytesOrNull).getOrElse(Array.empty)
        parseAvi(bytes).toSeq.flatMap { avi =>
          val np = avi.width.toLong * avi.height
          avi.frames.zipWithIndex.collect {
            case ((off, len), k) if len == 3L * np =>
              var r = 0L; var g = 0L; var b = 0L
              var j = off.toInt
              val end = off.toInt + len
              while (j < end) {
                r += bytes(j) & 0xff
                g += bytes(j + 1) & 0xff
                b += bytes(j + 2) & 0xff
                j += 3
              }
              AviFrameStats(id, k, avi.width, avi.height, np, r, g, b)
          }
        }
      }
  }

  final case class SampledFrame(
      doc_id: Long, frame_idx: Int, offset: Long, n_bytes: Int,
      width: Int, height: Int, checksum: Long)

  /** REAL video frame sampling: demux the payload as RIFF/AVI
    * ([[parseAvi]]) and emit every `everyN`-th video frame up to
    * `maxFrames` — each with its REAL parsed byte offset, length, the
    * container's dimensions, and the base-31 rolling checksum over the
    * frame's bytes (pins every byte position). One input row fans out to
    * multiple typed frame rows; malformed containers are dropped; null
    * ids excluded. Map-only, like every decode in this module.
    */
  def sampleAviFrames(
      withBinary: DataFrame,
      everyN: Int = 2,
      maxFrames: Int = 8,
      idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[SampledFrame] = {
    require(everyN >= 1 && maxFrames >= 1)
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytesOrNull) =>
        val bytes = Option(bytesOrNull).getOrElse(Array.empty)
        parseAvi(bytes).toSeq.flatMap { avi =>
          avi.frames.indices.collect {
            case k if k % everyN == 0 && k / everyN < maxFrames =>
              val (off, len) = avi.frames(k)
              var cs = 0L
              var j = 0
              while (j < len) { cs = (cs * 31 + (bytes((off + j).toInt) & 0xff)) % 1000000007L; j += 1 }
              SampledFrame(id, k, off, len, avi.width, avi.height, cs)
          }
        }
      }
  }
}
