package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== Avro Object Container Files, both directions ========
  *
  * The data-lake interchange format: corpus drops from upstream teams
  * arrive as `.avro` container files, and reading them needs the whole
  * stack — the binary encoding (zigzag varints, length-prefixed
  * strings/bytes), the map-encoded file metadata, the block structure
  * with per-block sync markers, and the codec layer. All from scratch
  * here, composing the repo's own DEFLATE for the `deflate` codec
  * (Avro blocks carry RAW RFC 1951 streams, no zlib wrapper):
  *
  *   header  = `Obj\x01` + metadata map + 16-byte sync marker
  *   block   = count (zigzag varint) + byte size (zigzag varint)
  *           + [codec-compressed] records + the SAME 16-byte sync
  *
  * The metadata map uses Avro's block encoding: a signed count per
  * map block (negative count = abs count with a byte-size following —
  * the skip-optimization arm real writers emit), key-value pairs,
  * zero terminator. The reader verifies the magic, honors
  * `avro.codec` (absent = null), checks EVERY block's sync marker
  * against the header's, bounds block sizes before allocation, and
  * requires each block's decoded bytes to be consumed EXACTLY by its
  * declared record count — any slack or overrun is malformed, and
  * damage quarantines the archive whole. Records here are the fixture
  * schema `{doc_id: long, text: string}`.
  *
  * Differential: the spec round-trips BOTH directions against the
  * real Avro library (on /opt/spark/jars, test-only) — our files read
  * there, its files (random sync markers, interleaved metadata, both
  * codecs) read here, bit-exact.
  *
  * Scale shape: map-only demux per container; one bounded fixture
  * groupBy. No reference citation — the reference has no ingest path;
  * north-star scope.
  */
object Avro {

  private val SchemaJson =
    """{"type":"record","name":"Doc","fields":[{"name":"doc_id","type":"long"},{"name":"text","type":"string"}]}"""

  private def md5(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))

  // ------------------------------------------------------- binary encoding

  private[ext] def writeVarLong(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var n = (v << 1) ^ (v >> 63) // zigzag
    while ((n & ~0x7fL) != 0) {
      out.write(((n & 0x7f) | 0x80).toInt)
      n >>>= 7
    }
    out.write(n.toInt)
  }

  private def writeString(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    writeVarLong(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  // ------------------------------------------------------------- writer

  /** Documents grouped into 16 `.avro` containers (id % 16, records in
    * id order), codec cycling null/deflate by archive, blocks of up to
    * 8 records so every container has several sync-checked blocks.
    */
  def encodeAvroArchives(docs: DataFrame, nArchives: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0 && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .groupByKey(_._1 % nArchives)
      .mapGroups { (aid, it) =>
        val recs = it.toArray.sortBy(_._1)
        val deflate = aid % 2 == 1
        val sync = md5(s"avro:$aid")
        val out = new java.io.ByteArrayOutputStream()
        out.write('O'); out.write('b'); out.write('j'); out.write(1)
        writeVarLong(out, 2L) // metadata map: one block of two entries
        writeString(out, "avro.schema"); writeString(out, SchemaJson)
        writeString(out, "avro.codec"); writeString(out, if (deflate) "deflate" else "null")
        writeVarLong(out, 0L) // map end
        out.write(sync, 0, 16)
        recs.grouped(8).foreach { group =>
          val body = new java.io.ByteArrayOutputStream()
          group.foreach { case (id, text) =>
            writeVarLong(body, id)
            writeString(body, text)
          }
          val raw = body.toByteArray
          val data = if (deflate) Multimodal.deflateDynamic(raw) else raw
          writeVarLong(out, group.length.toLong)
          writeVarLong(out, data.length.toLong)
          out.write(data, 0, data.length)
          out.write(sync, 0, 16)
        }
        (aid, out.toByteArray)
      }
      .toDF("archive_id", "payload")
  }

  // ------------------------------------------------------------- reader

  private final class MalformedAvro
      extends RuntimeException("malformed avro", null, false, false)
  private def fail(): Nothing = throw new MalformedAvro

  private final class Reader(b: Array[Byte]) {
    var p = 0
    def u8(): Int = {
      if (p >= b.length) fail()
      val v = b(p) & 0xff
      p += 1
      v
    }
    def varLong(): Long = {
      var n = 0L
      var shift = 0
      var more = true
      while (more) {
        if (shift > 63) fail()
        val byte = u8()
        n |= (byte & 0x7fL) << shift
        shift += 7
        more = (byte & 0x80) != 0
      }
      (n >>> 1) ^ -(n & 1L) // un-zigzag
    }
    def bytes(len: Int): Array[Byte] = {
      if (len < 0 || p + len > b.length) fail()
      val out = java.util.Arrays.copyOfRange(b, p, p + len)
      p += len
      out
    }
    def string(maxLen: Int): String = {
      val len = varLong()
      if (len < 0 || len > maxLen) fail()
      new String(bytes(len.toInt), java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  final case class AvroEntry(
      archive_id: Long, rec_idx: Long, rec_doc_id: Long, n_bytes: Long, checksum: Long)

  private[ext] def demux(aid: Long, payload: Array[Byte], maxBlockBytes: Int): Vector[AvroEntry] = {
    val r = new Reader(payload)
    if (r.u8() != 'O' || r.u8() != 'b' || r.u8() != 'j' || r.u8() != 1) fail()
    // metadata map: signed block counts; negative = abs count + byte size
    var codec = "null"
    var count = r.varLong()
    while (count != 0L) {
      val n = if (count < 0) { r.varLong(); -count } else count
      var i = 0L
      while (i < n) {
        val key = r.string(1 << 16)
        val vLen = r.varLong()
        if (vLen < 0 || vLen > (1 << 24)) fail()
        val value = r.bytes(vLen.toInt)
        if (key == "avro.codec")
          codec = new String(value, java.nio.charset.StandardCharsets.UTF_8)
        i += 1
      }
      count = r.varLong()
    }
    if (codec != "null" && codec != "deflate") fail() // unsupported codec
    val sync = r.bytes(16)
    val entries = Vector.newBuilder[AvroEntry]
    var recIdx = 0L
    while (r.p < payload.length) {
      val nRecs = r.varLong()
      val size = r.varLong()
      if (nRecs <= 0 || size <= 0 || size > maxBlockBytes) fail()
      val data = r.bytes(size.toInt)
      val blockSync = r.bytes(16)
      if (!java.util.Arrays.equals(blockSync, sync)) fail() // sync mismatch
      // sizeHint is REQUIRED here, not an optimization: without it the
      // inflate buffer is one expectedMax-sized (64 MB default) ZEROED
      // allocation per block — a G1-humongous allocation that, repeated
      // for every few-KB block across 32 concurrent tasks, produced the
      // recurrent multi-minute full-GC stalls in the r13/r15 driver bench
      // artifacts (jstack caught the suite inside this very call). The
      // hint starts at 4x the compressed size and the buffer doubles
      // geometrically up to maxBlockBytes, so correctness is unchanged.
      val raw =
        if (codec == "deflate")
          Multimodal.inflateWithEnd(data, 0, data.length, maxBlockBytes,
            sizeHint = math.min(maxBlockBytes, 4 * data.length + 1024))._1
        else data
      val br = new Reader(raw)
      var i = 0L
      while (i < nRecs) {
        val id = br.varLong()
        val tLen = br.varLong()
        if (tLen < 0 || tLen > maxBlockBytes) fail()
        val text = br.bytes(tLen.toInt)
        var c = 0L
        text.foreach(x => c = (c * 31 + (x & 0xff)) % 1000000007L)
        entries += AvroEntry(aid, recIdx, id, text.length.toLong, c)
        recIdx += 1L
        i += 1L
      }
      if (br.p != raw.length) fail() // count must consume the block exactly
    }
    entries.result()
  }

  /** [[avroExtract]] for a CONTAINER STREAM (archive_id, ts, payload) —
    * corpus drops land continuously from upstream teams; the
    * streaming-twin flatMap over the SAME demux, composed in
    * [[graft.streaming.StreamingArchiveIngest.ingestAvro]].
    */
  def avroExtractWithTs(archives: DataFrame, maxBlockBytes: Int = 1 << 26): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives
      .select(col("archive_id").cast("long"), col("ts").cast("timestamp"), col("payload"))
      .as[(Long, java.sql.Timestamp, Array[Byte])]
      .flatMap { case (aid, ts, payload) =>
        try {
          if (payload == null) Vector.empty
          else demux(aid, payload, maxBlockBytes)
            .map(e => (e.archive_id, ts, e.rec_idx, e.rec_doc_id, e.n_bytes))
        } catch { case scala.util.control.NonFatal(_) => Vector.empty } // quarantine
      }
      .toDF("archive_id", "ts", "rec_idx", "rec_doc_id", "content_length")
  }

  /** The ingest gate: containers → per-record rows with every block's
    * sync verified and counts cross-checked; damage quarantines whole.
    */
  def avroExtract(archives: DataFrame, maxBlockBytes: Int = 1 << 26): Dataset[AvroEntry] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives
      .select(col("archive_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, payload) =>
        try demux(aid, payload, maxBlockBytes)
        catch { case scala.util.control.NonFatal(_) => Vector.empty } // quarantine
      }
  }
}
