package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Arrow IPC file format, from scratch — the interchange format every
  * modern data tool (and Spark's own pandas-UDF path) speaks on the
  * wire, written and read at the byte level with no Arrow or
  * FlatBuffers library. Completes the columnar trio beside
  * [[ParquetFile]] and [[Orc]]: parquet is the lake format, ORC the
  * warehouse format, Arrow the in-flight one.
  *
  * Implemented per the published Arrow columnar specification
  * (`Message.fbs` / `Schema.fbs` / `File.fbs` + the IPC framing doc)
  * and the FlatBuffers internals doc:
  *
  *  - '''FlatBuffers wire format BOTH directions''': root uoffset,
  *    tables with SIGNED vtable soffsets, vtables (size, table span,
  *    per-slot u16 offsets, absent fields = 0 → defaults), inline
  *    scalars with natural alignment, uoffset fields/vectors, strings,
  *    struct vectors (FieldNode 16 B, Buffer 16 B, Block 24 B with the
  *    4-byte hole after metaDataLength) — the writer builds buffers
  *    back-to-front exactly like a real builder so every uoffset is
  *    forward;
  *  - '''IPC framing''': encapsulated messages under the 0xFFFFFFFF
  *    continuation marker + LE length, metadata padded to 8, bodies
  *    8-aligned, EOS marker, then the file wrapper — `ARROW1\0\0`
  *    magic, footer flatbuffer, footer length, trailing `ARROW1`;
  *  - '''columnar decode''': validity bitmaps (LSB-first, absent or
  *    zero-length = no nulls), Int 8/16/32/64 signed/unsigned (LE,
  *    sign-extended per is_signed), FloatingPoint single/double, Utf8
  *    (i32 offsets + data);
  *  - '''BodyCompression''' (what arrow-java emits at scale): per-batch
  *    LZ4_FRAME or ZSTD with method BUFFER — each non-empty buffer an
  *    i64 uncompressed-length prefix (−1 = raw) plus a frame decoded by
  *    the repo's own [[Lz4]] frame reader / [[Zstd]] decoder;
  *  - '''dictionary encoding''': DictionaryBatch messages (footer
  *    `dictionaries` blocks, decoded before use, replacement semantics)
  *    feeding columns whose signed-int indices resolve through the
  *    decoded values — Utf8/Int/FloatingPoint value types.
  *    Columns outside the subset (nested types, delta dictionaries,
  *    unsigned/odd index widths, unknown codecs) surface their METADATA
  *    row (vtype 'm'); only structural damage — including a referenced
  *    dictionary that never arrives or an index past its dictionary —
  *    quarantines the file.
  *
  * Grading is three-sided (ArrowSpec): (1) the bitwise DuckDB oracle
  * replays per-batch per-column aggregates — the fixture cycles
  * none/LZ4/ZSTD compression by file and always carries a
  * dictionary-encoded column, so every arm sits under the hash; (2)
  * ARROW-JAVA ITSELF (the runtime Spark ships) reads the from-scratch
  * files — compressed and dictionary-encoded included — and must see
  * the exact fixture values, nulls included; (3) the reader decodes
  * REAL arrow-java-written files (`ArrowFileWriter`, plain and
  * compressed) bit-exact — the strongest possible check on each side,
  * against a foreign implementation.
  *
  * Scale shape: map-only per file; at 100 TB the footer walk is a
  * range read of the file tail and each batch decodes independently —
  * exactly the random-access design the format was built for.
  */
object Arrow {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val words = Array("anchor", "bloom", "cedar", "dune", "ember", "flint", "grove", "harbor")

  // ------------------------------------------------------------- fixture

  private def nib(id: Long, i: Int): Int = {
    val m = md5Hex(s"arrw:$id")
    Integer.parseInt(m.substring(i - 1, i), 16)
  }

  private[ext] def nRows(id: Long): Int = 3 + nib(id, 1) % 4
  private[ext] val RowsPerBatch = 3

  private[ext] def idVal(id: Long, k: Int): Long = id * 100 + k
  private[ext] def titleVal(id: Long, k: Int): String =
    s"row $k of arrow $id: ${words(nib(id, 2 + k) % 8)}" +
      (if ((id + k) % 3 == 0) " é" else "")
  private[ext] def scoreVal(id: Long, k: Int): Double =
    (nib(id, 9 + k) + 4 * k + id % 7) / 4.0
  /** Nullable int32 column: null on every (id+k) % 3 == 0 slot, negative
    * values elsewhere — validity bitmaps and sign extension both graded.
    */
  private[ext] def flagIsNull(id: Long, k: Int): Boolean = (id + k) % 3 == 0
  private[ext] def flagVal(id: Long, k: Int): Int = nib(id, 12 + k) - 7
  /** Dictionary-encoded Utf8 column: every file carries dictionary id 1
    * (all eight words) and int32 indices — the layout arrow-java emits
    * for categorical columns.
    */
  private[ext] def tagIdx(id: Long, k: Int): Int = nib(id, 20 + k) % 8
  private[ext] def tagVal(id: Long, k: Int): String = words(tagIdx(id, k))
  /** Body compression cycles by file: none / LZ4_FRAME / ZSTD — both
    * codecs ride the repo's own coders.
    */
  private[ext] def compressionOf(id: Long): Int = (id % 3) match {
    case 0 => -1
    case 1 => 0 // LZ4_FRAME
    case _ => 1 // ZSTD
  }

  // ---- flatbuffers builder (back-to-front, forward uoffsets only)

  private final class FB {
    private var buf = new Array[Byte](512)
    private var used = 0

    private def ensure(n: Int): Unit =
      if (used + n > buf.length) {
        val nb = new Array[Byte](math.max(buf.length * 2, used + n + 64))
        System.arraycopy(buf, buf.length - used, nb, nb.length - used, used)
        buf = nb
      }
    /** Position of an object = `used` right after prepending it (its
      * first byte, counted from the buffer end).
      */
    def pos: Int = used
    def pad(n: Int): Unit = { ensure(n); used += n } // grown regions are zeroed
    private def padFor(n: Int, mod: Int, rem: Int): Unit = {
      var p = 0
      while ((used + p + n) % mod != rem) p += 1
      pad(p)
    }
    def prep(arr: Array[Byte]): Int = {
      ensure(arr.length)
      System.arraycopy(arr, 0, buf, buf.length - used - arr.length, arr.length)
      used += arr.length
      used
    }
    private def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >>> (8 * i)) & 0xff).toByte)
    def prepScalar(v: Long, size: Int): Int = { padFor(size, size, 0); prep(le(v, size)) }
    /** A uoffset field pointing at `target` (a position from [[pos]]). */
    def prepRef(target: Int): Int = {
      padFor(4, 4, 0)
      val p = used + 4
      prep(le((p - target).toLong, 4))
    }
    def string(s: String): Int = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      padFor(4 + b.length + 1, 4, 0) // position of the length prefix 4-aligned
      prep(le(0L, 1)) // NUL terminator
      prep(b)
      prep(le(b.length.toLong, 4))
    }
    /** Vector of inline structs: `blob` holds the elements already laid
      * out forward; element start must land 8-aligned.
      */
    def structVector(count: Int, blob: Array[Byte]): Int = {
      padFor(4 + blob.length, 8, 4)
      prep(blob)
      prep(le(count.toLong, 4))
    }
    /** Vector of uoffsets to already-written objects. */
    def refVector(targets: Seq[Int]): Int = {
      padFor(4 + 4 * targets.length, 4, 0)
      targets.reverse.foreach { t =>
        val p = used + 4
        prep(le((p - t).toLong, 4))
      }
      prep(le(targets.length.toLong, 4))
    }

    sealed trait Slot { def slot: Int }
    final case class SScalar(slot: Int, v: Long, size: Int) extends Slot
    final case class SRef(slot: Int, target: Int) extends Slot

    /** Build a table from its populated slots (absent slots default). */
    def table(slots: Seq[Slot]): Int = {
      if (slots.isEmpty) {
        // empty table: soffset to a vtable with no field entries
        val tablePos = { padFor(4, 4, 0); prep(le(4L, 4)) }
        prep(le(4L | (4L << 16), 2 * 2)) // vtable: [size=4, tableSize=4]
        return tablePos
      }
      val t0 = used
      val fieldPos = scala.collection.mutable.Map[Int, Int]()
      // write inline data, highest slot first (matches real builders)
      slots.sortBy(-_.slot).foreach {
        case SScalar(slot, v, size) => fieldPos(slot) = prepScalar(v, size)
        case SRef(slot, target) => fieldPos(slot) = prepRef(target)
      }
      val maxSlot = slots.map(_.slot).max
      val vtBytes = 4 + 2 * (maxSlot + 1)
      padFor(4, 4, 0)
      val tablePos = used + 4
      // soffset: the vtable sits immediately after the table start
      prep(le(vtBytes.toLong, 4))
      assert(used == tablePos)
      val vt = new Array[Byte](vtBytes)
      def putU16(at: Int, v: Int): Unit = {
        vt(at) = (v & 0xff).toByte; vt(at + 1) = ((v >> 8) & 0xff).toByte
      }
      putU16(0, vtBytes)
      putU16(2, tablePos - t0)
      fieldPos.foreach { case (slot, p) => putU16(4 + 2 * slot, tablePos - p) }
      prep(vt)
      tablePos
    }

    /** Finish: root uoffset at the front, total size 8-aligned. */
    def finish(root: Int): Array[Byte] = {
      padFor(4, 8, 0)
      val p = used + 4
      prep(le((p - root).toLong, 4))
      java.util.Arrays.copyOfRange(buf, buf.length - used, buf.length)
    }
  }

  // ---- the IPC writer

  private def leBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * i)) & 0xff).toByte)

  private def pad8(n: Int): Int = (n + 7) & ~7

  /** Schema flatbuffer table (shared by the schema message and the
    * footer): fields id/title/score/flag/tag — tag dictionary-encoded
    * (id 1, int32 indices).
    */
  private def buildSchema(fb: FB): Int = {
    def field(name: String, nullable: Boolean, typeTag: Int, typeTable: Int,
        dictEnc: Int = -1): Int = {
      val n = fb.string(name)
      fb.table(Seq(
        fb.SRef(0, n),
        fb.SScalar(1, if (nullable) 1L else 0L, 1),
        fb.SScalar(2, typeTag.toLong, 1),
        fb.SRef(3, typeTable)) ++
        (if (dictEnc >= 0) Seq(fb.SRef(4, dictEnc)) else Nil))
    }
    // type tables first (children precede parents in a back-to-front build)
    val tInt64 = fb.table(Seq(fb.SScalar(0, 64L, 4), fb.SScalar(1, 1L, 1)))
    val tUtf8 = fb.table(Seq.empty)
    val tF64 = fb.table(Seq(fb.SScalar(0, 2L, 2))) // precision DOUBLE
    val tInt32 = fb.table(Seq(fb.SScalar(0, 32L, 4), fb.SScalar(1, 1L, 1)))
    // DictionaryEncoding: id 1, indexType int32 signed
    val tIdx32 = fb.table(Seq(fb.SScalar(0, 32L, 4), fb.SScalar(1, 1L, 1)))
    val dictEnc = fb.table(Seq(fb.SScalar(0, 1L, 8), fb.SRef(1, tIdx32)))
    val fields = Seq(
      field("id", nullable = false, 2, tInt64), // Type union: Int = 2
      field("title", nullable = false, 5, tUtf8), // Utf8 = 5
      field("score", nullable = false, 3, tF64), // FloatingPoint = 3
      field("flag", nullable = true, 2, tInt32),
      field("tag", nullable = false, 5, tUtf8, dictEnc))
    val fv = fb.refVector(fields)
    fb.table(Seq(fb.SScalar(0, 0L, 2), fb.SRef(1, fv))) // endianness Little
  }

  /** One encapsulated message: continuation + length + padded
    * flatbuffer [+ body]. Returns (messageBytes, metaLen, bodyLen).
    */
  private def message(headerType: Int, headerOf: FB => Int,
      body: Array[Byte]): (Array[Byte], Int, Int) = {
    val fb = new FB
    val h = headerOf(fb)
    val root = fb.table(Seq(
      fb.SScalar(0, 4L, 2), // MetadataVersion V5
      fb.SScalar(1, headerType.toLong, 1),
      fb.SRef(2, h),
      fb.SScalar(3, body.length.toLong, 8)))
    val meta = fb.finish(root)
    val metaPadded = pad8(meta.length)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](-1, -1, -1, -1), 0, 4) // continuation
    out.write(leBytes(metaPadded.toLong, 4), 0, 4)
    out.write(meta, 0, meta.length)
    out.write(new Array[Byte](metaPadded - meta.length), 0, metaPadded - meta.length)
    val metaLen = out.size
    out.write(body, 0, body.length)
    (out.toByteArray, metaLen, body.length)
  }

  private def validity(bits: Seq[Boolean]): Array[Byte] = {
    val out = new Array[Byte]((bits.length + 7) / 8)
    bits.zipWithIndex.foreach { case (b, i) =>
      if (b) out(i / 8) = (out(i / 8) | (1 << (i % 8))).toByte
    }
    out
  }

  /** One buffer body under the file's codec: compressed buffers carry
    * the i64 uncompressed-length prefix; tiny buffers take the spec's
    * `-1` marker (compression not profitable — raw body follows), which
    * keeps that reader arm graded; empty buffers stay empty.
    */
  private def bufBody(codec: Int, raw: Array[Byte]): Array[Byte] =
    if (codec < 0 || raw.length == 0) raw
    else if (raw.length <= 16) leBytes(-1L, 8) ++ raw
    else leBytes(raw.length.toLong, 8) ++
      (if (codec == 0) Lz4.frameCompress(raw) else Zstd.compress(raw))

  /** Lay buffers into a body (8-aligned) and return (body, locations). */
  private def assembleBody(codec: Int, buffers: Seq[Array[Byte]]): (Array[Byte], Seq[(Long, Long)]) = {
    val body = new java.io.ByteArrayOutputStream()
    val locs = buffers.map { raw =>
      val b = bufBody(codec, raw)
      val off = body.size
      body.write(b, 0, b.length)
      body.write(new Array[Byte](pad8(b.length) - b.length), 0, pad8(b.length) - b.length)
      (off.toLong, b.length.toLong)
    }
    (body.toByteArray, locs)
  }

  /** The RecordBatch flatbuffer table (shared by record and dictionary
    * batches): length, nodes, buffers, and the BodyCompression table
    * when the file compresses.
    */
  private def recordBatchTable(fb: FB, rows: Int, nulls: Seq[Int],
      locs: Seq[(Long, Long)], codec: Int): Int = {
    val nodesBlob = nulls.flatMap(nc =>
      leBytes(rows.toLong, 8) ++ leBytes(nc.toLong, 8)).toArray
    val nodes = fb.structVector(nulls.length, nodesBlob)
    val bufBlob = locs.flatMap { case (o, l) => leBytes(o, 8) ++ leBytes(l, 8) }.toArray
    val bufVec = fb.structVector(locs.length, bufBlob)
    val base = Seq(
      fb.SScalar(0, rows.toLong, 8),
      fb.SRef(1, nodes),
      fb.SRef(2, bufVec))
    if (codec < 0) fb.table(base)
    else {
      val bc = fb.table(Seq(fb.SScalar(0, codec.toLong, 1))) // method BUFFER = default
      fb.table(base :+ fb.SRef(3, bc))
    }
  }

  private final case class MsgBlock(offset: Long, metaLen: Int, bodyLen: Long)

  /** Append the encapsulated-message section — schema, the dictionary
    * batch, every record batch, EOS — shared by the FILE writer (which
    * wraps it in magic + footer) and the STREAM writer (which is
    * exactly this). Returned block offsets are absolute in `out`.
    */
  private def writeMessages(out: java.io.ByteArrayOutputStream, id: Long): (MsgBlock, Seq[MsgBlock]) = {
    val n = nRows(id)
    val codec = compressionOf(id)
    val batches = (0 until n).grouped(RowsPerBatch).toSeq

    val (schemaMsg, _, _) = message(1, buildSchema, Array.emptyByteArray)
    out.write(schemaMsg, 0, schemaMsg.length)

    // ---- dictionary batch (id 1): the eight words, before any record batch
    val dictBlock = {
      val wordBytes = words.toSeq.map(_.getBytes("UTF-8"))
      val offsets = wordBytes.scanLeft(0)(_ + _.length)
      val (body, locs) = assembleBody(codec, Seq(
        validity(Seq.fill(words.length)(true)),
        offsets.flatMap(o => leBytes(o.toLong, 4)).toArray,
        wordBytes.flatten.toArray))
      val (msg, metaLen, bodyLen) = message(2, { fb => // DictionaryBatch = 2
        val rbT = recordBatchTable(fb, words.length, Seq(0), locs, codec)
        fb.table(Seq(fb.SScalar(0, 1L, 8), fb.SRef(1, rbT)))
      }, body)
      val offset = out.size.toLong
      out.write(msg, 0, msg.length)
      MsgBlock(offset, metaLen, pad8(bodyLen).toLong)
    }
    val blocks = batches.map { ks =>
      val rows = ks.length
      // buffers, preorder per field: validity [+ offsets] + data
      val bufs = Vector.newBuilder[Array[Byte]]
      bufs += validity(Seq.fill(rows)(true)) // id
      bufs += ks.flatMap(k => leBytes(idVal(id, k), 8)).toArray
      bufs += validity(Seq.fill(rows)(true)) // title
      val titleBytes = ks.map(titleVal(id, _).getBytes("UTF-8"))
      val offsets = titleBytes.scanLeft(0)(_ + _.length)
      bufs += offsets.flatMap(o => leBytes(o.toLong, 4)).toArray
      bufs += titleBytes.flatten.toArray
      bufs += validity(Seq.fill(rows)(true)) // score
      bufs += ks.flatMap(k =>
        leBytes(java.lang.Double.doubleToLongBits(scoreVal(id, k)), 8)).toArray
      val flagValid = ks.map(k => !flagIsNull(id, k))
      bufs += validity(flagValid) // flag
      bufs += ks.flatMap(k =>
        leBytes((if (flagIsNull(id, k)) 0 else flagVal(id, k)).toLong & 0xffffffffL, 4)).toArray
      bufs += validity(Seq.fill(rows)(true)) // tag: validity + int32 indices
      bufs += ks.flatMap(k => leBytes(tagIdx(id, k).toLong, 4)).toArray
      val (body, locs) = assembleBody(codec, bufs.result())
      val nulls = Seq(0, 0, 0, flagValid.count(!_), 0)
      val (msg, metaLen, bodyLen) = message(3, { fb => // RecordBatch = 3
        recordBatchTable(fb, rows, nulls, locs, codec)
      }, body)
      val offset = out.size.toLong
      out.write(msg, 0, msg.length)
      MsgBlock(offset, metaLen, pad8(bodyLen).toLong)
    }
    // EOS
    out.write(Array[Byte](-1, -1, -1, -1), 0, 4)
    out.write(leBytes(0L, 4), 0, 4)
    (dictBlock, blocks)
  }

  private[ext] def renderArrow(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("ARROW1".getBytes("ISO-8859-1"), 0, 6)
    out.write(0); out.write(0)
    val (dictBlock, blocks) = writeMessages(out, id)
    // footer flatbuffer
    val fb = new FB
    val schema = buildSchema(fb)
    def blockBlob(bs: Seq[MsgBlock]): Array[Byte] = bs.flatMap(b =>
      leBytes(b.offset, 8) ++ leBytes(b.metaLen.toLong, 4) ++ leBytes(0L, 4) ++
        leBytes(b.bodyLen, 8)).toArray
    val dictVec = fb.structVector(1, blockBlob(Seq(dictBlock)))
    val rbVec = fb.structVector(blocks.length, blockBlob(blocks))
    val footerTable = fb.table(Seq(
      fb.SScalar(0, 4L, 2), // version V5
      fb.SRef(1, schema),
      fb.SRef(2, dictVec),
      fb.SRef(3, rbVec)))
    val footer = fb.finish(footerTable)
    out.write(footer, 0, footer.length)
    out.write(leBytes(footer.length.toLong, 4), 0, 4)
    out.write("ARROW1".getBytes("ISO-8859-1"), 0, 6)
    out.toByteArray
  }

  /** The STREAM format (`.arrows` — the wire/FIFO variant): exactly the
    * message section, no magic and no footer.
    */
  private[ext] def renderArrowStream(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeMessages(out, id)
    out.toByteArray
  }

  /** Fixture writer: one Arrow IPC file per document row. */
  def encodeArrow(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(idCol).cast("long"))
      .as[Long]
      .map(id => (id, renderArrow(id)))
      .toDF("doc_id", "arrow")
  }

  /** Fixture writer: one Arrow IPC STREAM per document row. */
  def encodeArrowStream(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(idCol).cast("long"))
      .as[Long]
      .map(id => (id, renderArrowStream(id)))
      .toDF("doc_id", "arrows")
  }

  // --------------------------------------------------------------- reader

  private final class MalformedArrow
      extends RuntimeException("malformed arrow", null, false, false)
  private def fail(): Nothing = throw new MalformedArrow

  /** Flatbuffers reader over b[base, limit). All positions absolute. */
  private final class FbReader(val b: Array[Byte], val base: Int, val limit: Int) {
    def u8(p: Int): Int = { if (p < base || p + 1 > limit) fail(); b(p) & 0xff }
    def u16(p: Int): Int = { if (p < base || p + 2 > limit) fail(); (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) }
    def i32(p: Int): Int = {
      if (p < base || p + 4 > limit) fail()
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    }
    def i64(p: Int): Long = {
      if (p < base || p + 8 > limit) fail()
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
      v
    }
    def root(): Int = {
      val r = base + i32(base)
      if (r < base || r >= limit) fail()
      r
    }
    /** Absolute position of a field's value, or -1 when absent. */
    def field(table: Int, slot: Int): Int = {
      val vt = table - i32(table) // soffset is signed
      if (vt < base || vt + 4 > limit) fail()
      val vtSize = u16(vt)
      val entry = 4 + 2 * slot
      if (entry + 2 > vtSize) return -1
      val off = u16(vt + entry)
      if (off == 0) -1 else table + off
    }
    def fieldI64(table: Int, slot: Int, default: Long): Long = {
      val p = field(table, slot); if (p < 0) default else i64(p)
    }
    def fieldI32(table: Int, slot: Int, default: Int): Int = {
      val p = field(table, slot); if (p < 0) default else i32(p)
    }
    def fieldI16(table: Int, slot: Int, default: Int): Int = {
      val p = field(table, slot); if (p < 0) default else u16(p)
    }
    def fieldU8(table: Int, slot: Int, default: Int): Int = {
      val p = field(table, slot); if (p < 0) default else u8(p)
    }
    def indirect(p: Int): Int = {
      val t = p + i32(p)
      if (t < base || t >= limit) fail()
      t
    }
    def fieldTable(table: Int, slot: Int): Int = {
      val p = field(table, slot); if (p < 0) -1 else indirect(p)
    }
    def string(p: Int): String = {
      val s = indirect(p)
      val len = i32(s)
      if (len < 0 || s + 4 + len > limit) fail()
      new String(b, s + 4, len, java.nio.charset.StandardCharsets.UTF_8)
    }
    /** (element count, absolute position of element 0). */
    def vector(p: Int, elemSize: Int): (Int, Int) = {
      val v = indirect(p)
      val len = i32(v)
      if (len < 0 || len > (1 << 24) || v + 4 + len.toLong * elemSize > limit) fail()
      (len, v + 4)
    }
  }

  /** `dictId` −1 = plain, ≥ 0 = dictionary-encoded with signed
    * `dictIdxWidth`-bit indices, −2 = a dictionary encoding whose index
    * type is outside the subset (unsigned / odd width) — metadata-only.
    */
  private final case class AField(name: String, nullable: Boolean, ctype: String,
    kind: Int, bitWidth: Int, signed: Boolean, nChildren: Int,
    dictId: Long, dictIdxWidth: Int)

  private def parseSchema(r: FbReader, schemaTable: Int): Seq[AField] = {
    val fv = r.field(schemaTable, 1)
    if (fv < 0) return Seq.empty
    val (count, at) = r.vector(fv, 4)
    (0 until count).map { i =>
      val f = r.indirect(at + 4 * i)
      val nameP = r.field(f, 0)
      val name = if (nameP < 0) "" else r.string(nameP)
      val nullable = r.fieldU8(f, 1, 0) != 0
      val typeTag = r.fieldU8(f, 2, 0)
      val typeT = r.fieldTable(f, 3)
      val childrenP = r.field(f, 5)
      val nChildren = if (childrenP < 0) 0 else r.vector(childrenP, 4)._1
      val (ctype, bw, signed) = typeTag match {
        case 2 =>
          if (typeT < 0) fail()
          val w = r.fieldI32(typeT, 0, 0)
          val s = r.fieldU8(typeT, 1, 0) != 0
          ((if (s) s"INT$w" else s"UINT$w"), w, s)
        case 3 =>
          if (typeT < 0) fail()
          r.fieldI16(typeT, 0, 0) match {
            case 0 => ("FLOAT16", 16, true)
            case 1 => ("FLOAT32", 32, true)
            case _ => ("FLOAT64", 64, true)
          }
        case 5 => ("UTF8", 0, true)
        case 6 => ("BOOL", 1, false)
        case 4 => ("BINARY", 0, false)
        case 10 => ("TIMESTAMP", 64, true)
        case 12 => ("LIST", 0, false)
        case 13 => ("STRUCT", 0, false)
        case other => (s"TYPE_$other", 0, false)
      }
      // DictionaryEncoding: id + index type (spec default int32 signed)
      val dictT = r.fieldTable(f, 4)
      val (dictId, idxW) =
        if (dictT < 0) (-1L, 0)
        else {
          val id = r.fieldI64(dictT, 0, 0L)
          val it = r.fieldTable(dictT, 1)
          val w = if (it < 0) 32 else r.fieldI32(it, 0, 0)
          val s = if (it < 0) true else r.fieldU8(it, 1, 0) != 0
          if (id < 0 || !s || (w != 8 && w != 16 && w != 32 && w != 64)) (-2L, 0)
          else (id, w)
        }
      AField(name, nullable, ctype, typeTag, bw, signed, nChildren, dictId, idxW)
    }
  }

  final case class ArrowColStat(
    doc_id: Long, batch: Long, col_idx: Long, name: String,
    ctype: String, nullable: Boolean, n_rows: Long, null_count: Long,
    vtype: String, i_sum: Option[Long], r_sum: Option[Double],
    s_bytes: Option[Long], s_checksum: Option[Long])

  private val MaxRows = 1 << 22
  private val MaxBufBytes = 1 << 26

  /** Decoded per-column aggregate: (vtype, i_sum, r_sum, s_bytes, s_checksum). */
  private type ColAgg = (String, Option[Long], Option[Double], Option[Long], Option[Long])

  private def le32At(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  private def leAt(b: Array[Byte], p: Int, w: Int): Long = {
    var u = 0L
    var j = w - 1
    while (j >= 0) { u = (u << 8) | (b(p + j) & 0xffL); j -= 1 }
    u
  }

  /** Validity predicate over a MATERIALIZED validity buffer (empty =
    * all valid, which contradicts a positive null count).
    */
  private def mkValid(v: Array[Byte], rows: Int, nullCount: Long): Int => Boolean =
    if (v.length == 0) { if (nullCount > 0) fail(); _ => true }
    else {
      if (v.length < (rows + 7) / 8) fail()
      i => ((v(i / 8) >> (i % 8)) & 1) != 0
    }

  /** Aggregate one PLAIN column from its materialized non-validity
    * buffers; None = type outside the decode subset.
    */
  private def aggPlain(f: AField, rows: Int, valid: Int => Boolean,
      bufs: Seq[Array[Byte]]): Option[ColAgg] =
    f.kind match {
      case 2 if f.bitWidth == 8 || f.bitWidth == 16 || f.bitWidth == 32 || f.bitWidth == 64 =>
        val d = bufs.head
        val w = f.bitWidth / 8
        if (d.length.toLong < rows.toLong * w) fail()
        var sum = 0L
        var i = 0
        while (i < rows) {
          if (valid(i)) {
            val u = leAt(d, i * w, w)
            // sign-extend signed ints narrower than 64 bits
            sum += (if (f.signed && f.bitWidth < 64) (u << (64 - f.bitWidth)) >> (64 - f.bitWidth) else u)
          }
          i += 1
        }
        Some(("i", Some(sum), None, None, None))
      case 3 if f.bitWidth == 32 || f.bitWidth == 64 =>
        val d = bufs.head
        val w = f.bitWidth / 8
        if (d.length.toLong < rows.toLong * w) fail()
        var sum = 0.0
        var i = 0
        while (i < rows) {
          if (valid(i)) {
            val u = leAt(d, i * w, w)
            sum += (if (f.bitWidth == 32) java.lang.Float.intBitsToFloat(u.toInt).toDouble
            else java.lang.Double.longBitsToDouble(u))
          }
          i += 1
        }
        Some(("f", None, Some(sum), None, None))
      case 5 =>
        val offs = bufs.head
        val d = bufs(1)
        if (offs.length.toLong < (rows + 1).toLong * 4) fail()
        var ck = 0L
        var nb = 0L
        var i = 0
        while (i < rows) {
          val s = le32At(offs, 4 * i)
          val e = le32At(offs, 4 * (i + 1))
          if (s < 0 || e < s || e > d.length) fail()
          if (valid(i)) {
            var p = s
            while (p < e) { ck = (ck * 31 + (d(p) & 0xff)) % 1000000007L; p += 1 }
            nb += e - s
          }
          i += 1
        }
        Some(("s", None, None, Some(nb), Some(ck)))
      case _ => None
    }

  /** Materialize one column's actual VALUES (the dictionary-batch path —
    * dictionaries are small by nature); None = unsupported value type.
    */
  private def columnValues(f: AField, rows: Int, valid: Int => Boolean,
      bufs: Seq[Array[Byte]]): Option[Vector[Any]] =
    f.kind match {
      case 2 if f.bitWidth == 8 || f.bitWidth == 16 || f.bitWidth == 32 || f.bitWidth == 64 =>
        val d = bufs.head
        val w = f.bitWidth / 8
        if (d.length.toLong < rows.toLong * w) fail()
        Some((0 until rows).map { i =>
          val u = leAt(d, i * w, w)
          (if (f.signed && f.bitWidth < 64) (u << (64 - f.bitWidth)) >> (64 - f.bitWidth) else u): Any
        }.toVector)
      case 3 if f.bitWidth == 32 || f.bitWidth == 64 =>
        val d = bufs.head
        val w = f.bitWidth / 8
        if (d.length.toLong < rows.toLong * w) fail()
        Some((0 until rows).map { i =>
          val u = leAt(d, i * w, w)
          (if (f.bitWidth == 32) java.lang.Float.intBitsToFloat(u.toInt).toDouble
          else java.lang.Double.longBitsToDouble(u)): Any
        }.toVector)
      case 5 =>
        val offs = bufs.head
        val d = bufs(1)
        if (offs.length.toLong < (rows + 1).toLong * 4) fail()
        Some((0 until rows).map { i =>
          val s = le32At(offs, 4 * i)
          val e = le32At(offs, 4 * (i + 1))
          if (s < 0 || e < s || e > d.length) fail()
          new String(d, s, e - s, java.nio.charset.StandardCharsets.UTF_8): Any
        }.toVector)
      case _ => None
    }

  /** Aggregate one DICTIONARY-ENCODED column: decode its indices, look
    * each up in the decoded dictionary, aggregate by the VALUE type.
    */
  private def aggDict(f: AField, rows: Int, valid: Int => Boolean,
      idxBuf: Array[Byte], dict: Vector[Any]): Option[ColAgg] = {
    val w = f.dictIdxWidth / 8
    if (idxBuf.length.toLong < rows.toLong * w) fail()
    def idxAt(i: Int): Int = {
      val u = leAt(idxBuf, i * w, w)
      val v = if (f.dictIdxWidth < 64) (u << (64 - f.dictIdxWidth)) >> (64 - f.dictIdxWidth) else u
      if (v < 0 || v >= dict.length) fail()
      v.toInt
    }
    f.kind match {
      case 2 =>
        var sum = 0L
        var i = 0
        while (i < rows) { if (valid(i)) sum += dict(idxAt(i)).asInstanceOf[Long]; i += 1 }
        Some(("i", Some(sum), None, None, None))
      case 3 =>
        var sum = 0.0
        var i = 0
        while (i < rows) { if (valid(i)) sum += dict(idxAt(i)).asInstanceOf[Double]; i += 1 }
        Some(("f", None, Some(sum), None, None))
      case 5 =>
        var ck = 0L
        var nb = 0L
        var i = 0
        while (i < rows) {
          if (valid(i)) {
            val b = dict(idxAt(i)).asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var p = 0
            while (p < b.length) { ck = (ck * 31 + (b(p) & 0xff)) % 1000000007L; p += 1 }
            nb += b.length
          }
          i += 1
        }
        Some(("s", None, None, Some(nb), Some(ck)))
      case _ => None
    }
  }

  private[ext] def parseArrow(id: Long, bytes: Array[Byte]): Seq[ArrowColStat] = {
    val n = Option(bytes).map(_.length).getOrElse(fail())
    if (n < 8 + 4 + 6) fail()
    def magicAt(p: Int, len: Int): Boolean =
      "ARROW1".getBytes("ISO-8859-1").take(len).zipWithIndex.forall { case (c, i) => bytes(p + i) == c }
    if (!magicAt(0, 6) || bytes(6) != 0 || bytes(7) != 0) fail()
    if (!magicAt(n - 6, 6)) fail()
    val fLen = (bytes(n - 10) & 0xff) | ((bytes(n - 9) & 0xff) << 8) |
      ((bytes(n - 8) & 0xff) << 16) | ((bytes(n - 7) & 0xff) << 24)
    if (fLen <= 0 || fLen > n - 10 - 8) fail()
    val fStart = n - 10 - fLen
    val fr = new FbReader(bytes, fStart, n - 10)
    val footer = fr.root()
    val schemaT = fr.fieldTable(footer, 1)
    if (schemaT < 0) fail()
    val fields = parseSchema(fr, schemaT)
    if (fields.isEmpty) fail()
    def footerBlocks(slot: Int): Seq[(Long, Int, Long)] = {
      val p = fr.field(footer, slot)
      if (p < 0) Seq.empty
      else {
        val (count, at) = fr.vector(p, 24)
        (0 until count).map { i =>
          val q = at + 24 * i
          (fr.i64(q), fr.i32(q + 8), fr.i64(q + 16))
        }
      }
    }
    val dictBlocks = footerBlocks(2)
    val blocks = footerBlocks(3)
    decodeBatches(id, bytes, fields, dictBlocks, blocks, fStart.toLong)
  }

  /** Decode dictionary batches then record batches — shared by the FILE
    * format (blocks from the footer, `bound` = footer start) and the
    * STREAM format (blocks from the sequential walk, `bound` = length).
    */
  private def decodeBatches(id: Long, bytes: Array[Byte], fields: Seq[AField],
      dictBlocks: Seq[(Long, Int, Long)], blocks: Seq[(Long, Int, Long)],
      bound: Long): Seq[ArrowColStat] = {

    // ---- one encapsulated message: bounds + framing + flatbuffer root
    def openMessage(off: Long, metaLen: Int, bodyLen: Long): (FbReader, Int) = {
      // per-term bounds BEFORE the sum (the bufSlice rule): huge positive
      // i64s can wrap their sum negative and slip past the combined check
      if (off < 8 || metaLen < 12 || bodyLen < 0 ||
        off > bound || metaLen > bound || bodyLen > bound ||
        off + metaLen + bodyLen > bound) fail()
      val o = off.toInt
      // continuation marker + metadata length
      val hasCont = bytes(o) == -1 && bytes(o + 1) == -1 && bytes(o + 2) == -1 && bytes(o + 3) == -1
      val mStart = if (hasCont) o + 8 else o + 4 // pre-V5 framing has no marker
      val mr = new FbReader(bytes, mStart, o + metaLen)
      (mr, mr.root())
    }

    /** The open RecordBatch table + its body extent + buffer access.
      * `codec` None = BodyCompression present but outside the subset.
      */
    final case class OpenRb(mr: FbReader, rows: Long, nNodes: Int, nodesAt: Int,
        codec: Option[Int], getBuf: Int => Array[Byte]) {
      def node(i: Int): (Long, Long) =
        (mr.i64(nodesAt + 16 * i), mr.i64(nodesAt + 16 * i + 8))
    }
    def openRb(mr: FbReader, rb: Int, off: Long, metaLen: Int, bodyLen: Long): OpenRb = {
      val rows = mr.fieldI64(rb, 0, -1L)
      if (rows < 0 || rows > MaxRows) fail()
      val nodesP = mr.field(rb, 1)
      val bufsP = mr.field(rb, 2)
      if (nodesP < 0 || bufsP < 0) fail()
      val (nNodes, nodesAt) = mr.vector(nodesP, 16)
      val (nBufs, bufsAt) = mr.vector(bufsP, 16)
      val bodyStart = off + metaLen
      val codec: Option[Int] = {
        val bc = mr.fieldTable(rb, 3)
        if (bc < 0) Some(-1)
        else {
          val c = mr.fieldU8(bc, 0, 0)
          val m = mr.fieldU8(bc, 1, 0)
          if (m != 0 || c > 1) None else Some(c) // method BUFFER; LZ4_FRAME/ZSTD
        }
      }
      def bufSlice(i: Int): (Long, Long) = {
        if (i >= nBufs) fail()
        val p = bufsAt + 16 * i
        val bo = mr.i64(p)
        val bl = mr.i64(p + 8)
        // each term individually first (mirroring the ORC stripe bounds):
        // two huge positive i64s can wrap their SUM past Long.MAX to a
        // negative that passes the combined check, and the later .toInt
        // truncation would then read in-bounds garbage instead of failing
        if (bo < 0 || bl < 0 || bo > bodyLen || bl > bodyLen || bo + bl > bodyLen) fail()
        (bodyStart + bo, bl)
      }
      // materialize a buffer: decompress under the batch codec (each
      // non-empty buffer carries an i64 uncompressed-length prefix; −1
      // marks a raw body the writer left uncompressed)
      def getBuf(i: Int): Array[Byte] = {
        val (bo, bl) = bufSlice(i)
        if (bl == 0) Array.emptyByteArray
        else codec match {
          case Some(-1) | None =>
            java.util.Arrays.copyOfRange(bytes, bo.toInt, (bo + bl).toInt)
          case Some(c) =>
            if (bl < 8) fail()
            val ulen = leAt(bytes, bo.toInt, 8)
            if (ulen == -1L) java.util.Arrays.copyOfRange(bytes, bo.toInt + 8, (bo + bl).toInt)
            else {
              if (ulen < 0 || ulen > MaxBufBytes) fail()
              val d =
                try {
                  if (c == 0) Lz4.frameDecompress(bytes, bo.toInt + 8, (bo + bl).toInt, ulen.toInt)
                  else Zstd.decompress(
                    java.util.Arrays.copyOfRange(bytes, bo.toInt + 8, (bo + bl).toInt), ulen.toInt)
                } catch { case scala.util.control.NonFatal(_) => fail() }
              if (d.length.toLong != ulen) fail() // a short stream is damage
              d
            }
        }
      }
      OpenRb(mr, rows, nNodes, nodesAt, codec, getBuf)
    }

    def bufCountOf(f: AField): Int =
      if (f.dictId != -1L) 2 // validity + indices, whatever the value type
      else f.kind match {
        case 2 | 3 | 6 | 10 => 2 // validity + data
        case 4 | 5 => 3 // validity + offsets + data
        case _ => -1
      }

    // ---- dictionaries decode first (the spec orders them before use)
    val dicts = scala.collection.mutable.Map.empty[Long, Vector[Any]]
    val dictBad = scala.collection.mutable.Set.empty[Long]
    dictBlocks.foreach { case (off, metaLen, bodyLen) =>
      val (mr, msg) = openMessage(off, metaLen, bodyLen)
      if (mr.fieldU8(msg, 1, 0) != 2) fail() // not a DictionaryBatch block
      val db = mr.fieldTable(msg, 2)
      if (db < 0) fail()
      val dictId = mr.fieldI64(db, 0, 0L)
      if (dictId < 0) fail()
      val rbT = mr.fieldTable(db, 1)
      if (rbT < 0) fail()
      val isDelta = mr.fieldU8(db, 2, 0) != 0
      if (isDelta) dictBad += dictId // delta dictionaries: out of subset
      else fields.find(_.dictId == dictId) match {
        case None => () // a dictionary nothing references: skip, like a real reader
        case Some(vf) =>
          val o = openRb(mr, rbT, off, metaLen, bodyLen)
          val rowsI = o.rows.toInt
          val supported = o.codec.isDefined && o.nNodes >= 1 && {
            val (len0, nulls0) = o.node(0)
            // null dictionary ENTRIES are representable but rare — out of subset
            len0 == o.rows && nulls0 == 0
          }
          if (!supported) dictBad += dictId
          else {
            val nBufs = bufCountOf(vf.copy(dictId = -1L))
            if (nBufs < 0) dictBad += dictId
            else {
              val valid = mkValid(o.getBuf(0), rowsI, 0L)
              columnValues(vf, rowsI, valid, (1 until nBufs).map(o.getBuf)) match {
                case Some(vals) => dicts(dictId) = vals
                case None => dictBad += dictId
              }
            }
          }
      }
    }
    // a referenced dictionary that never arrived is structural damage
    fields.foreach { f =>
      if (f.dictId >= 0 && !dicts.contains(f.dictId) && !dictBad.contains(f.dictId)) fail()
    }

    blocks.zipWithIndex.flatMap { case ((off, metaLen, bodyLen), bi) =>
      val (mr, msg) = openMessage(off, metaLen, bodyLen)
      if (mr.fieldU8(msg, 1, 0) != 3) fail() // not a RecordBatch block
      val rb = mr.fieldTable(msg, 2)
      if (rb < 0) fail()
      val o = openRb(mr, rb, off, metaLen, bodyLen)
      val rows = o.rows
      val bufCounts = fields.map(bufCountOf)
      // the decode subset holds flat schemas under known codecs only;
      // anything else surfaces metadata rows WITHOUT buffer accounting —
      // never a misattributed buffer
      val flat = fields.forall(_.nChildren == 0)
      if (o.codec.isEmpty || !flat || o.nNodes < fields.length || bufCounts.contains(-1)) {
        fields.zipWithIndex.map { case (f, ci) =>
          ArrowColStat(id, bi.toLong, ci.toLong, f.name, f.ctype, f.nullable,
            rows, -1L, "m", None, None, None, None)
        }
      } else {
        var bufIdx = 0
        fields.zipWithIndex.map { case (f, ci) =>
          val (nodeLen, nullCount) = o.node(ci)
          if (nodeLen != rows || nullCount < 0 || nullCount > rows) fail()
          val nBuffersOf = bufCounts(ci)
          val vBuf = o.getBuf(bufIdx)
          val rest = (1 until nBuffersOf).map(j => o.getBuf(bufIdx + j))
          bufIdx += nBuffersOf
          val rowsI = rows.toInt
          val valid = mkValid(vBuf, rowsI, nullCount)
          val decoded: Option[ColAgg] =
            if (f.dictId == -2L) None // unsupported index type: metadata-only
            else if (f.dictId >= 0L) {
              if (dictBad.contains(f.dictId)) None
              else aggDict(f, rowsI, valid, rest.head, dicts(f.dictId))
            } else aggPlain(f, rowsI, valid, rest)
          decoded match {
            case Some((vt, is, rs, sb, sc)) =>
              ArrowColStat(id, bi.toLong, ci.toLong, f.name, f.ctype, f.nullable,
                rows, nullCount, vt, is, rs, sb, sc)
            case None =>
              ArrowColStat(id, bi.toLong, ci.toLong, f.name, f.ctype, f.nullable,
                rows, nullCount, "m", None, None, None, None)
          }
        }
      }
    }
  }

  /** Parse the STREAM format: a sequential walk — the schema message
    * first, then dictionary and record batches in arrival order, the
    * EOS marker, and nothing after it. Decoding is the file format's,
    * byte for byte; only the framing differs (no magic, no footer —
    * batch extents come from each message's own header).
    */
  private[ext] def parseArrowStream(id: Long, bytes: Array[Byte]): Seq[ArrowColStat] = {
    val n = Option(bytes).map(_.length).getOrElse(fail())
    var p = 0
    var fields: Seq[AField] = null
    val dictBlocks = Vector.newBuilder[(Long, Int, Long)]
    val blocks = Vector.newBuilder[(Long, Int, Long)]
    var sawBatch = false
    var eos = false
    while (!eos) {
      if (p + 4 > n) fail() // the stream must END with an explicit EOS
      val w0 = le32At(bytes, p)
      val lenPos = if (w0 == -1) p + 4 else p // pre-V5 framing has no marker
      if (lenPos + 4 > n) fail()
      val metaLen = le32At(bytes, lenPos)
      if (metaLen == 0) { eos = true; p = lenPos + 4 }
      else {
        if (metaLen < 0 || metaLen > n - (lenPos + 4)) fail()
        val mStart = lenPos + 4
        val mr = new FbReader(bytes, mStart, mStart + metaLen)
        val msg = mr.root()
        val htype = mr.fieldU8(msg, 1, 0)
        val bodyLen = mr.fieldI64(msg, 3, 0L)
        if (bodyLen < 0 || bodyLen > n - (mStart + metaLen)) fail()
        val totalMeta = mStart + metaLen - p
        htype match {
          case 1 => // schema: exactly one, first
            if (fields != null || sawBatch) fail()
            if (bodyLen != 0) fail()
            val schemaT = mr.fieldTable(msg, 2)
            if (schemaT < 0) fail()
            fields = parseSchema(mr, schemaT)
            if (fields.isEmpty) fail()
          case 2 => sawBatch = true; dictBlocks += ((p.toLong, totalMeta, bodyLen))
          case 3 => sawBatch = true; blocks += ((p.toLong, totalMeta, bodyLen))
          case _ => fail() // unknown message kinds are damage
        }
        p = mStart + metaLen + bodyLen.toInt
      }
    }
    if (p != n) fail() // trailing bytes after EOS are damage
    if (fields == null) fail()
    decodeBatches(id, bytes, fields, dictBlocks.result(), blocks.result(), n.toLong)
  }

  private[ext] def parseArrowStreamSafe(id: Long, bytes: Array[Byte]): Seq[ArrowColStat] =
    try parseArrowStream(id, bytes)
    catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** `arrow_stream`: the stream-format twin of [[arrowBatches]]. */
  def arrowStream(docs: DataFrame, idCol: String = "doc_id",
                  binCol: String = "arrows"): Dataset[ArrowColStat] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) => if (b == null) Nil else parseArrowStreamSafe(id, b) }
  }

  private[ext] def parseArrowSafe(id: Long, bytes: Array[Byte]): Seq[ArrowColStat] =
    try parseArrow(id, bytes)
    catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** `arrow_batches`: batch walk + decoded-value statistics of every
    * column of every record batch. Map-only.
    */
  def arrowBatches(docs: DataFrame, idCol: String = "doc_id",
                   binCol: String = "arrow"): Dataset[ArrowColStat] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) => if (b == null) Nil else parseArrowSafe(id, b) }
  }
}
