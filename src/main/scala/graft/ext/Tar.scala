package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== REAL container codec: POSIX ustar TAR (+ .tar.gz) ========
  *
  * The other half of the dataset-bundle story next to [[Zip]]: tarballs
  * are how academic corpora and model checkpoints ship. From scratch on
  * both sides. The writer emits strictly conforming ustar — 512-byte
  * headers with octal fields, the space-normalized header checksum,
  * name/prefix splitting for deep paths, interleaved directory entries,
  * both '0' and NUL ("old tar") file typeflags, two-zero-block
  * terminator — so the reader's every branch sits under the oracled
  * path. The reader walks blocks strictly: magic check (accepting the
  * POSIX "ustar\0 00" and GNU "ustar  \0" spellings), checksum
  * re-derivation (unsigned per POSIX, with the historic signed-byte sum
  * also accepted), octal parse tolerant of leading spaces and NUL/space
  * termination, data rounded up to block size, non-file entries skipped
  * structurally.
  *
  * `.tar.gz` is decoded by composition — the gzip member walk from
  * [[Archives]] feeds the same tar parser — because at 100 TB the
  * container stack IS a composition pipeline, not a monolithic codec.
  *
  * Scale shape: archives are rows; both decode paths are map-only
  * flatMaps (zero shuffles); damage drops the one affected archive.
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * container path; north-star crawl-ingestion scope.
  */
object Tar {

  private final class MalformedTar extends RuntimeException("malformed tar", null, false, false)

  private def utf8(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private val BLOCK = 512

  // ------------------------------------------------------------- writer

  /** Write an octal field of `width` bytes: digits, NUL terminator,
    * space-padded on the left (the classic tar spelling).
    */
  private def octal(buf: Array[Byte], off: Int, width: Int, v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    val digits = math.min(s.length, width - 1)
    val start = off + width - 1 - digits
    var i = 0
    while (i < digits) { buf(start + i) = s.charAt(s.length - digits + i).toByte; i += 1 }
    java.util.Arrays.fill(buf, off, start, ' '.toByte)
    buf(off + width - 1) = 0
  }

  private def putStr(buf: Array[Byte], off: Int, width: Int, s: String): Unit = {
    val b = utf8(s)
    if (b.length > width) throw new MalformedTar
    System.arraycopy(b, 0, buf, off, b.length)
  }

  private def header(name: String, prefix: String, size: Long, mtime: Long,
      typeflag: Byte): Array[Byte] = {
    val h = new Array[Byte](BLOCK)
    putStr(h, 0, 100, name)
    octal(h, 100, 8, 420)  // mode 0644
    octal(h, 108, 8, 0)    // uid
    octal(h, 116, 8, 0)    // gid
    octal(h, 124, 12, size)
    octal(h, 136, 12, mtime)
    h(156) = typeflag
    putStr(h, 257, 6, "ustar")
    h(262) = 0
    h(263) = '0'; h(264) = '0'
    putStr(h, 265, 32, "graft")
    putStr(h, 297, 32, "graft")
    octal(h, 329, 8, 0) // devmajor
    octal(h, 337, 8, 0) // devminor
    putStr(h, 345, 155, prefix)
    // checksum: sum with the checksum field as spaces; 6 octal + NUL + space
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < BLOCK) { sum += (h(i) & 0xff); i += 1 }
    val s = java.lang.Long.toOctalString(sum)
    val pad = 6 - s.length
    var j = 0
    while (j < pad) { h(148 + j) = '0'; j += 1 }
    while (j < 6) { h(148 + j) = s.charAt(j - pad).toByte; j += 1 }
    h(154) = 0; h(155) = ' '
    h
  }

  /** Pack documents into `nArchives` ustar tarballs (doc order by id).
    * Profile per id: `% 4 == 1` entries live under a directory spelled
    * via the ustar prefix field (with the directory entry itself
    * interleaved, which the reader must skip); `% 3 == 2` entries use
    * the NUL "old tar" typeflag instead of '0'; mtime varies with the
    * id so the octal parse sees many widths.
    */
  def encodeTarArchives(docs: DataFrame, nArchives: Int = 16, gzipped: Boolean = false,
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
        val out = new java.io.ByteArrayOutputStream()
        recs.foreach { case (id, text) =>
          val data = utf8(text)
          val tf: Byte = if (id % 3 == 2) 0 else '0'
          if (id % 4 == 1) {
            out.write(header(s"dir$id/", "", 0, 1700000000L + id, '5'))
            out.write(header(s"d$id.txt", s"dir$id", data.length.toLong, 1700000000L + id, tf))
          } else {
            out.write(header(s"d$id.txt", "", data.length.toLong, 1700000000L + id, tf))
          }
          out.write(data)
          val rem = data.length % BLOCK
          if (rem != 0) out.write(new Array[Byte](BLOCK - rem))
        }
        out.write(new Array[Byte](2 * BLOCK))
        val tar = out.toByteArray
        val payload = if (gzipped) Archives.gzipMember(tar, (aid % 4).toInt, aid, method = (aid % 3).toInt) else tar
        (aid, payload)
      }
      .toDF("archive_id", "payload")
  }

  // ------------------------------------------------------------- reader

  private def parseOctal(b: Array[Byte], off: Int, width: Int): Long = {
    var i = off
    val end = off + width
    while (i < end && (b(i) == ' '.toByte)) i += 1
    var v = 0L
    var any = false
    while (i < end && b(i) != 0 && b(i) != ' '.toByte) {
      val c = b(i) - '0'
      if (c < 0 || c > 7) throw new MalformedTar
      v = v * 8 + c
      if (v < 0) throw new MalformedTar
      any = true
      i += 1
    }
    if (!any) throw new MalformedTar
    v
  }

  private def cstr(b: Array[Byte], off: Int, width: Int): String = {
    var end = off
    val max = off + width
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  final case class TarEntry(
      archive_id: Long, rec_idx: Long, rec_doc_id: Long, n_bytes: Long, checksum: Long)

  private def rollingChecksum(data: Array[Byte], from: Int, until: Int): Long = {
    var c = 0L
    var i = from
    while (i < until) { c = (c * 31 + (data(i) & 0xff)) % 1000000007L; i += 1 }
    c
  }

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    val end = off + BLOCK
    while (i < end) { if (b(i) != 0) return false; i += 1 }
    true
  }

  private[ext] def parseTar(aid: Long, b: Array[Byte], maxEntryBytes: Int): Seq[TarEntry] = {
    if (b.length % BLOCK != 0) throw new MalformedTar
    val entries = Array.newBuilder[TarEntry]
    var p = 0
    var idx = 0
    var done = false
    while (!done) {
      if (p + BLOCK > b.length) throw new MalformedTar // ran off the end without terminator
      if (isZeroBlock(b, p)) {
        // terminator: a second zero block must close the archive
        if (p + 2 * BLOCK > b.length || !isZeroBlock(b, p + BLOCK)) throw new MalformedTar
        done = true
      } else {
        // magic: POSIX "ustar\0" + version "00", or GNU "ustar  \0"
        val posix = b(p + 257) == 'u' && b(p + 258) == 's' && b(p + 259) == 't' &&
          b(p + 260) == 'a' && b(p + 261) == 'r' && b(p + 262) == 0 &&
          b(p + 263) == '0' && b(p + 264) == '0'
        val gnu = b(p + 257) == 'u' && b(p + 258) == 's' && b(p + 259) == 't' &&
          b(p + 260) == 'a' && b(p + 261) == 'r' && b(p + 262) == ' ' &&
          b(p + 263) == ' ' && b(p + 264) == 0
        if (!posix && !gnu) throw new MalformedTar
        val stored = parseOctal(b, p + 148, 8)
        var unsigned = 0L
        var signed = 0L
        var i = 0
        while (i < BLOCK) {
          val raw = if (i >= 148 && i < 156) ' '.toByte else b(p + i)
          unsigned += (raw & 0xff)
          signed += raw
          i += 1
        }
        if (stored != unsigned && stored != signed) throw new MalformedTar
        val size = parseOctal(b, p + 124, 12)
        if (size > maxEntryBytes) throw new MalformedTar
        val dataBlocks = ((size + BLOCK - 1) / BLOCK).toInt
        val dataStart = p + BLOCK
        if (dataStart + dataBlocks * BLOCK > b.length) throw new MalformedTar
        val tf = b(p + 156)
        if (tf == '0'.toByte || tf == 0) {
          val name = cstr(b, p, 100)
          val prefix = cstr(b, p + 345, 155)
          val path = if (prefix.nonEmpty) s"$prefix/$name" else name
          val base = path.substring(path.lastIndexOf('/') + 1)
          val docId =
            if (base.startsWith("d") && base.endsWith(".txt"))
              try base.substring(1, base.length - 4).toLong
              catch { case _: NumberFormatException => throw new MalformedTar }
            else throw new MalformedTar
          entries += TarEntry(aid, idx.toLong, docId, size,
            rollingChecksum(b, dataStart, dataStart + size.toInt))
          idx += 1
        } // directories and other types: structurally skipped
        p = dataStart + dataBlocks * BLOCK
      }
    }
    entries.result().toSeq
  }

  /** Decode plain tarballs, map-only; damaged archives drop whole. */
  def tarExtract(archives: DataFrame, maxEntryBytes: Int = 1 << 26): Dataset[TarEntry] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives
      .select(col("archive_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, payload) =>
        try parseTar(aid, payload, maxEntryBytes)
        catch { case scala.util.control.NonFatal(_) => Nil }
      }
  }

  /** Wrap each archive payload in an xz stream ([[Xz.compress]] — the
    * real greedy-LZMA encoder, multi-block) —
    * the `.tar.xz` fixture writer, composing the two codecs exactly the
    * way `dist` tarballs do on disk.
    */
  def xzWrap(archives: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives
      .select(col("archive_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (aid, p) => (aid, Xz.compress(p)) }
      .toDF("archive_id", "payload")
  }

  /** Decode `.tar.xz` archives: the full xz container/LZMA2 stack
    * (multistream-aware) feeding the same strict tar parser — the
    * layering contract `tgz_extract` established for gzip, on the
    * container modern dist tarballs actually use.
    */
  def txzExtract(archives: DataFrame, maxArchiveBytes: Int = 1 << 28): Dataset[TarEntry] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives
      .select(col("archive_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, payload) =>
        try {
          val streams = Xz.decompressStreams(payload, maxArchiveBytes)
          val total = streams.map(_.length).sum
          val tar = new Array[Byte](total)
          var off = 0
          streams.foreach { m => System.arraycopy(m, 0, tar, off, m.length); off += m.length }
          parseTar(aid, tar, maxArchiveBytes)
        } catch { case scala.util.control.NonFatal(_) => Nil }
      }
  }

  /** Wrap each tar archive as `archive.tar.Z` — Unix compress(1) over
    * the whole tarball, the pre-gzip distribution convention. maxbits
    * cycles by archive id so the decoder's width ladder is exercised at
    * every top width the on-disk flag allows.
    */
  def zWrap(archives: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives
      .select(col("archive_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (aid, p) =>
        // floorMod: a negative archive id must not drive maxbits below
        // the format's floor of 9 (an uncaught require would abort the
        // job instead of the family's quarantine convention)
        (aid, UnixCompress.compress(p, maxbits = 12 + java.lang.Math.floorMod(aid, 5L).toInt))
      }
      .toDF("archive_id", "payload")
  }

  /** Decode `.tar.Z` archives: the from-scratch compress(1) LZW decoder
    * ([[UnixCompress]] — group realign, burned slot, width ladder)
    * feeding the same strict tar parser; the layering contract
    * `tgz_extract`/`txz_extract` established, on the container the
    * oldest mirrors actually use. Damage quarantines the archive whole.
    */
  def tazExtract(archives: DataFrame, maxArchiveBytes: Int = 1 << 28): Dataset[TarEntry] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives
      .select(col("archive_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, payload) =>
        try parseTar(aid, UnixCompress.decompress(payload, maxArchiveBytes), maxArchiveBytes)
        catch { case scala.util.control.NonFatal(_) => Nil }
      }
  }

  /** Decode `.tar.gz` archives: gzip member walk (all header variants,
    * multi-member concatenation) feeding the same strict tar parser.
    */
  def tgzExtract(archives: DataFrame, maxArchiveBytes: Int = 1 << 28): Dataset[TarEntry] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives
      .select(col("archive_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, payload) =>
        try {
          Archives.gunzipAll(payload, maxArchiveBytes) match {
            case Some(members) =>
              val total = members.map(_.length).sum
              val tar = new Array[Byte](total)
              var off = 0
              members.foreach { m => System.arraycopy(m, 0, tar, off, m.length); off += m.length }
              parseTar(aid, tar, maxArchiveBytes)
            case None => Nil
          }
        } catch { case scala.util.control.NonFatal(_) => Nil }
      }
  }
}
