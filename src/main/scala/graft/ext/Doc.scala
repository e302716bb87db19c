package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Legacy Word binary (.doc) ingestion — the OLDEST and still-enormous
  * slice of the office-document shelf (everything authored 1997-2007,
  * and everything "Save As 97-2003" since).
  *
  * Two layered from-scratch parsers, each a public spec:
  *
  *  - '''CFB container''' (MS-CFB, the OLE2 compound file): 512-byte
  *    sectors behind a header carrying the DIFAT (109 in-header entries
  *    plus chained DIFAT sectors, both supported with caps), the FAT
  *    (sector chains, walked with a visited-set cycle guard), the
  *    directory (128-byte entries, UTF-16 names, left/right/child
  *    sibling tree), and the MINI layer: streams under the 4096-byte
  *    cutoff live as 64-byte mini sectors inside the root entry's
  *    "mini stream" chain, located through the separate miniFAT — the
  *    fixture's Table stream rides exactly this path, the WordDocument
  *    stream the regular-FAT multi-sector path, so both layers grade.
  *  - '''Word binary''' (MS-DOC): the FIB parsed SELF-DESCRIBINGLY —
  *    `csw`/`cslw`/`cbRgFcLcb` counts walked rather than absolute
  *    offsets hard-coded — `ccpText` from FibRgLw97 slot 3, the
  *    `fWhichTblStm` flag choosing 0Table vs 1Table, `fcClx`/`lcbClx`
  *    from FcLcb pair 33; then the piece table from the Table stream's
  *    Clx (leading Prc clauses skipped, the Pcdt's PlcPcd decoded: n+1
  *    ascending CPs ending exactly at ccpText, n PCDs whose fc word
  *    carries the `fCompressed` bit — a compressed piece is cp1252 at
  *    `fc/2`, an uncompressed one UTF-16LE at `fc`). Pieces are the
  *    real-world trap this module embraces: boundaries fall MID-
  *    paragraph (Word appends edits as new pieces), so text must be
  *    reassembled across pieces before paragraph splitting on `\r`.
  *
  * STRICT container semantics: a bad signature/sector shift, a FAT or
  * miniFAT chain cycle or out-of-range sector, a directory walk past its
  * bounds, a missing WordDocument/Table stream, a FIB without the magic
  * `wIdent`, CPs that do not start at 0 / ascend / end at ccpText, or a
  * piece reaching outside its stream quarantines the whole document.
  * Every count is capped before allocation.
  *
  * Fixture: [[encodeDoc]] writes a complete CFB per document (header
  * DIFAT, one FAT sector, directory, miniFAT, the padded WordDocument
  * chain, the mini-stream container) with 2-3 pieces cycling compressed/
  * unicode (a piece is stored compressed only when its slice is
  * cp1252-encodable — a Δ hazard forces real UTF-16 pieces), piece cuts
  * at non-paragraph positions, and an id-parity 0Table/1Table name. The
  * oracle replays paragraphs closed-form.
  *
  * Scale shape: map-only per document, zero shuffles. No reference
  * citation possible — the reference (`src/flinkarima.py:379-416`) has
  * no file surface; north-star scope completing the office shelf beside
  * [[Docx]]/[[Odt]]/[[Pptx]]/[[Rtf]]/[[Xlsx]].
  */
object Doc {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val words = Array("anchor", "bloom", "cedar", "dune", "ember", "flint", "grove", "harbor")

  // ------------------------------------------------------------- fixture

  private[ext] def nParas(id: Long): Int = {
    val m = md5Hex(s"doc:$id")
    2 + Integer.parseInt(m.substring(0, 1), 16) % 3
  }

  private[ext] def nPieces(id: Long): Int = {
    val m = md5Hex(s"doc:$id")
    2 + Integer.parseInt(m.substring(11, 12), 16) % 2
  }

  private[ext] def paraText(id: Long, p: Int): String = {
    val m = md5Hex(s"doc:$id")
    def nib(i: Int) = Integer.parseInt(m.substring(i - 1, i), 16)
    val hazard = ((id + p) % 4) match {
      case 0 => " \u00e9" // cp1252-able high byte
      case 1 => " \u201cq\u201d" // curly quotes: cp1252 0x93/0x94
      case 2 => " \u0394x" // GREEK DELTA: NOT in cp1252 — forces unicode pieces
      case _ => ""
    }
    s"Para $p of doc $id: " + words(nib(2 + p) % 8) + " " + words(nib(7 + p) % 8) + hazard
  }

  /** The full CP stream: every paragraph (including the last) ends with
    * the `\r` paragraph mark, the Word convention.
    */
  private[ext] def fullText(id: Long): String =
    (0 until nParas(id)).map(p => paraText(id, p) + "\r").mkString

  /** Deterministic piece cut points: `np` slices of the CP stream at
    * positions that deliberately do NOT align with paragraph marks.
    */
  private[ext] def pieceSlices(id: Long): Seq[String] = {
    val t = fullText(id)
    val np = nPieces(id)
    val cuts = (0 to np).map(k => (t.length.toLong * k / np).toInt)
    (0 until np).map(k => t.substring(cuts(k), cuts(k + 1)))
  }

  private def cp1252able(s: String): Boolean =
    try { Charset.cp1252Encode(s); true }
    catch { case _: IllegalArgumentException => false }

  // CFB sector constants
  private val SectorSize = 512
  private val MiniSize = 64
  private val MiniCutoff = 4096
  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD
  private val NoStream = 0xFFFFFFFF

  /** Serialize the FIB + piece data as the WordDocument stream, plus the
    * Clx bytes for the Table stream. Returns (wordDocument, tableStream).
    */
  private[ext] def renderWordStreams(id: Long): (Array[Byte], Array[Byte]) = {
    val slices = pieceSlices(id)
    val oneTable = id % 2 == 1
    // piece payloads placed from offset 1024 (past the FIB), compressed
    // (cp1252) when the slice allows it AND the arm says so; fc carries
    // the fCompressed bit + doubled offset per spec
    var cursor = 1024
    val payload = new java.io.ByteArrayOutputStream(4096)
    val pcds = slices.zipWithIndex.map { case (s, i) =>
      val compressed = (id + i) % 2 == 0 && cp1252able(s)
      if (!compressed && cursor % 2 == 1) { payload.write(0); cursor += 1 } // UTF-16 aligns even
      val bytes =
        if (compressed) Charset.cp1252Encode(s)
        else s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      val fc = if (compressed) (cursor * 2) | (1 << 30) else cursor
      payload.write(bytes)
      cursor += bytes.length
      (fc, s.length)
    }
    val text = fullText(id)

    val fib = new java.io.ByteArrayOutputStream(1024)
    def u16(v: Int): Unit = { fib.write(v & 0xff); fib.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    // FibBase: 32 bytes
    u16(0xA5EC) // wIdent
    u16(0x00C1) // nFib: Word 97
    u16(0) // unused
    u16(0x0409) // lid
    u16(0) // pnNext
    u16(if (oneTable) 0x0200 else 0) // flags: fWhichTblStm is bit 9
    u16(0x00BF) // nFibBack
    u32(0) // lKey
    u16(0) // envr + flags2
    u16(0); u16(0) // chs, chsTables
    u32(0); u32(0) // fcMin, fcMac (legacy, unused at nFib >= 0x00C1)
    // self-describing blocks
    u16(14) // csw
    for (_ <- 0 until 14) u16(0)
    u16(22) // cslw
    val wdLenGuess = 6144 // cbMac: patched below once known; keep stable by padding to this
    for (i <- 0 until 22) u32(i match {
      case 0 => wdLenGuess // cbMac
      case 3 => text.length // ccpText
      case _ => 0
    })
    u16(93) // cbRgFcLcb (nFib 0x00C1: 93 fc/lcb pairs)
    // Clx location: pair index 33
    val clx = new java.io.ByteArrayOutputStream(128)
    if (id % 3 == 0) { // a leading Prc clause the reader must skip
      clx.write(0x01)
      clx.write(4); clx.write(0) // cbGrpprl = 4
      clx.write(Array[Byte](1, 2, 3, 4))
    }
    clx.write(0x02)
    val n = slices.length
    val lcb = 4 * (n + 1) + 8 * n
    def c32(v: Int): Unit = {
      clx.write(v & 0xff); clx.write((v >> 8) & 0xff)
      clx.write((v >> 16) & 0xff); clx.write((v >>> 24) & 0xff)
    }
    c32(lcb)
    var cp = 0
    c32(0)
    slices.foreach { s => cp += s.length; c32(cp) }
    pcds.foreach { case (fc, _) =>
      clx.write(0); clx.write(0) // PCD flags
      c32(fc)
      clx.write(0); clx.write(0) // prm
    }
    val table = clx.toByteArray
    for (i <- 0 until 93) {
      if (i == 33) { u32(0); u32(table.length) } // fcClx = 0 in table stream
      else { u32(0); u32(0) }
    }
    val fibBytes = fib.toByteArray
    require(fibBytes.length <= 1024)
    val wd = new Array[Byte](wdLenGuess) // > MiniCutoff: regular FAT sectors
    System.arraycopy(fibBytes, 0, wd, 0, fibBytes.length)
    val pay = payload.toByteArray
    require(1024 + pay.length <= wdLenGuess)
    System.arraycopy(pay, 0, wd, 1024, pay.length)
    (wd, table)
  }

  /** Assemble the complete compound file: header-DIFAT, one FAT sector,
    * one directory sector, one miniFAT sector, the WordDocument chain,
    * and the root mini-stream container holding the Table stream.
    */
  private[ext] def renderDoc(id: Long): Array[Byte] = {
    val (wd, table) = renderWordStreams(id)
    val oneTable = id % 2 == 1
    require(wd.length > MiniCutoff && table.length < MiniCutoff)
    renderCfb(Seq(
      ("WordDocument", wd),
      (if (oneTable) "1Table" else "0Table", table)))
  }

  /** Generic CFB writer shared by the 97-2003 office modules ([[Doc]],
    * [[Xls]], [[Msg]]): each stream lands in the MINI layer (64-byte
    * sectors inside the root's mini-stream container, chained via the
    * miniFAT) when under the 4096 cutoff, else in regular 512-byte FAT
    * chains — the same rule the reader applies. The directory spans as
    * many chained sectors as root + streams need (4 entries each); one
    * FAT sector bounds total size at ~64 KB, plenty for fixtures.
    */
  private[ext] def renderCfb(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(streams.nonEmpty && streams.length <= 15)
    val regular = streams.filter(_._2.length >= MiniCutoff)
    val minis = streams.filter(_._2.length < MiniCutoff)

    val regSectors = regular.map { case (_, b) => (b.length + SectorSize - 1) / SectorSize }
    val miniCounts = minis.map { case (_, b) => (b.length + MiniSize - 1) / MiniSize }
    val miniTotal = miniCounts.sum
    val miniContainerBytes = miniTotal * MiniSize
    val miniContainerSectors = (miniContainerBytes + SectorSize - 1) / SectorSize
    // sector map: 0 FAT, then the directory chain, then the miniFAT, then
    // the regular streams' chains in order, then the mini container
    val nDir = (1 + streams.length + 3) / 4 // 4 dir entries per sector
    val miniFatSector = 1 + nDir
    val regStarts = regSectors.scanLeft(miniFatSector + 1)(_ + _)
    val miniStart = regStarts.last
    val totalSectors = miniStart + miniContainerSectors
    // capacity bounds the single-FAT/single-miniFAT layout actually
    // written: one 128-entry FAT sector and one 128-entry miniFAT sector
    // (the header hardcodes csectFat = csectMiniFat = 1)
    require(totalSectors <= SectorSize / 4,
      s"renderCfb: $totalSectors sectors exceed the one-FAT-sector layout")
    require(miniTotal <= SectorSize / 4,
      s"renderCfb: $miniTotal mini sectors exceed the one-miniFAT-sector layout")
    // mini-sector start index of each mini stream inside the container
    val miniStarts = miniCounts.scanLeft(0)(_ + _)

    val out = java.nio.ByteBuffer.allocate(SectorSize * (1 + totalSectors))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // ---- header
    out.putLong(0xE11AB1A1E011CFD0L) // signature, little-endian of D0CF11E0A1B11AE1
    out.position(out.position() + 16) // CLSID zeros
    out.putShort(0x003E.toShort) // minor
    out.putShort(3) // major version 3: 512-byte sectors
    out.putShort(0xFFFE.toShort) // byte order mark
    out.putShort(9) // sector shift
    out.putShort(6) // mini sector shift
    out.position(out.position() + 6) // reserved
    out.putInt(0) // csectDir (v4 only)
    out.putInt(1) // csectFat
    out.putInt(1) // first directory sector
    out.putInt(0) // transaction signature
    out.putInt(MiniCutoff) // mini stream cutoff
    out.putInt(miniFatSector) // first miniFAT sector
    out.putInt(1) // csectMiniFat
    out.putInt(EndOfChain) // first DIFAT sector
    out.putInt(0) // csectDifat
    out.putInt(0) // DIFAT[0]: the FAT sector
    for (_ <- 1 until 109) out.putInt(FreeSect)
    require(out.position() == SectorSize)

    def sectorBase(s: Int) = SectorSize * (1 + s)

    // ---- FAT (sector 0)
    out.position(sectorBase(0))
    val fat = Array.fill(SectorSize / 4)(FreeSect)
    fat(0) = FatSect
    for (k <- 0 until nDir) // the directory chain
      fat(1 + k) = if (k == nDir - 1) EndOfChain else 2 + k
    fat(miniFatSector) = EndOfChain
    regular.indices.foreach { i =>
      val start = regStarts(i)
      val count = regSectors(i)
      for (k <- 0 until count)
        fat(start + k) = if (k == count - 1) EndOfChain else start + k + 1
    }
    for (k <- 0 until miniContainerSectors)
      fat(miniStart + k) = if (k == miniContainerSectors - 1) EndOfChain else miniStart + k + 1
    fat.foreach(out.putInt)

    // ---- directory (sector 1): Root Entry then the streams in order
    def dirEntry(name: String, typ: Int, left: Int, right: Int, child: Int,
                 start: Int, size: Int): Unit = {
      val base = out.position()
      val u = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      require(u.length <= 62)
      out.put(u)
      out.position(base + 64)
      out.putShort((u.length + 2).toShort) // name length incl NUL
      out.put(typ.toByte)
      out.put(1.toByte) // color: black
      out.putInt(left); out.putInt(right); out.putInt(child)
      out.position(base + 100) // skip CLSID + state bits
      out.position(base + 116) // skip timestamps
      out.putInt(start)
      out.putInt(size)
      out.putInt(0) // size high 32 (v3: zero)
      require(out.position() == base + 128)
    }
    out.position(sectorBase(1))
    dirEntry("Root Entry", 5, NoStream, NoStream, 1,
      if (miniTotal > 0) miniStart else EndOfChain, miniContainerBytes)
    var regIdx = 0
    var miniIdx = 0
    streams.zipWithIndex.foreach { case ((name, b), i) =>
      // a degenerate right-spine sibling list: valid for tree walkers and
      // for readers that scan entries
      val right = if (i + 1 < streams.length) i + 2 else NoStream
      if (b.length >= MiniCutoff) {
        dirEntry(name, 2, NoStream, right, NoStream, regStarts(regIdx), b.length)
        regIdx += 1
      } else {
        dirEntry(name, 2, NoStream, right, NoStream, miniStarts(miniIdx), b.length)
        miniIdx += 1
      }
    }

    // ---- miniFAT: each mini stream's chain, packed in order
    out.position(sectorBase(miniFatSector))
    val mfat = Array.fill(SectorSize / 4)(FreeSect)
    minis.indices.foreach { i =>
      val start = miniStarts(i)
      val count = miniCounts(i)
      for (k <- 0 until count)
        mfat(start + k) = if (k == count - 1) EndOfChain else start + k + 1
    }
    mfat.foreach(out.putInt)

    // ---- regular streams' sectors
    regular.indices.foreach { i =>
      out.position(sectorBase(regStarts(i)))
      out.put(regular(i)._2)
    }
    // ---- mini container
    if (miniTotal > 0) {
      out.position(sectorBase(miniStart))
      minis.zipWithIndex.foreach { case ((_, b), i) =>
        out.position(sectorBase(miniStart) + miniStarts(i) * MiniSize)
        out.put(b)
      }
    }
    out.array()
  }

  /** Fixture writer: one compound file per document row. */
  def encodeDoc(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(idCol).cast("long"))
      // staging exchange (optimization guide §2.5): the per-doc kernel must
      // not inherit the scan's split count — one round-robin exchange of the
      // narrow pre-kernel rows spreads it across every core
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .as[Long]
      .map(id => (id, renderDoc(id)))
      .toDF("doc_id", "payload")
  }

  // --------------------------------------------------------------- parser

  private final class MalformedDoc
      extends RuntimeException("malformed doc", null, false, false)
  private def fail(): Nothing = throw new MalformedDoc

  /** Generic CFB reader: returns the named streams' bytes. */
  private[ext] final class Cfb(bytes: Array[Byte]) {
    private val n = bytes.length
    if (n < SectorSize) fail()
    private val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bb.getLong(0) != 0xE11AB1A1E011CFD0L) fail()
    private val major = bb.getShort(26) & 0xffff
    if (major != 3) fail() // v4 (4096-byte sectors) out of the fixture's scope
    if ((bb.getShort(28) & 0xffff) != 0xFFFE) fail()
    private val sectorShift = bb.getShort(30) & 0xffff
    private val miniShift = bb.getShort(32) & 0xffff
    if (sectorShift != 9 || miniShift != 6) fail()
    private val ssz = 1 << sectorShift
    private val csectFat = bb.getInt(44)
    private val firstDir = bb.getInt(48)
    private val miniCutoff = bb.getInt(56)
    private val firstMiniFat = bb.getInt(60)
    private val csectMiniFat = bb.getInt(64)
    private val firstDifat = bb.getInt(68)
    private val csectDifat = bb.getInt(72)
    private val maxSectors = (n - SectorSize) / ssz
    if (csectFat < 0 || csectFat > maxSectors) fail()

    private def sectorBase(s: Int): Int = {
      if (s < 0 || s >= maxSectors) fail()
      SectorSize + s * ssz
    }

    // DIFAT: 109 header entries + chained DIFAT sectors (capped)
    private val fatSectors: Seq[Int] = {
      val list = Vector.newBuilder[Int]
      var have = 0
      var i = 0
      while (i < 109 && have < csectFat) {
        val v = bb.getInt(76 + 4 * i)
        if (v != FreeSect) { list += v; have += 1 }
        i += 1
      }
      var difat = firstDifat
      var hops = 0
      while (have < csectFat) {
        if (difat == EndOfChain || hops > csectDifat || hops > 1024) fail()
        val base = sectorBase(difat)
        var k = 0
        while (k < ssz / 4 - 1 && have < csectFat) {
          val v = bb.getInt(base + 4 * k)
          if (v != FreeSect) { list += v; have += 1 }
          k += 1
        }
        difat = bb.getInt(base + ssz - 4)
        hops += 1
      }
      list.result()
    }

    private def fatEntry(sector: Int): Int = {
      val perSector = ssz / 4
      val fs = sector / perSector
      if (fs >= fatSectors.length) fail()
      bb.getInt(sectorBase(fatSectors(fs)) + 4 * (sector % perSector))
    }

    /** Read a regular-FAT chain into a stream of `size` bytes. */
    private def readChain(start: Int, size: Int): Array[Byte] = {
      if (size < 0 || size > (1 << 26)) fail()
      val out = new Array[Byte](size)
      var s = start
      var w = 0
      val seen = new java.util.HashSet[Integer]
      while (w < size) {
        if (s == EndOfChain || !seen.add(s)) fail()
        val base = sectorBase(s)
        val take = math.min(ssz, size - w)
        System.arraycopy(bytes, base, out, w, take)
        w += take
        s = fatEntry(s)
      }
      out
    }

    // directory: walk the chain, parse 128-byte entries
    final case class Entry(name: String, typ: Int, start: Int, size: Int)
    private val entries: Vector[Entry] = {
      // directory size is not recorded in v3: walk the chain
      val sects = Vector.newBuilder[Int]
      var s = firstDir
      val seen = new java.util.HashSet[Integer]
      while (s != EndOfChain) {
        if (!seen.add(s) || seen.size > 4096) fail()
        sects += s
        s = fatEntry(s)
      }
      sects.result().flatMap { sec =>
        val base = sectorBase(sec)
        (0 until ssz / 128).map { k =>
          val e = base + 128 * k
          val nameLen = bb.getShort(e + 64) & 0xffff
          val name =
            if (nameLen < 2 || nameLen > 64) ""
            else new String(bytes, e, nameLen - 2, "UTF-16LE")
          Entry(name, bytes(e + 66) & 0xff, bb.getInt(e + 116), bb.getInt(e + 120))
        }
      }
    }
    private val root = entries.find(_.typ == 5).getOrElse(fail())
    private lazy val miniContainer = readChain(root.start, root.size)
    private val miniFatSectors: Seq[Int] = {
      val out = Vector.newBuilder[Int]
      var s = firstMiniFat
      var hops = 0
      while (s != EndOfChain) {
        if (hops > csectMiniFat || hops > 4096) fail()
        out += s; s = fatEntry(s); hops += 1
      }
      out.result()
    }
    private def miniFatEntry(ms: Int): Int = {
      val perSector = ssz / 4
      val fs = ms / perSector
      if (fs < 0 || fs >= miniFatSectors.length) fail()
      bb.getInt(sectorBase(miniFatSectors(fs)) + 4 * (ms % perSector))
    }
    private def readMiniChain(start: Int, size: Int): Array[Byte] = {
      if (size < 0 || size > (1 << 26)) fail()
      val out = new Array[Byte](size)
      var s = start
      var w = 0
      val seen = new java.util.HashSet[Integer]
      while (w < size) {
        if (s == EndOfChain || !seen.add(s)) fail()
        val base = s * MiniSize
        if (base < 0 || base + MiniSize > miniContainer.length) fail()
        val take = math.min(MiniSize, size - w)
        System.arraycopy(miniContainer, base, out, w, take)
        w += take
        s = miniFatEntry(s)
      }
      out
    }

    /** The named stream's bytes; mini vs regular per the cutoff rule. */
    def stream(name: String): Option[Array[Byte]] =
      entries.find(e => e.typ == 2 && e.name == name).map { e =>
        if (e.size < miniCutoff) readMiniChain(e.start, e.size)
        else readChain(e.start, e.size)
      }
  }

  final case class DocPara(doc_id: Long, para_idx: Long, n_chars: Long, checksum: Long)

  private[ext] def parseDoc(id: Long, bytes: Array[Byte]): Seq[DocPara] = {
    val cfb = try new Cfb(bytes) catch { case _: RuntimeException => fail() }
    val wd = cfb.stream("WordDocument").getOrElse(fail())
    if (wd.length < 900) fail()
    val wb = java.nio.ByteBuffer.wrap(wd).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if ((wb.getShort(0) & 0xffff) != 0xA5EC) fail()
    val flags = wb.getShort(10) & 0xffff
    val oneTable = (flags & 0x0200) != 0
    // self-describing FIB walk
    var p = 32
    val csw = wb.getShort(p) & 0xffff; p += 2 + 2 * csw
    if (p + 2 > wd.length) fail()
    val cslw = wb.getShort(p) & 0xffff; p += 2
    if (cslw < 4 || p + 4 * cslw > wd.length) fail()
    val ccpText = wb.getInt(p + 4 * 3)
    if (ccpText < 0 || ccpText > (1 << 26)) fail()
    p += 4 * cslw
    if (p + 2 > wd.length) fail()
    val cbRgFcLcb = wb.getShort(p) & 0xffff; p += 2
    if (cbRgFcLcb < 34 || p + 8 * cbRgFcLcb > wd.length) fail()
    val fcClx = wb.getInt(p + 8 * 33)
    val lcbClx = wb.getInt(p + 8 * 33 + 4)

    val table = cfb.stream(if (oneTable) "1Table" else "0Table").getOrElse(fail())
    if (fcClx < 0 || lcbClx <= 0 || fcClx.toLong + lcbClx > table.length) fail()
    val tb = java.nio.ByteBuffer.wrap(table).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // Clx: skip Prc clauses (0x01 + cbGrpprl:u16 + bytes), find the Pcdt
    var q = fcClx
    val clxEnd = fcClx + lcbClx
    var guard = 0
    while (q < clxEnd && (table(q) & 0xff) == 0x01) {
      guard += 1; if (guard > 4096) fail()
      if (q + 3 > clxEnd) fail()
      val cb = tb.getShort(q + 1) & 0xffff
      q += 3 + cb
    }
    if (q + 5 > clxEnd || (table(q) & 0xff) != 0x02) fail()
    val lcb = tb.getInt(q + 1)
    q += 5
    if (lcb < 16 || (lcb - 4) % 12 != 0 || q + lcb > clxEnd) fail()
    val pieces = (lcb - 4) / 12
    if (pieces > (1 << 16)) fail()
    val cps = (0 to pieces).map(i => tb.getInt(q + 4 * i))
    if (cps.head != 0 || cps.last != ccpText) fail()
    for (i <- 0 until pieces) if (cps(i) >= cps(i + 1)) fail()
    val pcdBase = q + 4 * (pieces + 1)

    val sb = new StringBuilder(ccpText)
    for (i <- 0 until pieces) {
      val fcWord = tb.getInt(pcdBase + 8 * i + 2)
      val compressed = (fcWord & (1 << 30)) != 0
      val fc = fcWord & 0x3FFFFFFF
      val chars = cps(i + 1) - cps(i)
      if (compressed) {
        val at = fc / 2
        if (at < 0 || at.toLong + chars > wd.length) fail()
        sb.append(Charset.cp1252Decode(java.util.Arrays.copyOfRange(wd, at, at + chars)))
      } else {
        if (fc < 0 || fc % 2 != 0 || fc.toLong + 2L * chars > wd.length) fail()
        sb.append(new String(wd, fc, 2 * chars, "UTF-16LE"))
      }
    }
    val text = sb.toString
    // paragraphs: every para ends with \r; split drops the trailing empty
    // either way, so trailing content without a final mark still surfaces
    // as a last paragraph
    val paras = text.split('\r').toSeq
    paras.zipWithIndex.map { case (t, i) =>
      val b = t.getBytes("UTF-8")
      var cs = 0L
      b.foreach(x => cs = (cs * 31 + (x & 0xff)) % 1000000007L)
      DocPara(id, i.toLong, b.length.toLong, cs)
    }
  }

  private[ext] def parseDocSafe(id: Long, bytes: Array[Byte]): Seq[DocPara] =
    try parseDoc(id, Option(bytes).getOrElse(Array.empty))
    catch { case _: MalformedDoc => Seq.empty }

  /** Streaming-twin row shape: (archive_id, ts, rec_idx, rec_doc_id,
    * content_length) — the shared windowed-reduction contract.
    */
  def docExtractWithTs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("ts").cast("timestamp"), col("payload"))
      .as[(Long, java.sql.Timestamp, Array[Byte])]
      .flatMap { case (id, ts, payload) =>
        parseDocSafe(id, payload).map(p => (id % 16, ts, p.para_idx, id, p.n_chars))
      }
      .toDF("archive_id", "ts", "rec_idx", "rec_doc_id", "content_length")
  }

  /** `doc_extract`: paragraphs of every legacy Word binary. Map-only. */
  def docExtract(docs: DataFrame, idCol: String = "doc_id",
                 binCol: String = "payload"): Dataset[DocPara] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) => parseDocSafe(id, bytes) }
  }
}
