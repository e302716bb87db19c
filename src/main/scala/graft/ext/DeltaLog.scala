package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Delta Lake transaction-log ingestion, from scratch — the table
  * format 100 TB lakes actually mount. A crawl/curation pipeline that
  * reads "a directory of parquet" on a modern lake is really reading
  * `_delta_log/`: the JSON commit files are the source of truth for
  * WHICH files are table data (compacted-away and deleted files still
  * sit in storage), so an engine that lists the directory instead of
  * replaying the log silently reads ghosts.
  *
  * Implemented per the published Delta Transaction Log Protocol
  * (PROTOCOL.md): each commit `<version>.json` is JSON-lines, one
  * action object per line wrapping exactly one of
  * `protocol` / `metaData` / `add` / `remove` / `commitInfo`;
  * versions are contiguous from 0; the first commit carries protocol
  * and metaData; replaying commits in version order folds the ACTIVE
  * file set — `add` inserts (or replaces, by path), `remove`
  * tombstones. `commitInfo` is provenance and is skipped; reader
  * versions above 3 (column mapping / deletion vectors and beyond)
  * quarantine rather than misread.
  *
  * Strictness inherits the shelf's rules: a strict JSON subset
  * (objects, arrays, strings, integers, booleans, null; duplicate
  * object keys are damage), one action per line, no unknown action
  * kinds, a version gap, a missing metaData, or a malformed line
  * quarantines the whole table's log.
  *
  * Output: one row per ACTIVE file after replay — path, the commit
  * that added it, size, the `lang` partition value — exact and
  * SQL-replayable.
  *
  * Scale shape: ONE shuffle, by table id — a table's log replay is
  * inherently sequential (that is the format's point), so the
  * parallelism unit is the table, exactly how a real lake caches
  * snapshots per table. Commit files arrive as ordinary rows
  * (doc_id, version, content), the shape an object-store listing
  * produces. No reference citation possible — the reference
  * (`src/flinkarima.py:379-416`) has no file surface; north-star
  * scope beside the storage shelf.
  */
object DeltaLog {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val words = Array("anchor", "bloom", "cedar", "dune", "ember", "flint", "grove", "harbor")

  // ------------------------------------------------------------- fixture

  private def nib(id: Long, i: Int): Int = {
    val m = md5Hex(s"dlog:$id")
    Integer.parseInt(m.substring(i - 1, i), 16)
  }

  private[ext] def nCommits(id: Long): Int = 2 + nib(id, 1) % 3
  private[ext] def addsAt(id: Long, c: Int): Int = if (c == 0) 3 else 1 + nib(id, 2 + c) % 3
  private[ext] def pathOf(c: Int, j: Int): String = f"part-$c%05d-$j%d.snappy.parquet"
  private[ext] def sizeOf(id: Long, c: Int, j: Int): Long =
    1000L + nib(id, 5 + (c + j) % 8) * 64L + 17L * j + c
  private[ext] def langOf(id: Long, c: Int, j: Int): String =
    words(nib(id, 6 + (2 * c + j) % 9) % 8)
  /** Files added at commit c are compacted away at commit c+1 when their
    * index is even — so the active set is adds-minus-removes, never a
    * directory listing.
    */
  private[ext] def removedAt(id: Long, c: Int, j: Int): Boolean =
    c + 1 < nCommits(id) && j % 2 == 0

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** The JSON-lines content of commit `c` for table `id`. */
  private[ext] def renderCommit(id: Long, c: Int): String = {
    val lines = Vector.newBuilder[String]
    lines += s"""{"commitInfo":{"timestamp":${1700000000000L + id * 1000 + c},"operation":${jstr(if (c == 0) "CREATE TABLE" else "WRITE")}}}"""
    if (c == 0) {
      lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      lines += s"""{"metaData":{"id":${jstr(s"tbl-$id")},"format":{"provider":"parquet","options":{}},"schemaString":${jstr("""{"type":"struct","fields":[]}""")},"partitionColumns":["lang"],"configuration":{},"createdTime":${1700000000000L + id}}}"""
    }
    if (c > 0) {
      (0 until addsAt(id, c - 1)).filter(j => removedAt(id, c - 1, j)).foreach { j =>
        lines += s"""{"remove":{"path":${jstr(pathOf(c - 1, j))},"deletionTimestamp":${1700000000500L + id * 1000 + c},"dataChange":true}}"""
      }
    }
    (0 until addsAt(id, c)).foreach { j =>
      lines += s"""{"add":{"path":${jstr(pathOf(c, j))},"partitionValues":{"lang":${jstr(langOf(id, c, j))}},"size":${sizeOf(id, c, j)},"modificationTime":${1700000001000L + id * 1000 + c},"dataChange":true}}"""
    }
    lines.result().mkString("\n") + "\n"
  }

  /** Fixture writer: (doc_id, version, content) — one row per commit
    * file, the shape an object-store listing of `_delta_log/` yields.
    */
  def encodeDeltaLog(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(idCol).cast("long"))
      .as[Long]
      .flatMap(id => (0 until nCommits(id)).map(c => (id, c.toLong, renderCommit(id, c))))
      .toDF("doc_id", "version", "content")
  }

  // --------------------------------------------------------------- reader

  private final class MalformedDelta
      extends RuntimeException("malformed delta log", null, false, false)
  private def fail(): Nothing = throw new MalformedDelta

  // ---- strict JSON subset (objects / arrays / strings / integers /
  // booleans / null — what the protocol's action lines carry)

  private[ext] sealed trait Js
  private[ext] final case class JObj(fields: Vector[(String, Js)]) extends Js {
    lazy val map: Map[String, Js] = fields.toMap // dup keys rejected at parse
  }
  private[ext] final case class JArr(items: Vector[Js]) extends Js
  private[ext] final case class JStr(v: String) extends Js
  private[ext] final case class JNum(v: Long) extends Js
  private[ext] final case class JBool(v: Boolean) extends Js
  private[ext] case object JNull extends Js

  private[ext] final class JParser(s: String) {
    private var p = 0
    private def ws(): Unit = while (p < s.length && (s(p) == ' ' || s(p) == '\t' ||
      s(p) == '\n' || s(p) == '\r')) p += 1
    private def expect(c: Char): Unit = { if (p >= s.length || s(p) != c) fail(); p += 1 }
    private def lit(word: String): Unit = {
      if (p + word.length > s.length || s.substring(p, p + word.length) != word) fail()
      p += word.length
    }
    def value(): Js = {
      ws()
      if (p >= s.length) fail()
      s(p) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case c if c == '-' || (c >= '0' && c <= '9') => num()
        case _ => fail()
      }
    }
    private def obj(): JObj = {
      expect('{'); ws()
      val fields = Vector.newBuilder[(String, Js)]
      val seen = scala.collection.mutable.HashSet.empty[String]
      if (p < s.length && s(p) == '}') { p += 1; return JObj(fields.result()) }
      var more = true
      while (more) {
        ws()
        val k = str()
        if (!seen.add(k)) fail() // duplicate keys are damage, not last-wins
        ws(); expect(':')
        fields += (k -> value())
        ws()
        if (p < s.length && s(p) == ',') p += 1
        else { expect('}'); more = false }
      }
      JObj(fields.result())
    }
    private def arr(): JArr = {
      expect('['); ws()
      val items = Vector.newBuilder[Js]
      if (p < s.length && s(p) == ']') { p += 1; return JArr(items.result()) }
      var more = true
      while (more) {
        items += value()
        ws()
        if (p < s.length && s(p) == ',') p += 1
        else { expect(']'); more = false }
      }
      JArr(items.result())
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (p < s.length && s(p) != '"') {
        if (s(p) == '\\') {
          p += 1
          if (p >= s.length) fail()
          s(p) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              if (p + 4 >= s.length) fail()
              val h = s.substring(p + 1, p + 5)
              if (!h.forall(c => Character.digit(c, 16) >= 0)) fail()
              sb += Integer.parseInt(h, 16).toChar
              p += 4
            case _ => fail()
          }
          p += 1
        } else { sb += s(p); p += 1 }
      }
      expect('"')
      sb.result()
    }
    private def num(): JNum = {
      val start = p
      if (s(p) == '-') p += 1
      while (p < s.length && s(p) >= '0' && s(p) <= '9') p += 1
      if (p == start || (p < s.length && (s(p) == '.' || s(p) == 'e' || s(p) == 'E'))) fail()
      val t = s.substring(start, p)
      if (t.length > 18) fail()
      JNum(t.toLong)
    }
    def parseRoot(): Js = {
      val v = value()
      ws()
      if (p != s.length) fail()
      v
    }
  }

  final case class DeltaFile(
    doc_id: Long, path: String, add_version: Long, size_bytes: Long, lang: String)

  /** Replay one table's commit files (any input order; versions must be
    * contiguous from 0) into its active file rows.
    */
  private[ext] def replay(id: Long, commits: Seq[(Long, String)]): Seq[DeltaFile] = {
    val byVersion = commits.sortBy(_._1)
    byVersion.map(_._1).zipWithIndex.foreach { case (v, i) =>
      if (v != i.toLong) fail() // gap or duplicate version
    }
    if (byVersion.isEmpty) fail()
    var sawProtocol = false
    var sawMeta = false
    // active set in ADD order (replacement keeps the newest add's slot
    // at its new position — the fold a snapshot reader performs)
    val active = scala.collection.mutable.LinkedHashMap.empty[String, DeltaFile]
    byVersion.foreach { case (version, content) =>
      content.linesIterator.filter(_.nonEmpty).foreach { line =>
        val root = new JParser(line).parseRoot() match {
          case o: JObj => o
          case _ => fail()
        }
        if (root.fields.length != 1) fail() // exactly one action per line
        val (kind, body) = root.fields.head
        def asObj(js: Js): JObj = js match { case o: JObj => o; case _ => fail() }
        kind match {
          case "commitInfo" => asObj(body) // provenance: validated as an object, skipped
          case "protocol" =>
            val o = asObj(body)
            o.map.get("minReaderVersion") match {
              case Some(JNum(v)) => if (v < 1 || v > 3) fail() // beyond our read surface
              case _ => fail()
            }
            sawProtocol = true
          case "metaData" =>
            val o = asObj(body)
            o.map.get("id") match { case Some(JStr(_)) => () ; case _ => fail() }
            sawMeta = true
          case "add" =>
            val o = asObj(body)
            val path = o.map.get("path") match { case Some(JStr(v)) => v; case _ => fail() }
            val size = o.map.get("size") match { case Some(JNum(v)) if v >= 0 => v; case _ => fail() }
            val lang = o.map.get("partitionValues") match {
              case Some(pv: JObj) => pv.map.get("lang") match {
                case Some(JStr(v)) => v
                case None => ""
                case _ => fail()
              }
              case _ => fail() // partitionValues is required on add
            }
            active.remove(path) // re-add replaces
            active(path) = DeltaFile(id, path, version, size, lang)
          case "remove" =>
            val o = asObj(body)
            val path = o.map.get("path") match { case Some(JStr(v)) => v; case _ => fail() }
            active.remove(path) // a tombstone for an unknown path is legal
          case _ => fail() // unknown action kinds are damage
        }
      }
    }
    if (!sawProtocol || !sawMeta) fail() // the snapshot is undefined without them
    active.values.toVector
  }

  private[ext] def replaySafe(id: Long, commits: Seq[(Long, String)]): Seq[DeltaFile] =
    try replay(id, commits)
    catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** `delta_state`: the active-file snapshot of every table's log. One
    * shuffle, keyed by table.
    */
  def deltaState(logs: DataFrame, idCol: String = "doc_id",
                 versionCol: String = "version", contentCol: String = "content"): Dataset[DeltaFile] = {
    val spark = logs.sparkSession
    import spark.implicits._
    logs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(versionCol).cast("long"), col(contentCol))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (id, it) =>
        replaySafe(id, it.map(r => (r._2, r._3)).toSeq)
      }
  }
}
