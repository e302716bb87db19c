package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== REAL tabular-text codec: CSV (RFC 4180), from scratch ========
  *
  * Tabular dumps are the other half of an ingest mouth (next to the
  * [[Archives]] crawl formats), and almost every naive reader gets the
  * hard part wrong: a QUOTED field may contain commas, quote characters
  * (escaped by doubling), and RECORD SEPARATORS — so line-splitting
  * before parsing corrupts exactly the rows that needed quoting. This
  * module implements the full RFC 4180 state machine:
  *
  *  - writer: minimal quoting (a field is quoted iff it contains comma,
  *    quote, CR, or LF; quotes double), LF record terminator, trailing
  *    terminator emitted;
  *  - parser: a strict single-pass character state machine — quote-open
  *    only at field start, `""` escape inside quoted fields, embedded
  *    CR/LF/comma preserved inside quotes, a closing quote must be
  *    followed by a separator or end-of-input, CR outside quotes must
  *    begin CRLF; any violation (or an unterminated quote at EOF) drops
  *    the whole shard — the malformed-drop convention.
  *
  * The oracled key builds hostile shards where EVERY record carries a
  * field with a quote, a comma, AND an embedded newline, then requires
  * parse∘write = identity via per-record field checksums the DuckDB
  * oracle computes directly from the source columns — a quoting or
  * unescaping slip on any record fails the hash.
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * CSV path; north-star LLM-pipeline scope. 100 TB shape: parse is
  * map-only over shards (one task per shard blob, the same fan-out as
  * the WARC path); the one shuffle is the fixture's shard grouping.
  */
object Csv {

  private def needsQuote(f: String): Boolean =
    f.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r')

  private[ext] def writeField(f: String): String =
    if (needsQuote(f)) "\"" + f.replace("\"", "\"\"") + "\"" else f

  private[ext] def writeCsv(records: Iterator[Seq[String]]): String = {
    val sb = new StringBuilder
    records.foreach { fields =>
      sb.append(fields.map(writeField).mkString(","))
      sb.append('\n')
    }
    sb.toString
  }

  /** Strict RFC 4180 parse; `None` on any structural violation. */
  private[ext] def parseCsv(text: String): Option[Vector[Vector[String]]] = {
    val out = Vector.newBuilder[Vector[String]]
    var fields = Vector.newBuilder[String]
    var nFields = 0
    val cur = new StringBuilder
    var started = false // current record has at least one character or separator
    var st = 0 // 0 field start, 1 unquoted, 2 quoted, 3 after closing-quote candidate, 4 after CR
    def endField(): Unit = { fields += cur.toString; nFields += 1; cur.clear() }
    def endRecord(): Unit = {
      endField()
      out += fields.result(); fields = Vector.newBuilder[String]; nFields = 0
      started = false
    }
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      st match {
        case 0 =>
          started = true
          if (c == '"') st = 2
          else if (c == ',') endField()
          else if (c == '\n') endRecord()
          else if (c == '\r') st = 4
          else { cur.append(c); st = 1 }
        case 1 =>
          if (c == ',') { endField(); st = 0 }
          else if (c == '\n') { endRecord(); st = 0 }
          else if (c == '\r') st = 4
          else if (c == '"') return None // quote inside an unquoted field
          else cur.append(c)
        case 2 =>
          if (c == '"') st = 3
          else cur.append(c) // commas, CR, LF all belong to the field here
        case 3 =>
          if (c == '"') { cur.append('"'); st = 2 } // doubled quote = escape
          else if (c == ',') { endField(); st = 0 }
          else if (c == '\n') { endRecord(); st = 0 }
          else if (c == '\r') st = 4
          else return None // closing quote must be followed by a separator
        case 4 =>
          if (c == '\n') { endRecord(); st = 0 }
          else return None // lone CR
      }
      i += 1
    }
    st match {
      case 2 => None // unterminated quote
      case 4 => None // trailing lone CR
      case 3 => endRecord(); Some(out.result())
      case 1 => endRecord(); Some(out.result())
      case 0 =>
        // a record in progress (text not ending in a terminator) flushes;
        // a clean trailing terminator does not invent an empty record
        if (started || nFields > 0) endRecord()
        Some(out.result())
    }
  }

  /** Hostile-CSV FIXTURE: documents grouped into shards (doc_id mod
    * nShards, records by id order), five fields per record — id, lang,
    * source, text, and a synthetic field `q="<source>", line\n<lang>`
    * that forces quote-escaping, an embedded comma, AND an embedded
    * newline on EVERY record.
    */
  def encodeCsvShards(docs: DataFrame, nShards: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col("doc_id").isNotNull && col("doc_id") >= 0 &&
        col("text").isNotNull && col("lang").isNotNull && col("source").isNotNull)
      .select(col("doc_id").cast("long"), col("lang"), col("source"), col("text"))
      .as[(Long, String, String, String)]
      .groupByKey(_._1 % nShards)
      .mapGroups { (shard, it) =>
        val rows = it.toArray.sortBy(_._1)
        (shard, writeCsv(rows.iterator.map { case (id, lang, source, text) =>
          Seq(id.toString, lang, source, text, s"""q="$source", line\n$lang""")
        }))
      }
      .toDF("shard_id", "payload")
  }

  final case class CsvRecord(shard_id: Long, row_idx: Long, n_fields: Long, checksum: Long)

  /** Parse CSV shards back into records; one row per record with the
    * field count and a base-31 checksum over the fields joined by the
    * 0x1F unit separator — the oracle recomputes both straight from the
    * source columns, so the parser must invert the writer exactly.
    */
  def csvExtract(shards: DataFrame): Dataset[CsvRecord] = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards
      .select(col("shard_id").cast("long"), col("payload"))
      .as[(Long, String)]
      .flatMap { case (shard, payload) =>
        parseCsv(if (payload == null) "" else payload) match {
          case None => Iterator.empty
          case Some(records) =>
            records.iterator.zipWithIndex.map { case (fields, idx) =>
              val joined = fields.mkString("\u001f")
              var c = 0L
              joined.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                .foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
              CsvRecord(shard, idx.toLong, fields.length.toLong, c)
            }
        }
      }
  }
}
