package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Apache Iceberg table-metadata ingestion, from scratch — the second
  * of the two table formats 100 TB lakes mount (beside [[DeltaLog]]).
  * Iceberg's current state is a POINTER CHAIN, not a log replay:
  * `vN.metadata.json` names the current snapshot, the snapshot names a
  * MANIFEST LIST (an Avro file of manifest descriptors), and each
  * manifest (another Avro file) lists data files with a status column.
  * An engine that lists the data directory instead of walking the
  * chain reads orphaned and deleted files.
  *
  * Implemented per the published Iceberg Table Spec:
  *
  *  - `metadata.json`: strict JSON (the [[DeltaLog]] subset — duplicate
  *    keys are damage), format-version 1/2, `current-snapshot-id`
  *    resolved against the `snapshots` array (it must exist), the
  *    snapshot's `manifest-list` path;
  *  - the manifest list and every manifest are AVRO OBJECT CONTAINERS
  *    decoded by [[Avro.demuxGeneric]] — the schema-driven generic
  *    path, exactly how a foreign manifest should be read — and their
  *    fields are picked out of the flattened rows by path
  *    (`manifest_path`, `status`, `data_file.file_path`, …);
  *  - manifest entries carry status 0 = EXISTING / 1 = ADDED /
  *    2 = DELETED; the active set is statuses 0 and 1. Any other
  *    status, a missing referenced file, or a damaged JSON/Avro layer
  *    quarantines the whole table.
  *
  * Output: one row per ACTIVE data file of the CURRENT snapshot —
  * path, record count, byte size — exact and SQL-replayable.
  *
  * Scale shape: ONE shuffle, by table id — the pointer chain is
  * per-table sequential, so the parallelism unit is the table (real
  * engines cache exactly this walk per snapshot). Files arrive as
  * ordinary rows (doc_id, path, content), the object-store-listing
  * shape. No reference citation possible — the reference
  * (`src/flinkarima.py:379-416`) has no file surface; north-star
  * scope beside the storage shelf.
  */
object Iceberg {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ------------------------------------------------------------- fixture

  private def nib(id: Long, i: Int): Int = {
    val m = md5Hex(s"ice:$id")
    Integer.parseInt(m.substring(i - 1, i), 16)
  }

  private[ext] def nManifests(id: Long): Int = 1 + nib(id, 1) % 2
  private[ext] def nEntries(id: Long, m: Int): Int = 2 + nib(id, 2 + m) % 3
  /** Every third entry is DELETED — the active set is never the listing. */
  private[ext] def statusOf(id: Long, m: Int, j: Int): Int = if ((id + m + j) % 3 == 2) 2 else 1
  private[ext] def dataPathOf(m: Int, j: Int): String = s"data/part-$m-$j.parquet"
  private[ext] def recordsOf(id: Long, m: Int, j: Int): Long =
    100L + nib(id, 4 + (m + 2 * j) % 8) * 7L + j
  private[ext] def bytesOf(id: Long, m: Int, j: Int): Long =
    4096L + nib(id, 5 + (3 * m + j) % 8) * 512L + 13L * j + m
  private[ext] def snapshotIdOf(id: Long): Long = 7000000L + id

  private def manifestPathOf(id: Long, m: Int): String =
    s"metadata/manifest-$m.avro"
  private def manifestListPathOf(id: Long): String =
    s"metadata/snap-${snapshotIdOf(id)}.avro"

  private val ManifestSchema: String =
    """{"type":"record","name":"manifest_entry","fields":[""" +
      """{"name":"status","type":"int"},""" +
      """{"name":"data_file","type":{"type":"record","name":"data_file","fields":[""" +
      """{"name":"file_path","type":"string"},""" +
      """{"name":"file_format","type":"string"},""" +
      """{"name":"record_count","type":"long"},""" +
      """{"name":"file_size_in_bytes","type":"long"}]}}]}"""

  private val ManifestListSchema: String =
    """{"type":"record","name":"manifest_file","fields":[""" +
      """{"name":"manifest_path","type":"string"},""" +
      """{"name":"manifest_length","type":"long"},""" +
      """{"name":"added_snapshot_id","type":"long"}]}"""

  /** One single-block Avro container holding `records`, each a writer
    * callback over the record body.
    */
  private def avroContainer(schemaJson: String, sync: Array[Byte],
      records: Seq[java.io.ByteArrayOutputStream => Unit]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('O'); out.write('b'); out.write('j'); out.write(1)
    Avro.writeVarLong(out, 2L)
    def ws(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      Avro.writeVarLong(out, b.length.toLong); out.write(b, 0, b.length)
    }
    ws("avro.schema"); ws(schemaJson)
    ws("avro.codec"); ws("null")
    Avro.writeVarLong(out, 0L)
    out.write(sync, 0, 16)
    val body = new java.io.ByteArrayOutputStream()
    records.foreach(_(body))
    val raw = body.toByteArray
    Avro.writeVarLong(out, records.length.toLong)
    Avro.writeVarLong(out, raw.length.toLong)
    out.write(raw, 0, raw.length)
    out.write(sync, 0, 16)
    out.toByteArray
  }

  private def wstr(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Avro.writeVarLong(out, b.length.toLong); out.write(b, 0, b.length)
  }

  private[ext] def renderManifest(id: Long, m: Int): Array[Byte] =
    avroContainer(ManifestSchema,
      java.security.MessageDigest.getInstance("MD5").digest(s"ice-m:$id:$m".getBytes("UTF-8")),
      (0 until nEntries(id, m)).map { j => (out: java.io.ByteArrayOutputStream) =>
        Avro.writeVarLong(out, statusOf(id, m, j).toLong)
        wstr(out, dataPathOf(m, j))
        wstr(out, "PARQUET")
        Avro.writeVarLong(out, recordsOf(id, m, j))
        Avro.writeVarLong(out, bytesOf(id, m, j))
      })

  private[ext] def renderManifestList(id: Long): Array[Byte] =
    avroContainer(ManifestListSchema,
      java.security.MessageDigest.getInstance("MD5").digest(s"ice-l:$id".getBytes("UTF-8")),
      (0 until nManifests(id)).map { m => (out: java.io.ByteArrayOutputStream) =>
        wstr(out, manifestPathOf(id, m))
        Avro.writeVarLong(out, renderManifest(id, m).length.toLong)
        Avro.writeVarLong(out, snapshotIdOf(id))
      })

  /** `vN.metadata.json` with TWO snapshots — current must be resolved,
    * not "the last one" (the stale snapshot's manifest list is absent
    * on purpose: following it quarantines).
    */
  private[ext] def renderMetadataJson(id: Long): String = {
    val cur = snapshotIdOf(id)
    s"""{"format-version":2,"table-uuid":"0000-${md5Hex(s"ice:$id").take(8)}",""" +
      s""""location":"s3://lake/tbl$id","last-updated-ms":${1700000000000L + id},""" +
      s""""current-snapshot-id":$cur,"snapshots":[""" +
      s"""{"snapshot-id":${cur - 1},"manifest-list":"metadata/snap-${cur - 1}.avro","timestamp-ms":1},""" +
      s"""{"snapshot-id":$cur,"manifest-list":"${manifestListPathOf(id)}","timestamp-ms":2}]}"""
  }

  /** Fixture writer: (doc_id, path, content) — the object-store listing
    * of one table per document row.
    */
  def encodeIceberg(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(idCol).cast("long"))
      .as[Long]
      .flatMap { id =>
        Seq((id, "metadata/v1.metadata.json",
          renderMetadataJson(id).getBytes(java.nio.charset.StandardCharsets.UTF_8))) ++
          Seq((id, manifestListPathOf(id), renderManifestList(id))) ++
          (0 until nManifests(id)).map(m => (id, manifestPathOf(id, m), renderManifest(id, m)))
      }
      .toDF("doc_id", "path", "content")
  }

  // --------------------------------------------------------------- reader

  private final class MalformedIceberg
      extends RuntimeException("malformed iceberg", null, false, false)
  private def fail(): Nothing = throw new MalformedIceberg

  final case class IcebergFile(
    doc_id: Long, file_path: String, record_count: Long, size_bytes: Long)

  /** Walk one table's pointer chain from its files. */
  private[ext] def walkTable(id: Long, files: Seq[(String, Array[Byte])]): Seq[IcebergFile] = {
    val byPath = files.toMap
    if (byPath.size != files.length) fail() // duplicate paths in the listing
    // real tables keep EVERY metadata version around: the walk starts at
    // the HIGHEST vN.metadata.json, never an arbitrary one
    val metaCandidates = files.collect {
      case (p, b) if p.endsWith(".metadata.json") => (p, b)
    }
    val VN = """.*v(\d+)\.metadata\.json""".r
    val metaBytes = metaCandidates match {
      case Seq() => fail()
      case Seq((_, b)) => b
      case many =>
        val numbered = many.flatMap {
          case (VN(n), b) if n.length <= 18 => Some((n.toLong, b))
          case _ => None
        }
        if (numbered.length != many.length) fail() // unnumbered rivals: ambiguous
        numbered.maxBy(_._1)._2
    }
    val meta = new DeltaLog.JParser(
      new String(metaBytes, java.nio.charset.StandardCharsets.UTF_8)).parseRoot() match {
      case o: DeltaLog.JObj => o
      case _ => fail()
    }
    meta.map.get("format-version") match {
      case Some(DeltaLog.JNum(v)) => if (v < 1 || v > 2) fail() // v3+: out of surface
      case _ => fail()
    }
    val current = meta.map.get("current-snapshot-id") match {
      case Some(DeltaLog.JNum(v)) => v
      case _ => fail()
    }
    val snapshots = meta.map.get("snapshots") match {
      case Some(DeltaLog.JArr(items)) => items.map {
        case o: DeltaLog.JObj =>
          val sid = o.map.get("snapshot-id") match { case Some(DeltaLog.JNum(v)) => v; case _ => fail() }
          val ml = o.map.get("manifest-list") match { case Some(DeltaLog.JStr(v)) => v; case _ => fail() }
          (sid, ml)
        case _ => fail()
      }
      case _ => fail()
    }
    // current must RESOLVE — "take the newest" reads a stale snapshot
    val manifestList = snapshots.collectFirst { case (sid, ml) if sid == current => ml }
      .getOrElse(fail())
    val mlBytes = byPath.getOrElse(manifestList, fail())
    val mlRows = Avro.demuxGeneric(id, mlBytes, 1 << 26)
    val manifests = mlRows.groupBy(_.rec_idx).toSeq.sortBy(_._1).map { case (_, rows) =>
      rows.find(_.path == "manifest_path").flatMap(_.s_val).getOrElse(fail())
    }
    if (manifests.distinct.length != manifests.length) fail() // a manifest listed twice double-counts
    manifests.flatMap { mPath =>
      val mBytes = byPath.getOrElse(mPath, fail())
      val rows = Avro.demuxGeneric(id, mBytes, 1 << 26)
      rows.groupBy(_.rec_idx).toSeq.sortBy(_._1).flatMap { case (_, entry) =>
        val by = entry.map(r => r.path -> r).toMap
        val status = by.get("status").flatMap(_.i_val).getOrElse(fail())
        if (status < 0 || status > 2) fail() // outside the spec's ladder
        if (status == 2) None // DELETED
        else Some(IcebergFile(id,
          by.get("data_file.file_path").flatMap(_.s_val).getOrElse(fail()),
          by.get("data_file.record_count").flatMap(_.i_val).getOrElse(fail()),
          by.get("data_file.file_size_in_bytes").flatMap(_.i_val).getOrElse(fail())))
      }
    }
  }

  private[ext] def walkTableSafe(id: Long, files: Seq[(String, Array[Byte])]): Seq[IcebergFile] =
    try walkTable(id, files)
    catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** `iceberg_state`: the active-file snapshot of every table. One
    * shuffle, keyed by table.
    */
  def icebergState(listing: DataFrame, idCol: String = "doc_id",
                   pathCol: String = "path", contentCol: String = "content"): Dataset[IcebergFile] = {
    val spark = listing.sparkSession
    import spark.implicits._
    listing
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(pathCol), col(contentCol))
      .as[(Long, String, Array[Byte])]
      .groupByKey(_._1)
      .flatMapGroups { (id, it) =>
        walkTableSafe(id, it.map(r => (r._2, r._3)).toSeq)
      }
  }
}
