package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ext.Archives

class StreamingArchiveIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def ts(m: Int) = new Timestamp(m * 60000L)

  /** Real archive blobs from the batch writer — the stream carries the
    * same bytes a fetcher would flush.
    */
  private def archiveBlobs(ids: Seq[Long], nArchives: Int): Map[Long, Array[Byte]] = {
    import spark.implicits._
    Archives.encodeWarcArchives(
      ids.map(i => (i, s"streamed document $i with some body text")).toDF("doc_id", "text"),
      nArchives = nArchives)
      .as[(Long, Array[Byte])].collect().toMap
  }

  test("archive stream: windows finalize with exact record counts; corrupt blobs drop") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val blobs = archiveBlobs(0L until 12L, nArchives = 2) // 6 records per archive
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val query = StreamingArchiveIngest.ingest(
      input.toDF().toDF("archive_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("ingest_out").outputMode("append").start()
    try {
      // two segments of the same archive land in the same window; a
      // corrupt blob lands alongside and must vanish whole
      val corrupt = blobs(1L).clone()
      corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x7f).toByte
      input.addData((0L, ts(1), blobs(0L)), (0L, ts(4), blobs(0L)), (1L, ts(3), corrupt))
      query.processAllAvailable()
      input.addData((1L, ts(8), blobs(1L)))
      query.processAllAvailable()
      // advance the watermark far enough to finalize both windows
      input.addData((0L, ts(40), blobs(0L)))
      query.processAllAvailable()
      val rows = spark.table("ingest_out").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // window [0,10): archive 0 saw two whole segments = 12 records;
      // archive 1 saw one corrupt blob (contributes NOTHING) and one
      // clean segment at t=8 -> exactly 6 records
      val expectedBytes = (0L until 12L by 2)
        .map(i => s"streamed document $i with some body text".getBytes("UTF-8").length.toLong).sum
      assert(rows((0, 0L))._1 == 12L)
      assert(rows((0, 0L))._2 == 2 * expectedBytes)
      assert(rows((0, 1L))._1 == 6L, "corrupt blob must not contribute records")
    } finally query.stop()
  }

  test("zst stream: windows finalize exactly once; damaged segments drop whole") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val blobs = graft.ext.Zstd.encodeZstArchives(
      (0L until 12L).map(i => (i, s"zst streamed document $i with some body text")).toDF("doc_id", "text"),
      nArchives = 2)
      .as[(Long, Array[Byte])].collect().toMap // 6 records per archive
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val query = StreamingArchiveIngest.ingestZst(
      input.toDF().toDF("archive_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("zst_ingest_out").outputMode("append").start()
    try {
      // a bit flip mid-stream: the frame checksum (or entropy decode)
      // fails and the whole segment contributes nothing
      val corrupt = blobs(1L).clone()
      corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x7f).toByte
      input.addData((0L, ts(1), blobs(0L)), (0L, ts(4), blobs(0L)), (1L, ts(3), corrupt))
      query.processAllAvailable()
      input.addData((1L, ts(8), blobs(1L)))
      query.processAllAvailable()
      input.addData((0L, ts(40), blobs(0L))) // advance watermark: finalize [0,10)
      query.processAllAvailable()
      val rows = spark.table("zst_ingest_out").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val expectedBytes = (0L until 12L by 2)
        .map(i => s"zst streamed document $i with some body text".getBytes("UTF-8").length.toLong).sum
      assert(rows((0, 0L))._1 == 12L, "two clean segments of archive 0")
      assert(rows((0, 0L))._2 == 2 * expectedBytes)
      assert(rows((0, 1L))._1 == 6L, "corrupt zst segment must not contribute records")
      // exactly-once: the finalized window appears ONCE even though the
      // same archive keeps receiving segments afterwards
      assert(spark.table("zst_ingest_out").collect()
        .count(r => r.getTimestamp(0).getTime == 0L && r.getLong(1) == 0L) == 1)
    } finally query.stop()
  }

  test("xz stream: windows finalize exactly once; damaged segments drop whole") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val blobs = graft.ext.Xz.encodeXzArchives(
      (0L until 12L).map(i => (i, s"xz streamed document $i with some body text")).toDF("doc_id", "text"),
      nArchives = 2)
      .as[(Long, Array[Byte])].collect().toMap // 6 records per archive
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val query = StreamingArchiveIngest.ingestXz(
      input.toDF().toDF("archive_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("xz_ingest_out").outputMode("append").start()
    try {
      val corrupt = blobs(1L).clone()
      corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x7f).toByte
      input.addData((0L, ts(1), blobs(0L)), (0L, ts(4), blobs(0L)), (1L, ts(3), corrupt))
      query.processAllAvailable()
      input.addData((1L, ts(8), blobs(1L)))
      query.processAllAvailable()
      input.addData((0L, ts(40), blobs(0L))) // advance watermark: finalize [0,10)
      query.processAllAvailable()
      val rows = spark.table("xz_ingest_out").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val expectedBytes = (0L until 12L by 2)
        .map(i => s"xz streamed document $i with some body text".getBytes("UTF-8").length.toLong).sum
      assert(rows((0, 0L))._1 == 12L, "two clean segments of archive 0")
      assert(rows((0, 0L))._2 == 2 * expectedBytes)
      assert(rows((0, 1L))._1 == 6L, "corrupt xz segment must not contribute records")
      assert(spark.table("xz_ingest_out").collect()
        .count(r => r.getTimestamp(0).getTime == 0L && r.getLong(1) == 0L) == 1, "exactly-once finalization")
    } finally query.stop()
  }

  test("bz2 stream: windows finalize exactly once; damaged segments drop whole") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val blobs = graft.ext.Bzip2.encodeBz2Archives(
      (0L until 12L).map(i => (i, s"bz2 streamed document $i with some body text")).toDF("doc_id", "text"),
      nArchives = 2)
      .as[(Long, Array[Byte])].collect().toMap // 6 records per archive
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val query = StreamingArchiveIngest.ingestBz2(
      input.toDF().toDF("archive_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("bz2_ingest_out").outputMode("append").start()
    try {
      // a bit flip mid-stream: a block CRC fails and the segment drops whole
      val corrupt = blobs(1L).clone()
      corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x7f).toByte
      input.addData((0L, ts(1), blobs(0L)), (0L, ts(4), blobs(0L)), (1L, ts(3), corrupt))
      query.processAllAvailable()
      input.addData((1L, ts(8), blobs(1L)))
      query.processAllAvailable()
      input.addData((0L, ts(40), blobs(0L))) // advance watermark: finalize [0,10)
      query.processAllAvailable()
      val rows = spark.table("bz2_ingest_out").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val expectedBytes = (0L until 12L by 2)
        .map(i => s"bz2 streamed document $i with some body text".getBytes("UTF-8").length.toLong).sum
      assert(rows((0, 0L))._1 == 12L, "two clean segments of archive 0")
      assert(rows((0, 0L))._2 == 2 * expectedBytes)
      assert(rows((0, 1L))._1 == 6L, "corrupt bz2 segment must not contribute records")
      assert(spark.table("bz2_ingest_out").collect()
        .count(r => r.getTimestamp(0).getTime == 0L && r.getLong(1) == 0L) == 1, "exactly-once finalization")
    } finally query.stop()
  }

  test("content-encoding stream: decoded byte totals finalize exactly once; damage drops whole") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // ids 0..11 cycle all four coding arms (identity/gzip/deflate/br)
    val blobs = Archives.encodeWarcHttpEncodedArchives(
      (0L until 12L).map(i => (i, s"coded streamed document $i with some body text")).toDF("doc_id", "text"),
      nArchives = 2)
      .as[(Long, Array[Byte])].collect().toMap // 6 records per archive
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val query = StreamingArchiveIngest.ingestHttpEnc(
      input.toDF().toDF("archive_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("enc_ingest_out").outputMode("append").start()
    try {
      val corrupt = blobs(1L).clone()
      corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x7f).toByte
      input.addData((0L, ts(1), blobs(0L)), (0L, ts(4), blobs(0L)), (1L, ts(3), corrupt))
      query.processAllAvailable()
      input.addData((1L, ts(8), blobs(1L)))
      query.processAllAvailable()
      input.addData((0L, ts(40), blobs(0L))) // advance watermark: finalize [0,10)
      query.processAllAvailable()
      val rows = spark.table("enc_ingest_out").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // total_bytes must be the DECODED body lengths — the plain text,
      // whatever coding arm each record went through
      val expectedBytes = (0L until 12L by 2)
        .map(i => s"coded streamed document $i with some body text".getBytes("UTF-8").length.toLong).sum
      assert(rows((0, 0L))._1 == 12L, "two clean segments of archive 0")
      assert(rows((0, 0L))._2 == 2 * expectedBytes, "decoded — not on-the-wire — byte totals")
      assert(rows((0, 1L))._1 == 6L, "damaged coded segment must not contribute records")
      assert(spark.table("enc_ingest_out").collect()
        .count(r => r.getTimestamp(0).getTime == 0L && r.getLong(1) == 0L) == 1, "exactly-once finalization")
    } finally query.stop()
  }

  test("content-encoding stream: batch and streaming agree record-for-record") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = (0L until 20L).map(i => (i, s"parity doc $i body " + ("y" * (i % 9).toInt))).toDF("doc_id", "text")
    val blobs = Archives.encodeWarcHttpEncodedArchives(docs, nArchives = 4)
      .as[(Long, Array[Byte])].collect()
    // batch rows
    val batch = Archives.warcHttpEncExtract(
      blobs.toSeq.toDF("archive_id", "payload")).collect()
      .map(e => (e.archive_id, e.rec_idx, e.rec_doc_id, e.body_len)).sorted.toSeq
    // streaming rows through the identical stack (raw extract, no window)
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val query = Archives.warcHttpEncExtractWithTs(
      input.toDF().toDF("archive_id", "ts", "payload"))
      .writeStream.format("memory").queryName("enc_parity_out").outputMode("append").start()
    try {
      input.addData(blobs.map { case (aid, p) => (aid, ts(1), p) }.toSeq: _*)
      query.processAllAvailable()
      val stream = spark.table("enc_parity_out").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
      assert(stream == batch, "batch == streaming row identity")
    } finally query.stop()
  }

  test("charset stream: transcoded byte totals agree with the batch capstone per record") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = (0L until 24L).map(i => (i, s"cs doc $i")).toDF("doc_id", "text")
    val blobs = Archives.encodeWarcHttpCharsetArchives(docs, nArchives = 3)
      .as[(Long, Array[Byte])].collect()
    val batch = Archives.warcHttpCharsetExtract(blobs.toSeq.toDF("archive_id", "payload"))
      .collect().map(e => (e.archive_id, e.rec_idx, e.rec_doc_id, e.n_bytes_out)).sorted.toSeq
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val query = Archives.warcHttpCharsetExtractWithTs(
      input.toDF().toDF("archive_id", "ts", "payload"))
      .writeStream.format("memory").queryName("cs_parity_out").outputMode("append").start()
    try {
      input.addData(blobs.map { case (aid, p) => (aid, ts(1), p) }.toSeq: _*)
      query.processAllAvailable()
      val stream = spark.table("cs_parity_out").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
      assert(stream == batch, "batch == streaming transcoded-byte identity")
    } finally query.stop()
    // the windowed composition runs end to end
    val input2 = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q2 = StreamingArchiveIngest.ingestCharset(
      input2.toDF().toDF("archive_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("cs_ingest_out").outputMode("append").start()
    try {
      input2.addData(blobs.map { case (aid, p) => (aid, ts(1), p) }.toSeq: _*)
      q2.processAllAvailable()
      input2.addData((0L, ts(40), blobs.head._2))
      q2.processAllAvailable()
      val rows = spark.table("cs_ingest_out").collect()
      assert(rows.count(_.getTimestamp(0).getTime == 0L) == 3, "one finalized window per archive")
    } finally q2.stop()
  }

  test("archive stream: late-arriving segment beyond the watermark is dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val blobs = archiveBlobs(0L until 4L, nArchives = 1)
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val query = StreamingArchiveIngest.ingest(
      input.toDF().toDF("archive_id", "ts", "payload"),
      watermarkDelay = "2 minutes", windowLength = "5 minutes")
      .writeStream.format("memory").queryName("ingest_late").outputMode("append").start()
    try {
      input.addData((0L, ts(1), blobs(0L)))
      query.processAllAvailable()
      input.addData((0L, ts(30), blobs(0L))) // advances watermark past window [0,5)
      query.processAllAvailable()
      input.addData((0L, ts(2), blobs(0L))) // late: window already finalized
      query.processAllAvailable()
      val w0 = spark.table("ingest_late").collect().filter(_.getTimestamp(0).getTime == 0L)
      assert(w0.length == 1 && w0(0).getLong(2) == 4L, "late segment must not reopen the window")
    } finally query.stop()
  }

  test("mbox stream: windows finalize exactly once; damaged archives drop whole; batch parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val blobs = graft.ext.Mbox.encodeMboxArchives(
      (0L until 12L).toDF("doc_id"), nArchives = 2)
      .as[(Long, String)].collect().toMap // 6 messages per archive
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = StreamingArchiveIngest.ingestMbox(
      input.toDF().toDF("archive_id", "ts", "mbox"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("mbox_ingest_out").outputMode("append").start()
    try {
      val corrupt = blobs(1L).replaceFirst("base64\n\n[A-Za-z0-9+/]", "base64\n\n!")
      assert(corrupt != blobs(1L), "fixture must contain a base64 arm to corrupt")
      input.addData((0L, ts(1), blobs(0L)), (0L, ts(4), blobs(0L)), (1L, ts(3), corrupt))
      query.processAllAvailable()
      input.addData((0L, ts(40), blobs(0L))) // advance watermark: finalize [0,10)
      query.processAllAvailable()
      val rows = spark.table("mbox_ingest_out").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // total_bytes counts DECODED text/plain bytes - the batch plane
      val expectedBytes = (0L until 12L by 2)
        .map(i => graft.ext.Mbox.bodyFor(i).getBytes("UTF-8").length.toLong).sum
      assert(rows((0, 0L))._1 == 12L, "two clean archives of stream 0")
      assert(rows((0, 0L))._2 == 2 * expectedBytes)
      assert(!rows.contains((0, 1L)), "corrupt mbox archive contributes nothing")
      assert(spark.table("mbox_ingest_out").collect()
        .count(r => r.getTimestamp(0).getTime == 0L && r.getLong(1) == 0L) == 1, "exactly-once finalization")
      // record-for-record batch parity on the clean archive
      val streamed = graft.ext.Mbox.mboxExtractWithTs(
        Seq((0L, ts(1), blobs(0L))).toDF("archive_id", "ts", "mbox")).collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
      val batch = graft.ext.Mbox.mboxExtract(
        Seq((0L, blobs(0L))).toDF("archive_id", "mbox")).collect()
        .map(e => (e.msg_idx, e.doc_id, e.n_bytes)).sorted.toSeq
      assert(streamed == batch, "batch and streaming agree record for record")
    } finally query.stop()
  }

  test("avro and tfrecord streams: twins finalize exactly once with damage drop and batch parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = (0L until 12L).map(i => (i, s"twin streamed doc $i body")).toDF("doc_id", "text")
    // ---- avro
    val avroBlobs = graft.ext.Avro.encodeAvroArchives(docs, nArchives = 2)
      .as[(Long, Array[Byte])].collect().toMap
    val in1 = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q1 = StreamingArchiveIngest.ingestAvro(
      in1.toDF().toDF("archive_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("avro_ingest_out").outputMode("append").start()
    try {
      val corrupt = avroBlobs(1L).clone()
      corrupt(corrupt.length - 8) = (corrupt(corrupt.length - 8) ^ 1).toByte // final sync marker
      in1.addData((0L, ts(1), avroBlobs(0L)), (1L, ts(2), corrupt))
      q1.processAllAvailable()
      in1.addData((0L, ts(40), avroBlobs(0L)))
      q1.processAllAvailable()
      val rows = spark.table("avro_ingest_out").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1)) -> r.getLong(2)).toMap
      assert(rows((0, 0L)) == 6L && !rows.contains((0, 1L)))
    } finally q1.stop()
    // ---- tfrecord
    val tfBlobs = graft.ext.TfRecord.encodeTfrecordArchives(docs, nArchives = 2)
      .as[(Long, Array[Byte])].collect().toMap
    val in2 = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q2 = StreamingArchiveIngest.ingestTfrecord(
      in2.toDF().toDF("archive_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("tf_ingest_out").outputMode("append").start()
    try {
      val corrupt = tfBlobs(1L).clone()
      corrupt(20) = (corrupt(20) ^ 1).toByte
      in2.addData((0L, ts(1), tfBlobs(0L)), (1L, ts(2), corrupt))
      q2.processAllAvailable()
      in2.addData((0L, ts(40), tfBlobs(0L)))
      q2.processAllAvailable()
      val rows = spark.table("tf_ingest_out").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1)) -> r.getLong(2)).toMap
      assert(rows((0, 0L)) == 6L && !rows.contains((0, 1L)))
      // batch parity on the clean shard
      val streamed = graft.ext.TfRecord.tfrecordExtractWithTs(
        Seq((0L, ts(1), tfBlobs(0L))).toDF("archive_id", "ts", "payload")).collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
      val batch = graft.ext.TfRecord.tfrecordExtract(
        Seq((0L, tfBlobs(0L))).toDF("archive_id", "payload")).collect()
        .map(e => (e.rec_idx, e.rec_doc_id, e.n_bytes)).sorted.toSeq
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("book streams (pdf + epub): twins finalize exactly once with damage drop and batch parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ids = 0L until 8L
    val idsDf = ids.toDF("doc_id")
    // ---- pdf
    val pdfBlobs = graft.ext.Pdf.encodePdf(idsDf)
      .as[(Long, Array[Byte])].collect().toMap
    val pdfBatch = graft.ext.Pdf.pdfExtract(graft.ext.Pdf.encodePdf(idsDf)).collect()
    val in1 = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q1 = StreamingArchiveIngest.ingestPdf(
      in1.toDF().toDF("doc_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("pdf_ingest_out").outputMode("append").start()
    try {
      in1.addData(ids.map(i => (i, ts(2), if (i == 3L) pdfBlobs(i).take(40) else pdfBlobs(i))): _*)
      q1.processAllAvailable()
      in1.addData((0L, ts(40), pdfBlobs(0L))) // advance watermark: finalize [0,10)
      q1.processAllAvailable()
      val rows = spark.table("pdf_ingest_out").collect()
        .filter(_.getTimestamp(0).getTime == 0L)
        .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(4)))).toMap
      // books shard by doc_id % 16; the damaged book 3 contributes nothing
      val expected = pdfBatch.filterNot(_.doc_id == 3L)
        .groupBy(_.doc_id % 16).view.mapValues(_.length.toLong).toMap
      assert(rows.view.mapValues(_._1).toMap == expected, "per-shard page counts")
      assert(!rows.contains(3L), "damaged pdf contributes nothing")
      // record-for-record batch parity on one clean book
      val streamed = graft.ext.Pdf.pdfExtractWithTs(
        Seq((1L, ts(2), pdfBlobs(1L))).toDF("doc_id", "ts", "payload")).collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
      val batch = graft.ext.Pdf.pdfExtract(
        Seq((1L, pdfBlobs(1L))).toDF("doc_id", "payload")).collect()
        .map(p => (p.page_idx, p.doc_id, p.n_chars)).sorted.toSeq
      assert(streamed == batch, "pdf batch and streaming agree record for record")
    } finally q1.stop()
    // ---- epub
    val epubBlobs = graft.ext.Epub.encodeEpub(idsDf)
      .as[(Long, Array[Byte])].collect().toMap
    val epubBatch = graft.ext.Epub.epubExtract(graft.ext.Epub.encodeEpub(idsDf)).collect()
    val in2 = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q2 = StreamingArchiveIngest.ingestEpub(
      in2.toDF().toDF("doc_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("epub_ingest_out").outputMode("append").start()
    try {
      in2.addData(ids.map(i => (i, ts(2), if (i == 2L) epubBlobs(i).take(60) else epubBlobs(i))): _*)
      q2.processAllAvailable()
      in2.addData((0L, ts(40), epubBlobs(0L)))
      q2.processAllAvailable()
      val rows = spark.table("epub_ingest_out").collect()
        .filter(_.getTimestamp(0).getTime == 0L)
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      val expected = epubBatch.filterNot(_.doc_id == 2L)
        .groupBy(_.doc_id % 16).view.mapValues(_.length.toLong).toMap
      assert(rows == expected, "per-shard chapter counts; damaged epub drops")
      val streamed = graft.ext.Epub.epubExtractWithTs(
        Seq((1L, ts(2), epubBlobs(1L))).toDF("doc_id", "ts", "payload")).collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
      val batch = graft.ext.Epub.epubExtract(
        Seq((1L, epubBlobs(1L))).toDF("doc_id", "payload")).collect()
        .map(c => (c.chapter_idx, c.doc_id, c.n_chars)).sorted.toSeq
      assert(streamed == batch, "epub batch and streaming agree record for record")
    } finally q2.stop()
  }

  test("docx stream: twin finalizes with damage drop and batch parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ids = 0L until 8L
    val idsDf = ids.toDF("doc_id")
    val blobs = graft.ext.Docx.encodeDocx(idsDf)
      .as[(Long, Array[Byte])].collect().toMap
    val batchRows = graft.ext.Docx.docxExtract(graft.ext.Docx.encodeDocx(idsDf)).collect()
    val in = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q = StreamingArchiveIngest.ingestDocx(
      in.toDF().toDF("doc_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("docx_ingest_out").outputMode("append").start()
    try {
      in.addData(ids.map(i => (i, ts(2), if (i == 5L) blobs(i).take(70) else blobs(i))): _*)
      q.processAllAvailable()
      in.addData((0L, ts(40), blobs(0L))) // advance watermark: finalize [0,10)
      q.processAllAvailable()
      val rows = spark.table("docx_ingest_out").collect()
        .filter(_.getTimestamp(0).getTime == 0L)
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      val expected = batchRows.filterNot(_.doc_id == 5L)
        .groupBy(_.doc_id % 16).view.mapValues(_.length.toLong).toMap
      assert(rows == expected, "per-shard paragraph counts; damaged docx drops")
      val streamed = graft.ext.Docx.docxExtractWithTs(
        Seq((1L, ts(2), blobs(1L))).toDF("doc_id", "ts", "payload")).collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
      val batch = graft.ext.Docx.docxExtract(
        Seq((1L, blobs(1L))).toDF("doc_id", "payload")).collect()
        .map(p => (p.para_idx, p.doc_id, p.n_chars)).sorted.toSeq
      assert(streamed == batch, "docx batch and streaming agree record for record")
    } finally q.stop()
  }

  test("doc stream: legacy Word twin finalizes with damage drop and batch parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ids = 0L until 8L
    val idsDf = ids.toDF("doc_id")
    val blobs = graft.ext.Doc.encodeDoc(idsDf)
      .as[(Long, Array[Byte])].collect().toMap
    val batchRows = graft.ext.Doc.docExtract(graft.ext.Doc.encodeDoc(idsDf)).collect()
    val in = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q = StreamingArchiveIngest.ingestDoc(
      in.toDF().toDF("doc_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("doc_ingest_out").outputMode("append").start()
    try {
      in.addData(ids.map(i => (i, ts(2), if (i == 5L) blobs(i).take(700) else blobs(i))): _*)
      q.processAllAvailable()
      in.addData((0L, ts(40), blobs(0L))) // advance watermark: finalize [0,10)
      q.processAllAvailable()
      val rows = spark.table("doc_ingest_out").collect()
        .filter(_.getTimestamp(0).getTime == 0L)
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      val expected = batchRows.filterNot(_.doc_id == 5L)
        .groupBy(_.doc_id % 16).view.mapValues(_.length.toLong).toMap
      assert(rows == expected, "per-shard paragraph counts; damaged doc drops")
      val streamed = graft.ext.Doc.docExtractWithTs(
        Seq((1L, ts(2), blobs(1L))).toDF("doc_id", "ts", "payload")).collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
      val batch = graft.ext.Doc.docExtract(
        Seq((1L, blobs(1L))).toDF("doc_id", "payload")).collect()
        .map(p => (p.para_idx, p.doc_id, p.n_chars)).sorted.toSeq
      assert(streamed == batch, "doc batch and streaming agree record for record")
    } finally q.stop()
  }

  test("xls stream: twin finalizes with damage drop and batch parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ids = 0L until 8L
    val idsDf = ids.toDF("doc_id")
    val blobs = graft.ext.Xls.encodeXls(idsDf)
      .as[(Long, Array[Byte])].collect().toMap
    val batchRows = graft.ext.Xls.xlsCells(graft.ext.Xls.encodeXls(idsDf)).collect()
    val in = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q = StreamingArchiveIngest.ingestXls(
      in.toDF().toDF("doc_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("xls_ingest_out").outputMode("append").start()
    try {
      in.addData(ids.map(i => (i, ts(2), if (i == 3L) blobs(i).take(600) else blobs(i))): _*)
      q.processAllAvailable()
      in.addData((0L, ts(40), blobs(0L))) // advance watermark: finalize [0,10)
      q.processAllAvailable()
      val rows = spark.table("xls_ingest_out").collect()
        .filter(_.getTimestamp(0).getTime == 0L)
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      val expected = batchRows.filterNot(_.doc_id == 3L)
        .groupBy(_.doc_id % 16).view.mapValues(_.length.toLong).toMap
      assert(rows == expected, "per-shard cell counts; damaged workbook drops")
    } finally q.stop()
  }

  test("odt stream: twin finalizes with damage drop and batch parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ids = 0L until 8L
    val idsDf = ids.toDF("doc_id")
    val blobs = graft.ext.Odt.encodeOdt(idsDf)
      .as[(Long, Array[Byte])].collect().toMap
    val batchRows = graft.ext.Odt.odtExtract(graft.ext.Odt.encodeOdt(idsDf)).collect()
    val in = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q = StreamingArchiveIngest.ingestOdt(
      in.toDF().toDF("doc_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("odt_ingest_out").outputMode("append").start()
    try {
      in.addData(ids.map(i => (i, ts(2), if (i == 4L) blobs(i).take(64) else blobs(i))): _*)
      q.processAllAvailable()
      in.addData((0L, ts(40), blobs(0L)))
      q.processAllAvailable()
      val rows = spark.table("odt_ingest_out").collect()
        .filter(_.getTimestamp(0).getTime == 0L)
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      val expected = batchRows.filterNot(_.doc_id == 4L)
        .groupBy(_.doc_id % 16).view.mapValues(_.length.toLong).toMap
      assert(rows == expected, "per-shard paragraph counts; damaged odt drops")
      val streamed = graft.ext.Odt.odtExtractWithTs(
        Seq((1L, ts(2), blobs(1L))).toDF("doc_id", "ts", "payload")).collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
      val batch = graft.ext.Odt.odtExtract(
        Seq((1L, blobs(1L))).toDF("doc_id", "payload")).collect()
        .map(p => (p.para_idx, p.doc_id, p.n_chars)).sorted.toSeq
      assert(streamed == batch, "odt batch and streaming agree record for record")
    } finally q.stop()
  }

  test("pptx stream: twin finalizes with damage drop and batch parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ids = 0L until 8L
    val idsDf = ids.toDF("doc_id")
    val blobs = graft.ext.Pptx.encodePptx(idsDf)
      .as[(Long, Array[Byte])].collect().toMap
    val batchRows = graft.ext.Pptx.pptxExtract(graft.ext.Pptx.encodePptx(idsDf)).collect()
    val in = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q = StreamingArchiveIngest.ingestPptx(
      in.toDF().toDF("doc_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("pptx_ingest_out").outputMode("append").start()
    try {
      in.addData(ids.map(i => (i, ts(2), if (i == 6L) blobs(i).take(96) else blobs(i))): _*)
      q.processAllAvailable()
      in.addData((0L, ts(40), blobs(0L)))
      q.processAllAvailable()
      val rows = spark.table("pptx_ingest_out").collect()
        .filter(_.getTimestamp(0).getTime == 0L)
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      val expected = batchRows.filterNot(_.doc_id == 6L)
        .groupBy(_.doc_id % 16).view.mapValues(_.length.toLong).toMap
      assert(rows == expected, "per-shard slide counts; damaged pptx drops")
      val streamed = graft.ext.Pptx.pptxExtractWithTs(
        Seq((1L, ts(2), blobs(1L))).toDF("doc_id", "ts", "payload")).collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
      val batch = graft.ext.Pptx.pptxExtract(
        Seq((1L, blobs(1L))).toDF("doc_id", "payload")).collect()
        .map(s => (s.slide_idx, s.doc_id, s.n_chars)).sorted.toSeq
      assert(streamed == batch, "pptx batch and streaming agree record for record")
    } finally q.stop()
  }

  test("rtf stream: twin finalizes with damage drop and batch parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ids = 0L until 8L
    val idsDf = ids.toDF("doc_id")
    val blobs = graft.ext.Rtf.encodeRtf(idsDf)
      .as[(Long, Array[Byte])].collect().toMap
    val batchRows = graft.ext.Rtf.rtfExtract(graft.ext.Rtf.encodeRtf(idsDf)).collect()
    val in = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q = StreamingArchiveIngest.ingestRtf(
      in.toDF().toDF("doc_id", "ts", "payload"),
      watermarkDelay = "5 minutes", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("rtf_ingest_out").outputMode("append").start()
    try {
      in.addData(ids.map(i => (i, ts(2), if (i == 3L) blobs(i).dropRight(2) else blobs(i))): _*)
      q.processAllAvailable()
      in.addData((0L, ts(40), blobs(0L)))
      q.processAllAvailable()
      val rows = spark.table("rtf_ingest_out").collect()
        .filter(_.getTimestamp(0).getTime == 0L)
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      val expected = batchRows.filterNot(_.doc_id == 3L)
        .groupBy(_.doc_id % 16).view.mapValues(_.length.toLong).toMap
      assert(rows == expected, "per-shard paragraph counts; damaged rtf drops")
      val streamed = graft.ext.Rtf.rtfExtractWithTs(
        Seq((1L, ts(2), blobs(1L))).toDF("doc_id", "ts", "payload")).collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
      val batch = graft.ext.Rtf.rtfExtract(
        Seq((1L, blobs(1L))).toDF("doc_id", "payload")).collect()
        .map(p => (p.para_idx, p.doc_id, p.n_chars)).sorted.toSeq
      assert(streamed == batch, "rtf batch and streaming agree record for record")
    } finally q.stop()
  }
}
