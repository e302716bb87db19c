package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Archives

/** The live-ingest twin of [[graft.ext.Archives.warcExtract]]: crawl
  * segments (.warc.gz blobs) arrive as an unbounded stream — in
  * production from a file-source watching the fetcher's output directory
  * — and are demuxed, decoded, and reduced to per-window ingest
  * throughput as they land, instead of in nightly batches.
  *
  *  1. record extraction is the SAME stateless flatMap the batch path
  *     uses ([[Archives.warcExtractWithTs]] — gzip member split on the
  *     inflate end position, strict WARC header parse, whole-archive
  *     drop on damage), so batch and stream cannot diverge on what a
  *     record is;
  *  2. a watermark bounds state, then a tumbling window per archive
  *     aggregates records and bytes — the crawl-operations view (is the
  *     fetcher healthy? are segments arriving corrupt?) with bounded
  *     memory at any ingest rate.
  *
  * Output (append mode, finalized on watermark): window_start,
  * archive_id, n_records, total_bytes, n_docs.
  *
  * 100 TB shape: the flatMap is map-only (parallelism = arriving blobs),
  * the aggregation state is one row per (window, archive) — segments per
  * watermark horizon, not records — and nothing holds a decompressed
  * archive beyond its own task.
  */
object StreamingArchiveIngest {

  def ingest(
      archives: DataFrame,
      watermarkDelay: String,
      windowLength: String,
      maxRecordBytes: Int = 1 << 26): DataFrame =
    windowed(Archives.warcExtractWithTs(archives, maxRecordBytes),
      watermarkDelay, windowLength)

  /** The `.zst` segment twin: live multi-frame zstd archives (skippable
    * id frame + data frame per record, the seekable-zstd layout) routed
    * through the SAME demux the batch path uses
    * ([[graft.ext.Zstd.zstExtractWithTs]]) and the same watermarked
    * window reduction — a fetcher flushing `.zst` instead of `.warc.gz`
    * gets the identical operations view, damage-drop included.
    */
  def ingestZst(
      archives: DataFrame,
      watermarkDelay: String,
      windowLength: String,
      maxRecordBytes: Int = 1 << 26): DataFrame =
    windowed(graft.ext.Zstd.zstExtractWithTs(archives, maxRecordBytes),
      watermarkDelay, windowLength)

  /** The `.bz2` segment twin: live multi-stream bzip2 archives (one
    * stream per record, the lbzip2 convention — the shape Wikipedia
    * dump splitters emit) routed through the SAME demux as the batch
    * path ([[graft.ext.Bzip2.bz2ExtractWithTs]] — block and stream CRCs
    * both verified) and the same watermarked window reduction, with
    * whole-segment damage drop.
    */
  def ingestBz2(
      archives: DataFrame,
      watermarkDelay: String,
      windowLength: String,
      maxRecordBytes: Int = 1 << 26): DataFrame =
    windowed(graft.ext.Bzip2.bz2ExtractWithTs(archives, maxRecordBytes),
      watermarkDelay, windowLength)

  /** The `.xz` segment twin: live multistream xz archives (one stream
    * per record — the Wikimedia multistream convention) routed through
    * the SAME demux as the batch path
    * ([[graft.ext.Xz.xzExtractWithTs]] — container CRCs, LZMA2 decode,
    * index and footer cross-checks all live) and the shared watermarked
    * window reduction, with whole-segment damage drop.
    */
  def ingestXz(
      archives: DataFrame,
      watermarkDelay: String,
      windowLength: String,
      maxRecordBytes: Int = 1 << 26): DataFrame =
    windowed(graft.ext.Xz.xzExtractWithTs(archives, maxRecordBytes),
      watermarkDelay, windowLength)

  /** The CODED-BODY twin: live `.warc.gz` segments whose HTTP payloads
    * carry `Content-Encoding` (gzip/deflate/br, RFC 9110 layering)
    * routed through the SAME six-layer decode the batch path uses
    * ([[Archives.warcHttpEncExtractWithTs]]) and the same watermarked
    * window reduction — `total_bytes` reports DECODED body bytes, the
    * number a crawl operator budgets. Damage anywhere in any layer
    * (member framing, WARC header, HTTP framing, content coding) drops
    * the whole segment, exactly like batch.
    */
  def ingestHttpEnc(
      archives: DataFrame,
      watermarkDelay: String,
      windowLength: String,
      maxRecordBytes: Int = 1 << 26): DataFrame =
    windowed(Archives.warcHttpEncExtractWithTs(archives, maxRecordBytes),
      watermarkDelay, windowLength)

  /** The TEXT-PLANE twin: the seven-layer charset capstone as live
    * ingest ([[Archives.warcHttpCharsetExtractWithTs]]) — per-window
    * totals count TRANSCODED UTF-8 bytes, the corpus-operator number
    * after both the coding and charset planes; damage in any of the
    * seven layers drops the segment whole.
    */
  def ingestCharset(
      archives: DataFrame,
      watermarkDelay: String,
      windowLength: String,
      maxRecordBytes: Int = 1 << 26): DataFrame =
    windowed(Archives.warcHttpCharsetExtractWithTs(archives, maxRecordBytes),
      watermarkDelay, windowLength)

  /** The DATA-LAKE twin: live Avro Object Container drops routed
    * through the SAME sync-verified demux as the batch path
    * ([[graft.ext.Avro.avroExtractWithTs]] — metadata, codecs, block
    * sync markers, exact-consumption checks all live) and the shared
    * watermarked window reduction, damage-drop included.
    */
  def ingestAvro(
      archives: DataFrame,
      watermarkDelay: String,
      windowLength: String,
      maxBlockBytes: Int = 1 << 26): DataFrame =
    windowed(graft.ext.Avro.avroExtractWithTs(archives, maxBlockBytes),
      watermarkDelay, windowLength)

  /** The ML-SHARD twin: live TFRecord shards (a conversion fleet lands
    * shards continuously) routed through the SAME double-CRC demux as
    * the batch path ([[graft.ext.TfRecord.tfrecordExtractWithTs]]) and
    * the shared watermarked window reduction, damage-drop included.
    */
  def ingestTfrecord(
      archives: DataFrame,
      watermarkDelay: String,
      windowLength: String,
      maxRecordBytes: Int = 1 << 26): DataFrame =
    windowed(graft.ext.TfRecord.tfrecordExtractWithTs(archives, maxRecordBytes),
      watermarkDelay, windowLength)

  /** The MAIL twin: live mbox segments (mail genuinely arrives as a
    * stream) routed through the SAME four-layer parse as the batch path
    * ([[graft.ext.Mbox.mboxExtractWithTs]] — mboxrd framing, header
    * unfolding, multipart leaf selection, transfer decode) and the
    * shared watermarked window reduction; `total_bytes` counts DECODED
    * text/plain bytes, and a damaged archive contributes nothing,
    * exactly like batch.
    */
  def ingestMbox(
      archives: DataFrame,
      watermarkDelay: String,
      windowLength: String): DataFrame =
    windowed(graft.ext.Mbox.mboxExtractWithTs(archives),
      watermarkDelay, windowLength)

  /** The BOOKS twins: live PDF / EPUB drops (a books shelf lands in
    * batches from scanners and publisher feeds) routed through the SAME
    * whole-document parses as the batch keys
    * ([[graft.ext.Pdf.pdfExtractWithTs]] /
    * [[graft.ext.Epub.epubExtractWithTs]] — xref/object-graph walk and
    * OCF/OPF/XHTML composition respectively) and the shared watermarked
    * window reduction; `total_bytes` counts EXTRACTED text bytes per
    * page/chapter, and a damaged book contributes nothing, exactly like
    * batch.
    */
  def ingestPdf(
      books: DataFrame,
      watermarkDelay: String,
      windowLength: String): DataFrame =
    windowed(graft.ext.Pdf.pdfExtractWithTs(books), watermarkDelay, windowLength)

  def ingestEpub(
      books: DataFrame,
      watermarkDelay: String,
      windowLength: String): DataFrame =
    windowed(graft.ext.Epub.epubExtractWithTs(books), watermarkDelay, windowLength)

  /** The OFFICE twin: live DOCX drops through the same OPC/
    * WordprocessingML parse as the batch key
    * ([[graft.ext.Docx.docxExtractWithTs]]) and the shared watermarked
    * window reduction; `total_bytes` counts extracted PARAGRAPH text
    * bytes, and a damaged document contributes nothing, exactly like
    * batch.
    */
  def ingestDocx(
      docs: DataFrame,
      watermarkDelay: String,
      windowLength: String): DataFrame =
    windowed(graft.ext.Docx.docxExtractWithTs(docs), watermarkDelay, windowLength)

  def ingestOdt(
      docs: DataFrame,
      watermarkDelay: String,
      windowLength: String): DataFrame =
    windowed(graft.ext.Odt.odtExtractWithTs(docs), watermarkDelay, windowLength)

  def ingestDoc(
      docs: DataFrame,
      watermarkDelay: String,
      windowLength: String): DataFrame =
    windowed(graft.ext.Doc.docExtractWithTs(docs), watermarkDelay, windowLength)

  def ingestXls(
      workbooks: DataFrame,
      watermarkDelay: String,
      windowLength: String): DataFrame =
    windowed(graft.ext.Xls.xlsCellsWithTs(workbooks), watermarkDelay, windowLength)

  def ingestPptx(
      decks: DataFrame,
      watermarkDelay: String,
      windowLength: String): DataFrame =
    windowed(graft.ext.Pptx.pptxExtractWithTs(decks), watermarkDelay, windowLength)

  def ingestRtf(
      docs: DataFrame,
      watermarkDelay: String,
      windowLength: String): DataFrame =
    windowed(graft.ext.Rtf.rtfExtractWithTs(docs), watermarkDelay, windowLength)

  /** The shared reduction: watermark, tumbling window per archive,
    * records/bytes/approx-distinct docs. One state row per
    * (window, archive) regardless of ingest rate.
    */
  private def windowed(records: DataFrame, watermarkDelay: String,
      windowLength: String): DataFrame =
    records
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("archive_id"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(col("content_length")).as("total_bytes"),
        // exact distinct is unsupported under streaming aggregation; the
        // HLL sketch is the standard bounded-state substitute
        approx_count_distinct(col("rec_doc_id")).as("n_docs"))
      .select(col("w.start").as("window_start"), col("archive_id"),
        col("n_records"), col("total_bytes"), col("n_docs"))
}
