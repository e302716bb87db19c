package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ======== Frame-of-reference bit-packing (columnar integer codec) ========
  *
  * The encoding real columnar formats use for integer columns (parquet's
  * DELTA_BINARY_PACKED family, ORC, Arrow): per fixed-size block, store
  * `min` once and pack every `value − min` in exactly
  * `ceil(log2(max − min + 1))` bits, LSB-first — so a block of 128
  * near-constant 64-bit keys costs 128·w bits for tiny w instead of 8 KiB.
  *
  * Blocks are formed DISTRIBUTEDLY: values bucket by a hash key and rank
  * within their bucket under a total order, so no global sort exists
  * anywhere (the window partitions by bucket). The emitted `width` and
  * `n_bytes` follow a closed form the oracle recomputes
  * (`len(bin(max−min))` bits, `ceil(n·w/8)` bytes), and `checksum` folds
  * the DECODED values in rank order — encode∘decode must be the identity
  * and the encoder must be width-canonical for the hash to match.
  *
  * No reference citation — the reference has no storage path; north-star
  * columnar-kernel scope next to the varint postings codec
  * ([[InvertedIndex]]).
  */
object BitPack {

  final case class PackedBlock(
      bucket: Long, block_id: Long, n_vals: Long, minv: Long, maxv: Long,
      width: Long, n_bytes: Long, checksum: Long)

  private val ChecksumMod = 1000000007L

  private[ext] def widthFor(delta: Long): Int = {
    require(delta >= 0, "frame delta must be non-negative")
    if (delta == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(delta)
  }

  /** Pack deltas LSB-first at `width` bits each. */
  private[ext] def pack(deltas: Array[Long], width: Int): Array[Byte] = {
    val out = new Array[Byte]((deltas.length * width + 7) / 8)
    var bit = 0
    deltas.foreach { d =>
      var k = 0
      while (k < width) {
        if (((d >>> k) & 1L) != 0L) out(bit / 8) = (out(bit / 8) | (1 << (bit % 8))).toByte
        bit += 1
        k += 1
      }
    }
    out
  }

  private[ext] def unpack(bytes: Array[Byte], n: Int, width: Int): Array[Long] = {
    val out = new Array[Long](n)
    var bit = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var k = 0
      while (k < width) {
        if (bit / 8 >= bytes.length) throw new IllegalArgumentException("truncated bitpack block")
        if (((bytes(bit / 8) >> (bit % 8)) & 1) != 0) v |= 1L << k
        bit += 1
        k += 1
      }
      out(i) = v
      i += 1
    }
    out
  }

  /** Pack an integer column into per-(bucket, block) frames.
    *
    * `keyCols` define the total order within a bucket (and the bucket via
    * hash of the first key); `valueCol` is the packed column.
    */
  def packedBlocks(df: DataFrame, keyCols: Seq[String], valueCol: String,
      nBuckets: Int = 64, blockSize: Int = 128): Dataset[PackedBlock] = {
    require(keyCols.nonEmpty && nBuckets >= 1 && blockSize >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = df
      .filter(col(valueCol).isNotNull && keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        (col(keyCols.head).cast("long") % nBuckets).as("bucket") +:
          keyCols.map(col) :+ col(valueCol).cast("long").as("__v"): _*)
      .filter(col("bucket") >= 0)
      // the value joins the ordering as the FINAL tie-break: key columns
      // need not be unique (this corpus has duplicate (orderkey, lineno)
      // pairs), and once remaining ties carry equal values, any rank
      // assignment among them yields identical blocks — the order is
      // result-total even where it is not row-total
      .withColumn("__rk",
        row_number().over(
          Window.partitionBy("bucket").orderBy(keyCols.map(col) :+ col("__v"): _*)) - 1)
    ranked
      .groupBy(col("bucket"), expr(s"__rk DIV $blockSize").as("block_id"))
      .agg(sort_array(collect_list(struct(col("__rk"), col("__v")))).as("xs"))
      .select(col("bucket"), col("block_id"),
        expr("transform(xs, x -> x.__v)").as("vs"))
      .as[(Long, Long, Seq[Long])]
      .map { case (bucket, blockId, vs) =>
        val arr = vs.toArray
        val minv = arr.min
        val maxv = arr.max
        val w = widthFor(maxv - minv)
        val bytes = pack(arr.map(_ - minv), w)
        val back = unpack(bytes, arr.length, w).map(_ + minv)
        require(java.util.Arrays.equals(back, arr),
          s"bitpack round-trip failed for bucket $bucket block $blockId")
        var cs = 0L
        back.foreach { v => cs = (cs * 31L + java.lang.Math.floorMod(v, ChecksumMod)) % ChecksumMod }
        PackedBlock(bucket, blockId, arr.length.toLong, minv, maxv,
          w.toLong, bytes.length.toLong, cs)
      }
  }
}
