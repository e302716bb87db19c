package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.toDoubleArray

/** Embedding compression for memory-bound similarity search (north star,
  * SURVEY §7.6): per-vector symmetric int8 scalar quantization — the
  * standard first rung of the ANN memory ladder (float32 -> int8 is 4x
  * smaller with recall loss usually < 1% at 64-256 dims; product
  * quantization would be the next rung).
  *
  * Engine-portable math on purpose, so the whole codec is DuckDB-oracle
  * checkable bitwise:
  *  - scale = max |x_i| (max of exact doubles — order-independent);
  *  - q_i = floor(x_i / scale * 127) — floor, NOT round: round-half rules
  *    differ across engines at midpoints, floor of the identical double is
  *    identical everywhere. q_i ∈ [-127, 127];
  *  - dequant x̂_i = q_i * scale / 127; reconstruction error folds
  *    left-to-right like every other vector reduction in this library.
  *
  * Expressed through Catalyst higher-order functions: this is a once-per
  * -corpus compression pass (write-amortized), not a per-query hot path —
  * if it ever becomes one, the [[graft.functions.VectorExpressions]]
  * pattern (native expression with a primitive loop) is the upgrade.
  */
object Quantization {

  /** id, e (double vector), scale, q (int8 codes as array<int>). */
  def scalarQuantize(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = toDoubleArray(col(vecCol))
    embeddings
      .select(col(idCol), e.as("e"))
      .withColumn("scale", aggregate(col("e"), lit(0.0), (a, x) => greatest(a, abs(x))))
      .withColumn("q",
        when(col("scale") > 0,
          transform(col("e"), x => floor(x / col("scale") * 127).cast("int")))
          .otherwise(transform(col("e"), _ => lit(0))))
  }

  /** Quantization quality per vector: the code checksum (exact) and the
    * squared reconstruction error (left fold). `q_sum` is the cheap
    * integrity probe a backfill job logs per shard; `recon_err` is the
    * quality metric that decides whether int8 suffices or PQ is needed.
    */
  def quantizationStats(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    scalarQuantize(embeddings, idCol, vecCol)
      .select(
        col(idCol),
        col("scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
        aggregate(
          zip_with(col("e"), col("q"), (x, qv) =>
            (x - qv.cast("double") * col("scale") / 127) * (x - qv.cast("double") * col("scale") / 127)),
          lit(0.0), (a, x) => a + x).as("recon_err"))

  /** Per-subspace k-means codebooks from the bounded hash-ordered sample
    * (slice j covers dims [j*sub, (j+1)*sub)). Shared by [[productQuantize]]
    * and [[Similarity.pqTopK]] so encode and search can never train
    * different books for the same parameters.
    */
  private[ext] def trainCodebooks(
      clean: DataFrame,
      dim: Int,
      m: Int,
      codebookSize: Int,
      trainSample: Int,
      kmeansIterations: Int,
      idCol: String,
      vecCol: String): Option[Array[Array[Array[Double]]]] = {
    require(m >= 1 && dim >= m && dim % m == 0, "need m >= 1 and dim divisible by m")
    require(codebookSize >= 1, "need codebookSize >= 1")
    val sub = dim / m
    val sampleRaw = Similarity.hashOrderedSample(clean, idCol, vecCol, trainSample)
      .filter(_.length >= dim)
    // None on an empty (or all-shorter-than-dim) corpus: callers return a
    // typed empty frame, the ivfTopK/ivfCosinePairs contract, instead of
    // throwing where the sibling search paths don't
    if (sampleRaw.isEmpty) None
    else Some(Array.tabulate(m) { j =>
      Similarity.kmeansCentroids(
        sampleRaw.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub)),
        math.min(codebookSize, sampleRaw.length),
        kmeansIterations)
    })
  }

  /** Squared L2 between a subvector of `v` at `off` and a centroid. */
  private[ext] def subDist(v: Array[Double], off: Int, cent: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < cent.length) { val t = v(off + i) - cent(i); d += t * t; i += 1 }
    d
  }

  /** THE PQ encode: per subspace, the strict-< first-lowest-wins argmin
    * over the codebook (the library-wide tie rule), plus the total
    * reconstruction error. The single definition both [[productQuantize]]
    * and [[Similarity.pqTopK]] call — stored codes and search-side codes
    * cannot diverge.
    */
  private[ext] def encode(
      books: Array[Array[Array[Double]]], sub: Int, v: Array[Double]): (Array[Int], Double) = {
    val code = new Array[Int](books.length)
    var err = 0.0
    var j = 0
    while (j < books.length) {
      val book = books(j)
      val off = j * sub // longer-than-dim vectors encode their dim prefix
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val d = subDist(v, off, book(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code(j) = best
      err += bestD
      j += 1
    }
    (code, err)
  }

  /** Product quantization — the second rung of the ANN memory ladder: split
    * each d-dim vector into `m` contiguous subvectors, train a per-subspace
    * k-means codebook of `codebookSize` centroids on a bounded driver-side
    * sample (the IVF pattern: [[Similarity.hashOrderedSample]] +
    * [[Similarity.kmeansCentroids]] — deterministic for fixed data), and
    * encode every vector as `m` small centroid ids. At `m = 8`,
    * `codebookSize = 256` a 64-dim float vector compresses 32x (256 bytes
    * -> 8), with distances computable from codebook lookup tables.
    *
    * Encoding is ONE shuffle-free `mapPartitions` pass against the
    * broadcast codebooks ([[encode]] — primitive argmin per subspace,
    * strict `<` first-lowest wins, the library-wide tie rule). Vectors
    * shorter than `dim` are excluded ([[graft.ext.Features.covariance]]'s
    * convention); null ids/vectors likewise; an empty (or
    * all-shorter-than-dim) corpus yields a typed empty frame.
    *
    * Output: `idCol`, `code` (array<int>, length m, values in
    * [0, codebookSize)), `recon_err` (squared L2 distance between the
    * vector and its codebook reconstruction — the per-row quality number
    * that decides whether PQ suffices at this m, exactly like
    * [[quantizationStats]]' recon_err does for int8).
    */
  def productQuantize(
      embeddings: DataFrame,
      dim: Int,
      m: Int = 8,
      codebookSize: Int = 16,
      trainSample: Int = 10000,
      kmeansIterations: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val clean = embeddings.filter(
      col(idCol).isNotNull && col(vecCol).isNotNull && size(col(vecCol)) >= dim)
    val emptyOut = Similarity.emptyFrame(spark,
      idCol -> org.apache.spark.sql.types.LongType,
      "code" -> org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false),
      "recon_err" -> org.apache.spark.sql.types.DoubleType)
    val codebooks = trainCodebooks(
      clean, dim, m, codebookSize, trainSample, kmeansIterations, idCol, vecCol)
      .getOrElse(return emptyOut)
    val sub = dim / m
    val bc = spark.sparkContext.broadcast(codebooks)
    clean
      .select(col(idCol).cast("long"), toDoubleArray(col(vecCol)))
      .as[(Long, Seq[Double])]
      .mapPartitions { rows =>
        val books = bc.value
        rows.map { case (id, sv) =>
          val (code, err) = encode(books, sub, sv.toArray)
          (id, code.toSeq, err)
        }
      }
      .toDF(idCol, "code", "recon_err")
  }
}
