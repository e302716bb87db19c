package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (north star, SURVEY §7.6).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; linear in corpus size, the recall baseline.
  *  - [[ivfTopK]]: IVF-style ANN — train a small k-means coarse quantizer on
  *    a driver-side sample (standard practice: quantizer training is
  *    sample-based even at 100 TB), broadcast the centroids, assign corpus
  *    vectors to their nearest centroid (one codegen'd pass), then search
  *    only the `nprobe` closest clusters per query. Cuts compared pairs by
  *    ~nlist/nprobe at equal recall for clustered data.
  */
object Similarity {

  /** Exact cosine top-k neighbors for each query vector.
    * Output: query_id, rnk (1-based), neighbor_id, cosine.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val prep = (df: DataFrame, id: String, e: String, nrm: String) =>
      df.select(col(idCol).as(id), toDoubleArray(col(vecCol)).as(e))
        .withColumn(nrm, l2Norm(col(e)))
    val c = prep(corpus, "neighbor_id", "e_c", "nrm_c")
    val q = prep(queries, "query_id", "e_q", "nrm_q")
    val cos = cosineWithNorms(col("e_q"), col("e_c"), col("nrm_q"), col("nrm_c"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id", "cosine")
  }

  /** Deterministic k-means on a driver-side sample: init = first `k` vectors
    * (by id order), fixed Lloyd iterations, L2 on raw vectors.
    */
  private[ext] def kmeansCentroids(
      sample: Array[Array[Double]],
      k: Int,
      iterations: Int): Array[Array[Double]] = {
    val dim = sample.head.length
    var centroids = sample.take(k).map(_.clone())
    for (_ <- 0 until iterations) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  /** IVF top-k: probe the `nprobe` nearest clusters per query.
    * Output: query_id, rnk, neighbor_id, cosine (approximate neighbors).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      nlist: Int = 16,
      nprobe: Int = 4,
      kmeansIterations: Int = 5,
      trainSample: Int = 10000,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val prepped = corpus
      .select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("e"))
      .withColumn("nrm", l2Norm(col("e")))

    // 1. train the coarse quantizer on a bounded, deterministic sample
    val sample = prepped
      .orderBy("id")
      .limit(trainSample)
      .select("e")
      .as[Seq[Double]]
      .collect()
      .map(_.toArray)
    val centroids = kmeansCentroids(sample, math.min(nlist, sample.length), kmeansIterations)
    val centroidDf = broadcast(
      centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }
        .toSeq
        .toDF("cluster", "ce"))

    // 2. assign corpus vectors to nearest centroid (single broadcast pass)
    def l2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val wAssign = Window.partitionBy("id").orderBy(col("dist"), col("cluster"))
    val assigned = prepped
      .join(centroidDf)
      .select(col("id"), col("e"), col("nrm"), col("cluster"), l2(col("e"), col("ce")).as("dist"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("id").as("neighbor_id"), col("e").as("e_c"), col("nrm").as("nrm_c"), col("cluster"))

    // 3. queries probe their nprobe nearest clusters
    val q = queries
      .select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("e_q"))
      .withColumn("nrm_q", l2Norm(col("e_q")))
    val probes = q
      .join(centroidDf)
      .select(col("query_id"), col("e_q"), col("nrm_q"), col("cluster"), l2(col("e_q"), col("ce")).as("dist"))
      .withColumn("rn", row_number().over(Window.partitionBy("query_id").orderBy(col("dist"), col("cluster"))))
      .filter(col("rn") <= nprobe)
      .select("query_id", "e_q", "nrm_q", "cluster")

    // 4. exact cosine within probed clusters only
    val cos = cosineWithNorms(col("e_q"), col("e_c"), col("nrm_q"), col("nrm_c"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(probes)
      .join(assigned, Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id", "cosine")
  }
}
