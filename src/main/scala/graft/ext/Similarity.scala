package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (north star, SURVEY §7.6).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query set
  *    against the corpus, then a bounded [[TopKAggregator]] so the shuffle
  *    carries O(k) rows per query instead of the |Q|x|C| cross product.
  *  - [[ivfTopK]]: IVF-style ANN — train a small k-means coarse quantizer on a
  *    bounded driver-side sample (standard practice even at 100 TB), then ONE
  *    corpus pass that assigns each vector to its nearest centroid with a
  *    primitive argmin loop against the broadcast centroids and scores it
  *    against only the queries probing that cluster — zero shuffles, zero
  *    joins before the bounded top-k aggregate.
  *  - [[srpCosinePairs]]: near-duplicate pairs by cosine via signed-random-
  *    projection LSH candidates + exact verification. The scale path for
  *    high thresholds (>= ~0.8); for low thresholds SRP bands stop
  *    discriminating and the exact pair join ([[Dedup.embeddingCosinePairs]])
  *    is the honest tool.
  */
object Similarity {

  private def prep(df: DataFrame, idCol: String, vecCol: String, id: String, e: String, nrm: String): DataFrame =
    df.select(col(idCol).as(id), toDoubleArray(col(vecCol)).as(e))
      .withColumn(nrm, l2Norm(col(e)))

  /** Shared primitive kernels. The left-to-right accumulation from 0.0 is
    * LOAD-BEARING: it is what keeps kernel results bitwise equal to the
    * expression forms and the external oracle — change in one place only.
    */
  private def prepTyped(df: DataFrame, idCol: String, vecCol: String) = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), toDoubleArray(col(vecCol)))
      .as[(Long, Seq[Double])]
      .map { case (id, v) => (id, v.toArray) }
  }

  private def normOf(v: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += v(i) * v(i); i += 1 }
    math.sqrt(acc)
  }

  private def dotOf(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def sqDistOf(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  /** THE nearest-centroid assignment: strict `<`, first-lowest wins — the
    * library-wide tie rule. One definition shared by the IVF top-k scan,
    * the IVF-PQ residual training, and the IVF-PQ corpus pass, so stored
    * assignments and search-side assignments cannot diverge (the
    * [[Quantization.encode]] rationale). Returns -1 for an empty centroid
    * set.
    */
  private def nearestCentroid(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = -1
    var bestD = Double.MaxValue
    var ci = 0
    while (ci < cents.length) {
      val d = sqDistOf(v, cents(ci))
      if (d < bestD) { bestD = d; best = ci }
      ci += 1
    }
    best
  }

  /** Typed empty result frame — one definition for every search path's
    * empty-corpus contract, so a column rename cannot silently diverge the
    * empty schema from the real one.
    */
  private[ext] def emptyFrame(
      spark: org.apache.spark.sql.SparkSession,
      fields: (String, org.apache.spark.sql.types.DataType)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        fields.map { case (n, t) => org.apache.spark.sql.types.StructField(n, t) }))

  private[ext] def emptyTopKFrame(
      spark: org.apache.spark.sql.SparkSession, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    emptyFrame(spark,
      "query_id" -> LongType, "rnk" -> LongType, "neighbor_id" -> LongType, scoreCol -> DoubleType)
  }

  /** Collect at most `maxRows` prepped vectors to the driver, failing with
    * routing guidance if the side is larger — one job, guard folded into the
    * collect itself (a separate count probe would re-execute the lineage).
    */
  private def collectDriverSized(
      df: DataFrame, idCol: String, vecCol: String, what: String, maxRows: Int,
      guidance: String = "use the LSH (srpCosinePairs) or IVF path at this scale"): Array[(Long, Array[Double])] = {
    val rows = prepTyped(df, idCol, vecCol).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$what exceeds $maxRows vectors; this path holds the $what on the driver — $guidance")
    rows
  }

  /** Score one corpus row against a set of (id, vector, norm) queries —
    * self-pair skipped, cosine = dot / (|q| |c|). SHARED by the brute-force
    * and IVF kernels on purpose: the left-to-right fold is load-bearing for
    * the bitwise oracle contract (ivf_topk_full must equal cosine_topk
    * exactly), so the scoring arithmetic must exist in exactly one place.
    */
  private def scoreAgainst(
      idC: Long, c: Array[Double],
      qs: Array[(Long, Array[Double], Double)]): Iterator[(Long, Long, Double)] =
    if (qs.isEmpty) Iterator.empty
    else {
      val nrmC = normOf(c)
      qs.iterator.flatMap { case (idQ, qv, nrmQ) =>
        if (idQ == idC) Iterator.empty
        else Iterator.single((idQ, idC, dotOf(qv, c) / (nrmQ * nrmC)))
      }
    }

  /** Bounded deterministic quantizer-training sample: orderBy(hash) + limit
    * compiles to TakeOrderedAndProject — a per-partition top-n plus a driver
    * merge of n*partitions rows, NOT a global sort — and hash order makes
    * the sample both reproducible on any partition layout and unbiased by
    * id locality. Null ids/vectors are excluded (they cannot train or be
    * assigned).
    */
  private[ext] def hashOrderedSample(
      corpus: DataFrame, idCol: String, vecCol: String, n: Int): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol)))
      .limit(n)
      .select(toDoubleArray(col(vecCol)).as("e"))
      .as[Seq[Double]]
      .collect()
      .map(_.toArray)
  }

  /** Corpus-adaptive quantizer sizing, shared by the IVF pair-search and
    * top-k paths: hold the EXPECTED CLUSTER POPULATION at `targetClusterSize`
    * so per-cluster work stays constant as the corpus grows. `assignments`
    * is N for top-k (each vector lives in one cell) and `nassign * N` for
    * pair search (each vector is filed under its `nassign` nearest cells).
    * Capped at `sampleLen` because k-means cannot train more centroids than
    * sample points — at extreme corpus/sample ratios raise the training
    * sample too, or the cap quietly re-grows the clusters this sizing
    * exists to bound.
    */
  private[ext] def deriveNlist(assignments: Long, targetClusterSize: Int, sampleLen: Int): Int = {
    require(targetClusterSize >= 1, "need targetClusterSize >= 1")
    val derived = (assignments + targetClusterSize - 1) / targetClusterSize
    math.max(1L, math.min(derived, sampleLen.toLong)).toInt
  }

  /** k-means from a raw sample, guarding degenerate input (train only on the
    * dominant dimensionality); None when there is nothing to train on.
    */
  private def trainQuantizer(
      sampleRaw: Array[Array[Double]], nlist: Int, iterations: Int): Option[Array[Array[Double]]] =
    sampleRaw.headOption.flatMap { head =>
      val dim = head.length
      val sample = sampleRaw.filter(v => v.length == dim && dim > 0)
      if (sample.isEmpty) None
      else Some(kmeansCentroids(sample, math.min(nlist, sample.length), iterations))
    }

  /** Shared verify stage of the candidate-pair paths (SRP and IVF buckets):
    * join the vectors back once per deduped candidate pair and keep exact
    * cosine >= threshold. Bitwise-sensitive (the oracle replays this exact
    * arithmetic) — change in one place only. `n` is a prep()'d frame with
    * columns (id, e, nrm).
    */
  private def verifyExactPairs(n: DataFrame, cands: DataFrame, threshold: Double): DataFrame = {
    val va = n.select(col("id").as("id_a"), col("e").as("e_a"), col("nrm").as("nrm_a"))
    val vb = n.select(col("id").as("id_b"), col("e").as("e_b"), col("nrm").as("nrm_b"))
    val cos = cosineWithNorms(col("e_a"), col("e_b"), col("nrm_a"), col("nrm_b"))
    cands
      .join(va, Seq("id_a"))
      .join(vb, Seq("id_b"))
      .select(col("id_a"), col("id_b"), cos.as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  private def topKSelect(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k), org.apache.spark.sql.Encoders.product[graft.functions.ScoredId])
    scored
      .groupBy("query_id")
      .agg(topk(col("neighbor_id"), col("cosine")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("long").as("rnk"),
        col("s.id").as("neighbor_id"),
        col("s.score").as("cosine"))
  }

  /** Exact cosine top-k neighbors for each query vector.
    * Output: query_id, rnk (1-based), neighbor_id, cosine.
    *
    * Plan shape at scale: one broadcast of the query set, one scan of the
    * corpus scoring against it in a primitive dot-product loop (the HOF
    * expression form evaluates interpreted — see [[cosinePairsExact]]),
    * partial top-k on the map side via [[TopKAggregator]], and a shuffle of
    * k rows per (query, partition) — never the |Q|x|C| cross product.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qArr = collectDriverSized(queries, idCol, vecCol, "query set", 100000,
      guidance = "split the query set into batches and union the results")
      .map { case (id, v) => (id, v, normOf(v)) }
    val bc = spark.sparkContext.broadcast(qArr)
    val scored = prepTyped(corpus, idCol, vecCol)
      .mapPartitions { rows =>
        val qs = bc.value
        rows.flatMap { case (idC, c) => scoreAgainst(idC, c, qs) }
      }
      .toDF("query_id", "neighbor_id", "cosine")
    topKSelect(scored, k)
  }

  /** Hard-negative mining for contrastive training: for each anchor, the
    * `k` HIGHEST-cosine corpus vectors whose label differs — the
    * near-miss negatives a triplet/InfoNCE loss learns most from
    * (random negatives, [[graft.ext.Sampling.negativeSamples]], are the
    * cheap complement; these are the expensive informative ones). The
    * [[bruteForceTopK]] topology with a label gate in the kernel:
    * anchors (a training batch — bounded, enforced) broadcast with their
    * labels; ONE corpus scan scores each row against every
    * different-label anchor through the SHARED left-to-right dot kernel
    * (bitwise equal to the oracle's `list_reduce` fold); partial top-k
    * per (anchor, partition) via [[graft.functions.TopKAggregator]], so
    * the shuffle carries k rows per anchor per partition — never the
    * |A|×|C| cross product, and never a window sort.
    *
    * Output: (anchor_id, rnk 1-based, neg_id, cosine). Corpus rows with
    * NULL label never match (they cannot be certified cross-label).
    */
  def hardNegatives(
      corpus: DataFrame,
      anchors: DataFrame,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val aRows = anchors
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).cast("long"), toDoubleArray(col(vecCol)), col(labelCol).cast("long"))
      .as[(Long, Seq[Double], Long)]
      .limit(100001)
      .collect()
    require(aRows.length <= 100000,
      "anchor set exceeds 100000 vectors; this path broadcasts the anchors — mine in batches")
    val qs = aRows.map { case (id, v, lbl) => (id, v.toArray, normOf(v.toArray), lbl) }
    val bc = spark.sparkContext.broadcast(qs)
    val scored = corpus
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).cast("long"), toDoubleArray(col(vecCol)), col(labelCol).cast("long"))
      .as[(Long, Seq[Double], Long)]
      .map { case (id, v, lbl) => (id, v.toArray, lbl) }
      .mapPartitions { rows =>
        val as = bc.value
        rows.flatMap { case (idC, c, lblC) =>
          val nrmC = normOf(c)
          as.iterator.flatMap { case (idA, av, nrmA, lblA) =>
            if (lblA == lblC || idA == idC) Iterator.empty
            else Iterator.single((idA, idC, dotOf(av, c) / (nrmA * nrmC)))
          }
        }
      }
      .toDF("query_id", "neighbor_id", "cosine")
    topKSelect(scored, k)
      .select(col("query_id").as("anchor_id"), col("rnk"),
        col("neighbor_id").as("neg_id"), col("cosine"))
  }

  /** Deterministic k-means on a driver-side sample: init = first `k` vectors
    * (in sample order), fixed Lloyd iterations, L2 on raw vectors.
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
    *
    * Scale notes (the classic IVF scale-killers are avoided by design):
    *  - quantizer training samples with `limit(n)` — NO global sort — and the
    *    sample is bounded regardless of corpus size;
    *  - the sample collect and the query collect are independent Spark jobs
    *    submitted concurrently, so quantizer training hides behind the query
    *    round-trip instead of serializing two driver collects (A/B-measured
    *    at sf0.1: concurrent averages ~0.2s faster over the two registered
    *    IVF keys than sequential collects, inside a ±0.7s per-query noise
    *    band — the concurrent form is kept because it can only help more as
    *    the collects grow);
    *  - `nlist <= 0` (the default) SIZES THE QUANTIZER TO THE CORPUS via
    *    [[deriveNlist]]: expected candidates scored per query are
    *    `nprobe * N / nlist`, so a FIXED nlist grows per-query work linearly
    *    with the corpus, while `nlist = ceil(N / targetClusterSize)` holds it
    *    at `~nprobe * targetClusterSize` — constant in N. Recall is then
    *    governed by `nprobe` alone: on a corpus with real cluster structure
    *    the true neighbors concentrate in a query's few nearest cells, so a
    *    fixed nprobe holds recall as the corpus (and nlist) grow; on
    *    structureless vectors recall tracks the probed fraction
    *    `nprobe / nlist` — raise nprobe or fall back to [[bruteForceTopK]],
    *    which is the honest tool there. Corpus size for the derivation is
    *    free when the training sample is not full (the sample IS the
    *    corpus); only corpora larger than `trainSample` pay one count job;
    *  - cluster assignment AND scoring happen in ONE `mapPartitions` pass
    *    over the corpus: a primitive argmin loop against the broadcast
    *    centroids (strict `<`, first-lowest wins) picks the cluster, and the
    *    row is scored only against the queries probing that cluster — no
    *    corpus x centroids join, no window shuffle, and no interpreted
    *    higher-order-function fold (Catalyst HOFs don't participate in
    *    whole-stage codegen; the previous expression-argmin form benched 4x
    *    slower than the exact kernel it approximates). The only shuffle is
    *    the bounded top-k aggregate (O(k) rows per query per partition).
    *
    * FP determinism: distances/dots/norms accumulate left-to-right from 0.0
    * — bit-identical to the expression forms and the external oracle.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      nlist: Int = 0,
      nprobe: Int = 4,
      kmeansIterations: Int = 5,
      trainSample: Int = 10000,
      targetClusterSize: Int = 256,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    require(nprobe >= 1, "need nprobe >= 1")

    // 1. bounded deterministic sample (see hashOrderedSample)
    val sampleF = Future { hashOrderedSample(corpus, idCol, vecCol, trainSample) }
    val queriesF = Future {
      // the query BATCH is driver-held and broadcast (as it was implicitly in
      // the previous broadcast-join formulation); corpora are unbounded,
      // query batches are not — split huge query sets into multiple calls
      collectDriverSized(queries, idCol, vecCol, "query set", 100000,
        guidance = "the query batch is broadcast to executors; split the query set into batches")
        .map { case (id, v) => (id, v, normOf(v)) }
    }
    // auto-size corpus count: speculatively concurrent with the collects
    // (it is consumed only when the training sample comes back full — on
    // small corpora the wasted job is one cheap scan, on large ones it no
    // longer serializes a third driver round-trip after the two collects)
    val countF: Option[Future[Long]] =
      if (nlist > 0) None
      else Some(Future { corpus.filter(col(idCol).isNotNull && col(vecCol).isNotNull).count() })
    val sampleRaw = Await.result(sampleF, Duration.Inf)
    val qArr = Await.result(queriesF, Duration.Inf)

    val emptyOut = emptyTopKFrame(spark, "cosine")
    val nlistEff =
      if (nlist > 0) nlist
      else {
        // each corpus vector lives in exactly ONE cell here (unlike the
        // pair search's nassign-way filing), so assignments = N
        val n = if (sampleRaw.length < trainSample) sampleRaw.length.toLong
                else Await.result(countF.get, Duration.Inf)
        deriveNlist(n, targetClusterSize, math.max(1, sampleRaw.length))
      }
    val centroids = trainQuantizer(sampleRaw, nlistEff, kmeansIterations).getOrElse(return emptyOut)

    // 2. driver-side probe map: each query probes its `nprobe` nearest
    //    centroids, ties by centroid id ascending (identical semantics to
    //    sorting (distance, cid) pairs). Tiny: |Q| x nlist distances. The
    //    per-cluster lists hold INDICES into the query array, so the
    //    broadcast ships each query vector once regardless of nprobe or the
    //    serializer's reference-tracking settings.
    val byCluster = Array.fill(centroids.length)(scala.collection.mutable.ArrayBuffer.empty[Int])
    qArr.zipWithIndex.foreach { case ((_, qv, _), qi) =>
      centroids.zipWithIndex
        .map { case (c, ci) => (sqDistOf(qv, c), ci) }
        .sortBy(identity)
        .take(nprobe)
        .foreach { case (_, ci) => byCluster(ci) += qi }
    }
    val bcCent = spark.sparkContext.broadcast(centroids)
    val bcQueries = spark.sparkContext.broadcast(qArr)
    val bcProbes = spark.sparkContext.broadcast(byCluster.map(_.toArray))

    // 3. one corpus pass: primitive argmin assignment + per-cluster scoring
    val scored = prepTyped(corpus, idCol, vecCol)
      .mapPartitions { rows =>
        val cents = bcCent.value
        val qs = bcQueries.value
        // resolve index lists to query tuples once per partition
        val probes = bcProbes.value.map(_.map(qs))
        rows.flatMap { case (idC, c) =>
          val best = nearestCentroid(c, cents)
          if (best < 0) Iterator.empty
          else scoreAgainst(idC, c, probes(best))
        }
      }
      .toDF("query_id", "neighbor_id", "cosine")
    topKSelect(scored, k)
  }

  /** PQ-ADC approximate nearest neighbors: encode the corpus with
    * per-subspace product-quantization codebooks ([[Quantization
    * .trainCodebooks]] — the same books `productQuantize` emits for these
    * parameters) and score each row against every query through
    * asymmetric-distance lookup tables. Per query and subspace the table
    * holds the exact squared L2 between the query's subvector and each
    * centroid, so a row costs `m` additions per query after one
    * code computation — versus `dim` multiply-adds for the exact kernel:
    * the classic memory-bound ANN scan (at m = 8, dim = 64, the per-query
    * inner loop is 8x smaller, and at scale the codes themselves are what
    * the executors keep hot, 32x smaller than the vectors).
    *
    * Output: query_id, rnk (1-based, ascending approximate distance),
    * neighbor_id, approx_dist (the ADC squared-L2 estimate — a DISTANCE:
    * unlike the cosine surfaces, smaller is closer). Self-pairs are kept
    * (the query's own code is its nearest reconstruction — drop
    * `query_id = neighbor_id` downstream if unwanted). Corpus rows and
    * queries shorter than `dim` are excluded ([[Quantization
    * .productQuantize]]'s convention). Approximate by construction:
    * recall floors are pinned in SimilaritySpec, and the shuffle is the
    * same bounded O(k)-per-(query, partition) top-k aggregate as every
    * other search path.
    *
    * `rerank >= k` enables the standard recall-recovery knob: the ADC scan
    * keeps the top `rerank` candidates per query, those candidate rows —
    * and ONLY those — are joined back to their true vectors and scored
    * exactly, and the final top-k ranks by TRUE squared L2 (`approx_dist`
    * then holds the exact distance). Whenever a query's true top-k sits
    * inside its ADC top-`rerank`, the reranked result IS the exact
    * result — at the cost of `rerank` exact distance computations per
    * query instead of |corpus|.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      dim: Int = 64,
      m: Int = 8,
      codebookSize: Int = 16,
      trainSample: Int = 10000,
      kmeansIterations: Int = 5,
      rerank: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    require(rerank <= 0 || rerank >= k,
      s"rerank must be 0 (ADC only) or >= k (exact rerank of the top-rerank candidates); got rerank=$rerank, k=$k")
    val clean = corpus.filter(
      col(idCol).isNotNull && col(vecCol).isNotNull && size(col(vecCol)) >= dim)
    // the codebook-training sample collect and the query collect are
    // independent Spark jobs — submit concurrently (the ivfTopK pattern,
    // A/B-measured there)
    val booksF = Future {
      Quantization.trainCodebooks(
        clean, dim, m, codebookSize, trainSample, kmeansIterations, idCol, vecCol)
    }
    val queriesF = Future {
      collectDriverSized(queries, idCol, vecCol, "query set", 100000,
        guidance = "the query batch is broadcast to executors; split the query set into batches")
        .filter(_._2.length >= dim)
    }
    val booksOpt = Await.result(booksF, Duration.Inf)
    val qArr = Await.result(queriesF, Duration.Inf)
    val emptyOut = emptyTopKFrame(spark, "approx_dist")
    // empty corpus -> typed empty frame, the ivfTopK contract
    val books = booksOpt.getOrElse(return emptyOut)
    val sub = dim / m
    // ADC tables: luts(q)(j)(c) = ||query_q[j*sub, (j+1)*sub) - books(j)(c)||^2
    val luts: Array[(Long, Array[Array[Double]])] = qArr.map { case (qid, qv) =>
      qid -> Array.tabulate(m)(j => books(j).map(c => Quantization.subDist(qv, j * sub, c)))
    }
    val bcBooks = spark.sparkContext.broadcast(books)
    val bcLuts = spark.sparkContext.broadcast(luts)
    val scored = prepTyped(clean, idCol, vecCol)
      .mapPartitions { rows =>
        val bks = bcBooks.value
        val ls = bcLuts.value
        rows.flatMap { case (id, v) =>
          // ONE shared encode per row (Quantization.encode — the same
          // codes productQuantize stores for these parameters)
          val (code, _) = Quantization.encode(bks, sub, v)
          // m table lookups per query
          ls.iterator.map { case (qid, lut) =>
            var dist = 0.0
            var jj = 0
            while (jj < code.length) { dist += lut(jj)(code(jj)); jj += 1 }
            (qid, id, -dist) // negated: the top-k aggregator keeps LARGEST scores
          }
        }
      }
      .toDF("query_id", "neighbor_id", "cosine")
    if (rerank <= 0) {
      topKSelect(scored, k)
        .select(col("query_id"), col("rnk"), col("neighbor_id"), (-col("cosine")).as("approx_dist"))
    } else {
      // candidate ids from the ADC scan; exact distances only for them
      exactRerankL2(clean, topKSelect(scored, rerank).select("query_id", "neighbor_id"),
        qArr, dim, k, idCol, vecCol)
    }
  }

  /** Shared exact-L2 rerank tail of the PQ search paths ([[pqTopK]],
    * [[ivfPqTopK]]): fetch each ADC candidate's vector once (one join of
    * the O(|Q| * rerank) candidate relation against the corpus), score it
    * exactly against its broadcast query, and keep the true top-k. This is
    * the production PQ shape — the ADC scan is the shortlist, the rerank
    * restores exact ordering — and its cost is bounded by the candidate
    * count, not the corpus.
    */
  private def exactRerankL2(
      clean: DataFrame,
      cands: DataFrame,
      qArr: Array[(Long, Array[Double])],
      dim: Int,
      k: Int,
      idCol: String,
      vecCol: String): DataFrame = {
    val spark = clean.sparkSession
    import spark.implicits._
    val bcQ = spark.sparkContext.broadcast(qArr.toMap)
    val vecs = prepTyped(clean, idCol, vecCol).toDF("neighbor_id", "__e")
    val exact = cands
      .join(vecs, Seq("neighbor_id"))
      .select(col("query_id").as("qid"), col("neighbor_id").as("nid"), col("__e"))
      .as[(Long, Long, Seq[Double])]
      .mapPartitions { rows =>
        val qs = bcQ.value
        rows.map { case (qid, nid, sv) =>
          val v = sv.toArray
          val q = qs(qid)
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - q(i); d += t * t; i += 1 }
          (qid, nid, -d)
        }
      }
      .toDF("query_id", "neighbor_id", "cosine")
    topKSelect(exact, k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), (-col("cosine")).as("approx_dist"))
  }

  /** IVF-PQ approximate nearest neighbors — the composition production ANN
    * systems deploy at corpus scale: a coarse quantizer routes each vector
    * to a cell ([[ivfTopK]]'s shape, auto-sized via [[deriveNlist]]), the
    * RESIDUAL `v - centroid` is product-quantized (classic IVF-PQ:
    * residuals concentrate near the origin, so the same codebook budget
    * quantizes them far more finely than raw vectors), and queries score
    * only the cells they probe, through per-(query, cell) ADC tables over
    * the residual space.
    *
    * One corpus pass, shuffle-free until the bounded top-k aggregate:
    * assignment is the primitive argmin, the residual encode is the shared
    * [[Quantization.encode]], and each partition builds a (cell, query)
    * LUT at most once. Per-row cost after assignment: one encode plus `m`
    * table additions per probing query. Approximate on BOTH axes (probed
    * fraction like [[ivfTopK]], quantization like [[pqTopK]]);
    * SimilaritySpec pins cluster-level recall and determinism. `rerank`
    * (the [[pqTopK]] option, same contract) exactly re-scores the ADC
    * top-`rerank` shortlist — the production tail that removes the
    * quantization axis from the final ordering.
    *
    * Output: query_id, rnk (ascending approximate distance), neighbor_id,
    * approx_dist. Conventions follow [[pqTopK]]: self-pairs kept, rows and
    * queries shorter than `dim` excluded, empty corpus yields a typed
    * empty frame.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      dim: Int = 64,
      nlist: Int = 0,
      nprobe: Int = 4,
      m: Int = 8,
      codebookSize: Int = 16,
      trainSample: Int = 10000,
      kmeansIterations: Int = 5,
      targetClusterSize: Int = 256,
      rerank: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    require(nprobe >= 1, "need nprobe >= 1")
    require(rerank <= 0 || rerank >= k,
      s"rerank must be 0 (ADC only) or >= k (exact rerank of the top-rerank candidates); got rerank=$rerank, k=$k")
    require(m >= 1 && dim >= m && dim % m == 0, "need m >= 1 and dim divisible by m")
    val sub = dim / m
    val clean = corpus.filter(
      col(idCol).isNotNull && col(vecCol).isNotNull && size(col(vecCol)) >= dim)
    val sampleF = Future {
      hashOrderedSample(clean, idCol, vecCol, trainSample)
        .filter(_.length >= dim).map(v => java.util.Arrays.copyOf(v, dim))
    }
    val queriesF = Future {
      collectDriverSized(queries, idCol, vecCol, "query set", 100000,
        guidance = "the query batch is broadcast to executors; split the query set into batches")
        .filter(_._2.length >= dim)
    }
    val countF: Option[Future[Long]] =
      if (nlist > 0) None else Some(Future { clean.count() })
    val sampleRaw = Await.result(sampleF, Duration.Inf)
    val qArr = Await.result(queriesF, Duration.Inf)
    val emptyOut = emptyTopKFrame(spark, "approx_dist")
    if (sampleRaw.isEmpty) return emptyOut
    val nlistEff =
      if (nlist > 0) nlist
      else {
        val n = if (sampleRaw.length < trainSample) sampleRaw.length.toLong
                else Await.result(countF.get, Duration.Inf)
        deriveNlist(n, targetClusterSize, sampleRaw.length)
      }
    val centroids = kmeansCentroids(sampleRaw, math.min(nlistEff, sampleRaw.length), kmeansIterations)
    // PQ books on the sample RESIDUALS against the trained coarse cells
    val residuals = sampleRaw.map { v =>
      val best = nearestCentroid(v, centroids)
      val r = new Array[Double](dim)
      var i = 0
      while (i < dim) { r(i) = v(i) - centroids(best)(i); i += 1 }
      r
    }
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      kmeansCentroids(
        residuals.map(r => java.util.Arrays.copyOfRange(r, j * sub, (j + 1) * sub)),
        math.min(codebookSize, residuals.length),
        kmeansIterations)
    }
    // probe map: query index lists per cell (ivfTopK's construction)
    val byCluster = Array.fill(centroids.length)(scala.collection.mutable.ArrayBuffer.empty[Int])
    qArr.zipWithIndex.foreach { case ((_, qv), qi) =>
      centroids.zipWithIndex
        .map { case (c, ci) => (sqDistOf(qv, c), ci) }
        .sortBy(identity)
        .take(nprobe)
        .foreach { case (_, ci) => byCluster(ci) += qi }
    }
    val bcCent = spark.sparkContext.broadcast(centroids)
    val bcBooks = spark.sparkContext.broadcast(books)
    val bcQueries = spark.sparkContext.broadcast(qArr)
    val bcProbes = spark.sparkContext.broadcast(byCluster.map(_.toArray))
    val scored = prepTyped(clean, idCol, vecCol)
      .mapPartitions { rows =>
        val cents = bcCent.value
        val bks = bcBooks.value
        val qs = bcQueries.value
        val probes = bcProbes.value
        // (cell -> per-probing-query residual ADC tables), built lazily at
        // most once per partition: lut(qi)(j)(c) over the cell's residual
        // space for query (q - centroid)
        val lutCache = new Array[Array[Array[Array[Double]]]](cents.length)
        def lutsFor(cell: Int): Array[Array[Array[Double]]] = {
          if (lutCache(cell) == null) {
            val cent = cents(cell)
            lutCache(cell) = probes(cell).map { qi =>
              val qv = qs(qi)._2
              val rq = new Array[Double](cent.length)
              var i = 0
              while (i < cent.length) { rq(i) = qv(i) - cent(i); i += 1 }
              Array.tabulate(bks.length)(j => bks(j).map(c2 => Quantization.subDist(rq, j * sub, c2)))
            }
          }
          lutCache(cell)
        }
        rows.flatMap { case (id, v) =>
          val best = nearestCentroid(v, cents)
          if (best < 0 || probes(best).isEmpty) Iterator.empty
          else {
            val cent = cents(best)
            val r = new Array[Double](cent.length)
            var i = 0
            while (i < cent.length) { r(i) = v(i) - cent(i); i += 1 }
            val (code, _) = Quantization.encode(bks, sub, r)
            val luts = lutsFor(best)
            val qis = probes(best)
            qis.indices.iterator.map { t =>
              val lut = luts(t)
              var dist = 0.0
              var jj = 0
              while (jj < code.length) { dist += lut(jj)(code(jj)); jj += 1 }
              (qs(qis(t))._1, id, -dist)
            }
          }
        }
      }
      .toDF("query_id", "neighbor_id", "cosine")
    if (rerank <= 0)
      topKSelect(scored, k)
        .select(col("query_id"), col("rnk"), col("neighbor_id"), (-col("cosine")).as("approx_dist"))
    else
      // the production IVF-PQ tail: ADC shortlist within the probed cells,
      // exact L2 only on the candidates (bounded by |Q| * rerank)
      exactRerankL2(clean, topKSelect(scored, rerank).select("query_id", "neighbor_id"),
        qArr, dim, k, idCol, vecCol)
  }

  /** Majority-label vote over a precomputed neighbor relation (the
    * `query_id, neighbor_id` surface of [[bruteForceTopK]]/[[ivfTopK]]):
    * each query takes the label most common among its neighbors — the
    * standard k-NN auto-labeling / label-propagation step for extending a
    * small labeled seed set over a large corpus.
    *
    * Deterministic tie-break: highest vote count, then SMALLEST label
    * (`min(struct(-votes, label))` — one aggregate, no window sort).
    * Unlabeled (null-label) neighbors cannot vote; a query whose every
    * neighbor is unlabeled drops out of the output.
    *
    * Output: query_id, knn_label, n_votes (votes for the winning label).
    */
  def labelVote(
      neighbors: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      labelCol: String = "label"): DataFrame = {
    val labels = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(labelCol).as("__lbl"))
    neighbors
      .join(labels, Seq("neighbor_id"))
      .filter(col("__lbl").isNotNull)
      .groupBy(col("query_id"), col("__lbl"))
      .agg(count(lit(1)).as("n_votes"))
      .groupBy("query_id")
      .agg(min(struct((-col("n_votes")).as("nv"), col("__lbl").as("lbl"))).as("__w"))
      .select(col("query_id"), col("__w.lbl").as("knn_label"), (-col("__w.nv")).as("n_votes"))
  }

  /** k-NN classification of `queries` against a labeled `corpus`: exact
    * cosine top-k neighbors ([[bruteForceTopK]]; pass `nprobe > 0` to route
    * through [[ivfTopK]] at corpus scale) + [[labelVote]]. The two stages
    * share the top-k machinery's determinism, so with `nprobe <= 0` the
    * whole operator is exact and engine-portable.
    */
  def knnLabelVote(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      nprobe: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val neighbors =
      if (nprobe <= 0) bruteForceTopK(corpus, queries, k, idCol, vecCol)
      else ivfTopK(corpus, queries, k, nprobe = nprobe, idCol = idCol, vecCol = vecCol)
    labelVote(neighbors, corpus, idCol, labelCol)
  }

  /** Exact all-pairs cosine >= threshold via a broadcast + tight-loop kernel.
    *
    * Spark's higher-order array functions (`zip_with`/`aggregate`) are a
    * whole-stage-codegen barrier and evaluate interpreted with per-element
    * boxing — ~10x slower than a primitive loop for a 64-dim dot product
    * executed |n|^2/2 times. Since brute-force pairs is the compute-bound
    * exact verifier (<= ~1e5 vectors; the scale paths are [[srpCosinePairs]]
    * and IVF-bucketed pairs), the kernel broadcasts the corpus as primitive
    * arrays (1e5 x 64 doubles = 51 MB) and streams the distributed side
    * through it, emitting each pair once (id_a < id_b).
    *
    * FP determinism: dot and norm accumulate left-to-right from 0.0 —
    * bit-identical to the column-expression form and to an oracle folding in
    * the same order.
    */
  def cosinePairsExact(
      embeddings: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val prepped = prepTyped(embeddings, idCol, vecCol)
    val withNorms = collectDriverSized(embeddings, idCol, vecCol, "embedding corpus", 200000)
      .sortBy(_._1).map { case (id, v) => (id, v, normOf(v)) }
    val bc = spark.sparkContext.broadcast(withNorms)

    prepped
      .mapPartitions { rows =>
        val side = bc.value
        rows.flatMap { case (idA, a) =>
          val nrmA = normOf(a)
          // binary search to the first id_b > id_a (side is id-sorted)
          var lo = 0; var hi = side.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (side(mid)._1 <= idA) lo = mid + 1 else hi = mid
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var j = lo
          while (j < side.length) {
            val (idB, b, nrmB) = side(j)
            val cos = dotOf(a, b) / (nrmA * nrmB)
            if (cos >= threshold) out += ((idA, idB, cos))
            j += 1
          }
          out
        }
      }
      .toDF("id_a", "id_b", "cosine")
  }

  /** Cosine near-duplicate pairs via IVF (coarse-quantizer) bucketing: train
    * k-means on a bounded sample, assign every vector to its `nassign`
    * nearest centroids in one kernel pass, and verify exact cosine only for
    * pairs sharing a cluster. The data-ADAPTIVE complement to
    * [[srpCosinePairs]]: hyperplane LSH buckets by random direction signs,
    * IVF buckets by the corpus's own density structure — near-identical
    * vectors land in the same cell with margin, and `nassign > 1` covers
    * pairs straddling a Voronoi boundary.
    *
    * Scale shape mirrors the LSH paths: candidate generation carries only
    * (cluster, id); candidate id pairs are deduped BEFORE vectors are
    * joined back once per surviving pair; the per-cluster self-join is the
    * standard blocking tradeoff (a hot cluster is m^2/2), and the
    * assignment pass itself is shuffle-free. Rows with a null id or
    * embedding can never pair and are dropped up front (matching
    * [[srpCosinePairs]]' pass-through-and-drop semantics).
    *
    * `nlist <= 0` (the default) SIZES THE QUANTIZER TO THE CORPUS: with
    * `A = nassign * N` total assignments, expected candidate volume is
    * ~`A^2 / (2 * nlist)`, so a FIXED nlist grows the candidate set
    * quadratically with the corpus. Auto-sizing picks
    * `nlist = ceil(A / targetClusterSize)`, holding the expected cluster
    * population at `targetClusterSize` — candidate volume then grows
    * LINEARLY (~`A * targetClusterSize / 2`). The corpus size needed for
    * the derivation is free when the training sample is not full (the
    * sample IS the corpus); only corpora larger than `trainSample` pay one
    * extra count job. `nlist` is additionally capped at the sample size
    * (k-means cannot train more centroids than sample points) — at extreme
    * corpus/sample ratios raise `trainSample` along with the corpus, or
    * the cap re-introduces the quadratic growth this sizing exists to
    * prevent.
    *
    * Output: id_a < id_b, cosine (exact, verified) >= threshold — for pairs
    * sharing at least one of their assigned clusters.
    */
  def ivfCosinePairs(
      embeddings: DataFrame,
      threshold: Double = 0.9,
      nlist: Int = 0,
      nassign: Int = 2,
      kmeansIterations: Int = 5,
      trainSample: Int = 10000,
      targetClusterSize: Int = 128,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val clean = embeddings.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
    val assigned = ivfPairAssignments(
      clean, nlist, nassign, kmeansIterations, trainSample, targetClusterSize, idCol, vecCol)
    val cands = Dedup.orderedPairsWithinGroups(assigned, col("cluster"), col("id"), maxGroup = 1L << 20,
      observeTag = "ivf_cells")
      .select(col("__a").as("id_a"), col("__b").as("id_b"))
      .distinct()
    verifyExactPairs(prep(clean, idCol, vecCol, "id", "e", "nrm"), cands, threshold)
  }

  /** The (cluster, id) assignment relation [[ivfCosinePairs]] groups on —
    * shared with [[ivfOversizeCells]] so the diagnostic inspects the exact
    * relation the admission cap filters (same deterministic sample, same
    * k-means, same tie rules). `clean` must already be null-filtered.
    */
  private def ivfPairAssignments(
      clean: DataFrame,
      nlist: Int,
      nassign: Int,
      kmeansIterations: Int,
      trainSample: Int,
      targetClusterSize: Int,
      idCol: String,
      vecCol: String): DataFrame = {
    val spark = clean.sparkSession
    import spark.implicits._
    require(nassign >= 1, "need nassign >= 1")
    require(nlist <= 0 || nassign <= nlist, "need nassign <= nlist (or nlist <= 0 for auto)")
    require(targetClusterSize >= 1, "need targetClusterSize >= 1")

    // ids travel as long through the assignment kernel (prepTyped casts),
    // so downstream id columns are long regardless of the input id type
    val emptyOut = emptyFrame(spark,
      "cluster" -> org.apache.spark.sql.types.IntegerType,
      "id" -> org.apache.spark.sql.types.LongType)
    val sampleRaw = hashOrderedSample(clean, idCol, vecCol, trainSample)
    // corpus size for auto-sizing: a non-full sample IS the whole corpus
    // (hashOrderedSample applies the same null filter), so only corpora
    // larger than trainSample pay the count job
    val nlistEff =
      if (nlist > 0) nlist
      else {
        val n = if (sampleRaw.length < trainSample) sampleRaw.length.toLong else clean.count()
        deriveNlist(n * nassign, targetClusterSize, sampleRaw.length)
      }
    val centroids = trainQuantizer(sampleRaw, nlistEff, kmeansIterations).getOrElse(return emptyOut)
    val bcCent = spark.sparkContext.broadcast(centroids)
    val nAssignEff = math.min(nassign, centroids.length)

    // shuffle-free assignment kernel emitting (cluster, id) rows only. The
    // top-nassign selection is a primitive insertion over (distance, cid) —
    // identical ordering semantics to sorting the pairs, without a boxed
    // tuple sort in the one full-corpus pass.
    prepTyped(clean, idCol, vecCol)
      .mapPartitions { rows =>
        val cents = bcCent.value
        val k = nAssignEff
        rows.flatMap { case (id, v) =>
          val bd = Array.fill(k)(Double.MaxValue)
          val bcid = Array.fill(k)(Int.MaxValue)
          var ci = 0
          while (ci < cents.length) {
            val d = sqDistOf(v, cents(ci))
            var j = k - 1
            if (d < bd(j) || (d == bd(j) && ci < bcid(j))) {
              while (j > 0 && (d < bd(j - 1) || (d == bd(j - 1) && ci < bcid(j - 1)))) {
                bd(j) = bd(j - 1); bcid(j) = bcid(j - 1); j -= 1
              }
              bd(j) = d; bcid(j) = ci
            }
            ci += 1
          }
          (0 until k).iterator.map(j => (bcid(j), id))
        }
      }
      .toDF("cluster", "id")
  }

  /** Diagnostic companion to [[ivfCosinePairs]]' `maxGroup` admission
    * (2^20): the IVF cells whose populations the cap would drop, built via
    * the same deterministic training + assignment, so a production job can
    * monitor for skipped near-dup families without rebuilding internal
    * keying. A non-empty result at the operator's cap means those cells'
    * pairs were silently skipped — re-run with a larger `nlist` (smaller
    * cells) or investigate the degenerate density.
    */
  def ivfOversizeCells(
      embeddings: DataFrame,
      maxGroup: Long = 1L << 20,
      nlist: Int = 0,
      nassign: Int = 2,
      kmeansIterations: Int = 5,
      trainSample: Int = 10000,
      targetClusterSize: Int = 128,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    Dedup.oversizeGroups(
      ivfPairAssignments(
        embeddings.filter(col(idCol).isNotNull && col(vecCol).isNotNull),
        nlist, nassign, kmeansIterations, trainSample, targetClusterSize, idCol, vecCol),
      col("cluster"), maxGroup)

  /** Cosine near-duplicate pairs via signed-random-projection LSH candidates
    * + exact cosine verification. Valid regime: high thresholds (>= ~0.8),
    * where a pair's sign vectors agree on most planes and banding keeps the
    * candidate set near-linear. At low thresholds SRP bands collide for
    * unrelated vectors — use [[Dedup.embeddingCosinePairs]] (exact) instead.
    *
    * Output: id_a < id_b, cosine (exact, verified) >= threshold — for pairs
    * surfaced by LSH; recall is 1 - (1 - p^r)^b with p = 1 - acos(cos)/pi.
    */
  def srpCosinePairs(
      embeddings: DataFrame,
      threshold: Double = 0.9,
      planes: Int = 64,
      bands: Int = 16,
      seed: Long = 42L,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dim: Int = -1): DataFrame = {
    val (n, banded) = srpBanded(embeddings, planes, bands, seed, idCol, vecCol, dim)
    val cands = Dedup.orderedPairsWithinGroups(banded, col("bk"), col("id"), maxGroup = 1L << 20,
      observeTag = "srp_bands")
      .select(col("__a").as("id_a"), col("__b").as("id_b"))
      .distinct()
    verifyExactPairs(n, cands, threshold)
  }

  /** Diagnostic companion to [[srpCosinePairs]]' `maxGroup` admission
    * (2^20): the (band, key) buckets whose collision groups the cap would
    * drop, built from the same seeded hyperplanes and native band-key
    * expression. Run alongside a production job and alert on non-empty —
    * a dropped band bucket means near-dup detection skipped those pairs.
    */
  def srpOversizeBands(
      embeddings: DataFrame,
      maxGroup: Long = 1L << 20,
      planes: Int = 64,
      bands: Int = 16,
      seed: Long = 42L,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dim: Int = -1): DataFrame =
    Dedup.oversizeGroups(
      srpBanded(embeddings, planes, bands, seed, idCol, vecCol, dim)._2, col("bk"), maxGroup)

  /** The prepped vector relation and its (id, band-key) banding — shared by
    * [[srpCosinePairs]] and [[srpOversizeBands]] so the diagnostic sees the
    * exact relation the admission cap filters.
    */
  private def srpBanded(
      embeddings: DataFrame,
      planes: Int,
      bands: Int,
      seed: Long,
      idCol: String,
      vecCol: String,
      dim: Int): (DataFrame, DataFrame) = {
    require(planes % bands == 0, "planes must be divisible by bands")

    // Plane dimensionality: the data's max vector length unless given
    // explicitly. An aggregate probe (one scan of the array lengths), NOT a
    // limit(1) peek: on mixed-dimension data a first-row peek would make
    // both the raise-vs-succeed outcome and the seeded plane matrix (hence
    // LSH recall) depend on partition layout. At 100 TB pass `dim`
    // explicitly and skip the probe. With an explicit dim, LONGER vectors
    // would silently project on a prefix (degrading band discrimination and
    // losing pairs), so those rows raise instead; shorter vectors slice the
    // plane — a prefix projection is still a valid SRP for them.
    val planeDim = math.max(1,
      if (dim > 0) dim
      else embeddings
        .select(max(size(toDoubleArray(col(vecCol)))).as("d"))
        .collect().headOption.collect { case r if !r.isNullAt(0) => r.getInt(0) }.getOrElse(0))

    // null-safety: a null embedding passes through (it drops out at the
    // cosine stage exactly as the pre-guard implementation dropped it)
    // rather than reaching raise_error with a null message
    val n = prep(embeddings, idCol, vecCol, "id", "e", "nrm")
      .withColumn("e",
        when(col("e").isNull, col("e"))
          .when(size(col("e")) <= planeDim, col("e"))
          .otherwise(raise_error(concat(
            lit("srpCosinePairs: vector dimension "), size(col("e")).cast("string"),
            lit(s" exceeds plane dimension $planeDim; pass dim explicitly")))
            .cast("array<double>")))

    // deterministic hyperplanes from a seeded generator (driver-side tiny)
    val rng = new scala.util.Random(seed)
    val planesArr: Array[Array[Double]] = Array.fill(planes)(Array.fill(planeDim)(rng.nextGaussian()))

    // all band keys in ONE native expression (graft.functions.SrpExpressions
    // .SrpBandKeys): the composed per-plane dot/slice/when tree was seconds
    // of analyzer + janino work per run at planes = 128
    val keysCol = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.functions.SrpExpressions.SrpBandKeys(
        ColumnBridge.expression(col("e")), planesArr, bands))
    }
    // candidate generation carries ONLY (id, band-key): shipping the vectors
    // through the banded pair emission would duplicate each embedding
    // `bands` times and recompute the cosine once per band collision —
    // instead dedup the candidate id pairs first, then join the vectors back
    // once per surviving pair.
    val banded = n
      .select(col("id"), posexplode(keysCol).as(Seq("band", "key")))
      .select(col("id"), struct(col("band"), col("key")).as("bk"))
    (n, banded)
  }
}
