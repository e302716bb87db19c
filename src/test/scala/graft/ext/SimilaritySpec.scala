package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def vecDf(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** 8 tight clusters in 16 dims: cluster centers on coordinate axes, points
    * = center + small seeded noise. IVF-friendly by construction.
    */
  private lazy val clustered: DataFrame = {
    val rng = new scala.util.Random(5)
    val rows = (0L until 400L).map { i =>
      val c = (i % 8).toInt
      val v = Array.fill(16)(rng.nextGaussian().toFloat * 0.05f)
      v(c * 2) += 1f
      (i, v.toSeq)
    }
    vecDf(rows)
  }

  test("bruteForceTopK equals the window-rank reference on the sf0.001 fixture") {
    import graft.functions.VectorFunctions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val got = Similarity.bruteForceTopK(emb, queries, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))

    val prep = (df: DataFrame, id: String, e: String, n: String) =>
      df.select(col("vec_id").as(id), toDoubleArray(col("embedding")).as(e)).withColumn(n, l2Norm(col(e)))
    val scored = prep(emb, "neighbor_id", "ec", "nc")
      .join(broadcast(prep(queries, "query_id", "eq", "nq")), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineWithNorms(col("eq"), col("ec"), col("nq"), col("nc")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val ref = scored.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= 7)
      .select("query_id", "rnk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))

    assert(got.toSeq == ref.toSeq)
  }

  test("ivfTopK achieves high recall vs brute force on clustered data") {
    val queries = clustered.filter(col("vec_id") % 40 === 0) // 10 queries
    val k = 5
    val exact = Similarity.bruteForceTopK(clustered, queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.ivfTopK(clustered, queries, k, nlist = 8, nprobe = 2, trainSample = 400)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("ivfTopK bench configuration holds its recall floor on the sf0.001 fixture") {
    // the exact parameters Bench emits ivf_topk_recall for (k=10, nlist=16,
    // nprobe=8, embeddings table). The corpus is UNCLUSTERED, so recall
    // tracks the probed fraction: 8/16 cells yields ~0.8 (sf0.1 measured
    // 0.799; deterministic at fixed data: hash-ordered sample,
    // deterministic k-means). The floor exists to catch
    // quantizer/assignment regressions, not to certify 0.9-grade ANN on
    // unstructured vectors — that regime needs higher nprobe or real
    // cluster structure (asserted >= 0.9 on the clustered fixture above).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.ivfTopK(emb, queries, k = 10, nlist = 16, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.ivfTopK(emb, queries, k = 10, nlist = 16, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.75, s"bench-config recall degraded: $recall")
  }

  test("pq/ivfpq bench configurations hold their recall floors on the sf0.001 fixture") {
    // the exact parameters Bench emits pq_topk_recall / ivfpq_topk_recall
    // for: cb=256 + exact rerank of the ADC top-50, because ADC-only
    // ordering on these STRUCTURELESS i.i.d. vectors is quantization-noise
    // dominated (cb=16 no-rerank measured recall@10 0.25 at sf0.1). With
    // the rerank, pq_topk is shortlist-bound (sf0.1: 0.83) and ivfpq_topk
    // is probed-fraction-bound like ivf_topk (sf0.1: 0.74 at nprobe 8/16).
    // Floors catch codebook/encode regressions, not certify ANN grade on
    // unstructured vectors; exactness is pinned by the covering-codebook
    // and clustered-fixture tests.
    import graft.functions.VectorFunctions.toDoubleArray
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val data = emb.select(col("vec_id"), toDoubleArray(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).filter(_._2.length >= 64)
    val exact = data.filter(_._1 % 25 == 0).flatMap { case (qid, q) =>
      data.map { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < 64) { val d = v(i) - q(i); s += d * d; i += 1 }
        (id, s)
      }.sortBy { case (id, d) => (d, id) }.take(10).map { case (id, _) => (qid, id) }
    }.toSet
    val pq = Similarity.pqTopK(emb, queries, k = 10, dim = 64, m = 8,
        codebookSize = 256, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pqRecall = (pq intersect exact).size.toDouble / exact.size
    assert(pqRecall >= 0.7, s"pq_topk bench-config recall degraded: $pqRecall")
    val ivfpq = Similarity.ivfPqTopK(emb, queries, k = 10, dim = 64,
        nlist = 16, nprobe = 8, m = 8, codebookSize = 256, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfpqRecall = (ivfpq intersect exact).size.toDouble / exact.size
    assert(ivfpqRecall >= 0.6, s"ivfpq_topk bench-config recall degraded: $ivfpqRecall")
  }

  test("ivf/srp oversize diagnostics flag the cells/bands the admission caps would drop") {
    // 400 vectors in 8 planted clusters, nassign 2 -> 800 assignments over
    // 8 cells = ~100 per cell: a cap of 50 must flag cells, a generous cap
    // must not. SRP: near-identical vectors in a cluster share band keys;
    // with a cap of 1 every multi-member bucket is flagged.
    val cells = Similarity.ivfOversizeCells(clustered, maxGroup = 50L,
      nlist = 8, nassign = 2, trainSample = 400)
    assert(cells.count() > 0, "dense IVF cells must be flagged at cap 50")
    assert(Similarity.ivfOversizeCells(clustered, maxGroup = 1L << 20,
      nlist = 8, nassign = 2, trainSample = 400).collect().isEmpty)
    assert(Similarity.srpOversizeBands(clustered, maxGroup = 1L).count() > 0,
      "clustered vectors must produce multi-member SRP buckets")
    assert(Similarity.srpOversizeBands(clustered, maxGroup = 1L << 20).collect().isEmpty)
  }

  test("ivfPqTopK exact rerank with full probing and a covering shortlist is exact") {
    // rerank >= corpus with nprobe >= nlist leaves no approximation axis:
    // every vector is a candidate and every candidate is scored exactly, so
    // the result must equal the true L2 top-k bitwise in ids (distances are
    // the shared exact kernel)
    import graft.functions.VectorFunctions.toDoubleArray
    val queries = clustered.filter(col("vec_id") % 40 === 0)
    val got = Similarity.ivfPqTopK(clustered, queries, k = 5, dim = 16,
        nlist = 4, nprobe = 4, m = 4, codebookSize = 8, rerank = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    val data = clustered.select(col("vec_id"), toDoubleArray(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val expect = data.filter(_._1 % 40 == 0).sortBy(_._1).flatMap { case (qid, q) =>
      data.map { case (id, v) =>
        (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (qid, (i + 1).toLong, id) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expect.toSeq)
  }

  test("ivfTopK auto-sized quantizer (default nlist) stays exact under full probing") {
    // nlist <= 0 derives ceil(N / targetClusterSize) cells; trainSample <
    // corpus forces the count-job branch. With nprobe >= derived nlist the
    // candidate set is the whole corpus, so the result through the auto
    // path must equal brute force BITWISE — this pins the derivation
    // end-to-end (count, sizing, training, probe capping) without depending
    // on approximate recall.
    val queries = clustered.filter(col("vec_id") % 40 === 0)
    val exact = Similarity.bruteForceTopK(clustered, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val auto = Similarity.ivfTopK(
      clustered, queries, k = 5, nprobe = Int.MaxValue, trainSample = 100, targetClusterSize = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(auto.toSeq == exact.toSeq)
  }

  test("deriveNlist holds expected cluster size, with floor and sample cap") {
    // 10k assignments at target 128 -> 79 cells (ceil)
    assert(Similarity.deriveNlist(10000L, 128, 5000) == 79)
    // sample cap: cannot train more centroids than sample points
    assert(Similarity.deriveNlist(10000L, 1, 500) == 500)
    // floor at 1 for empty/small corpora
    assert(Similarity.deriveNlist(0L, 128, 0) == 1)
    assert(Similarity.deriveNlist(5L, 128, 5) == 1)
    intercept[IllegalArgumentException](Similarity.deriveNlist(10L, 0, 10))
  }

  test("ivfTopK on an empty corpus returns an empty frame (no NoSuchElementException)") {
    val empty = vecDf(Seq.empty)
    assert(Similarity.ivfTopK(empty, empty).count() == 0)
  }

  test("srpCosinePairs finds planted high-cosine near-dups exactly (vs exact kernel)") {
    val rng = new scala.util.Random(13)
    val base = (0L until 100L).map { i =>
      (i, Array.fill(32)(rng.nextGaussian().toFloat).toSeq)
    }
    // plant 5 near-dups: tiny perturbations of existing vectors
    val planted = (0L until 5L).map { j =>
      val (srcId, v) = base(j.toInt * 7)
      (1000L + j, v.map(x => x + rng.nextGaussian().toFloat * 0.02f))
    }
    val df = vecDf(base ++ planted)
    val exact = Similarity.cosinePairsExact(df, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    val lsh = Similarity.srpCosinePairs(df, threshold = 0.95, planes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    assert(exact.length == 5, s"expected the 5 planted pairs, got ${exact.toSeq}")
    assert(lsh.toSeq == exact.toSeq)
  }

  test("ivfCosinePairs finds planted high-cosine near-dups exactly (vs exact kernel)") {
    val rng = new scala.util.Random(13)
    val base = (0L until 100L).map { i =>
      (i, Array.fill(32)(rng.nextGaussian().toFloat).toSeq)
    }
    val planted = (0L until 5L).map { j =>
      val (_, v) = base(j.toInt * 7)
      (1000L + j, v.map(x => x + rng.nextGaussian().toFloat * 0.02f))
    }
    val df = vecDf(base ++ planted)
    val exact = Similarity.cosinePairsExact(df, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    val bucketed = Similarity.ivfCosinePairs(df, threshold = 0.95, nlist = 8, nassign = 2, trainSample = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    assert(exact.length == 5, s"expected the 5 planted pairs, got ${exact.toSeq}")
    assert(bucketed.toSeq == exact.toSeq)
  }

  test("ivfCosinePairs auto-sizes nlist (default) and still finds planted pairs exactly") {
    val rng = new scala.util.Random(13)
    val base = (0L until 100L).map { i =>
      (i, Array.fill(32)(rng.nextGaussian().toFloat).toSeq)
    }
    val planted = (0L until 5L).map { j =>
      val (_, v) = base(j.toInt * 7)
      (1000L + j, v.map(x => x + rng.nextGaussian().toFloat * 0.02f))
    }
    val df = vecDf(base ++ planted)
    val exact = Similarity.cosinePairsExact(df, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    // trainSample < corpus forces the count-job branch of the derivation;
    // targetClusterSize = 16 makes the auto path train a real multi-cell
    // quantizer (ceil(210 / 16) = 14 cells) instead of a degenerate 1-2
    val auto = Similarity.ivfCosinePairs(
      df, threshold = 0.95, trainSample = 50, targetClusterSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    assert(exact.length == 5, s"expected the 5 planted pairs, got ${exact.toSeq}")
    assert(auto.toSeq == exact.toSeq)
  }

  test("ivfCosinePairs on an empty corpus returns an empty frame") {
    val empty = vecDf(Seq.empty)
    assert(Similarity.ivfCosinePairs(empty).count() == 0)
  }

  test("srpCosinePairs handles >512-dim embeddings (plane dim derived from data)") {
    // the pair is similar ONLY through dimensions past 512: a shared large
    // tail in dims 512..599 with independent small-noise prefixes. Planes
    // capped at 512 dims (the old hardcoded bound) would project only the
    // uncorrelated noise, scatter the two band keys, and miss the pair.
    val rng = new scala.util.Random(7)
    def noisePrefix() = Array.fill(512)(rng.nextGaussian().toFloat * 0.01f)
    val tail = Array.fill(88)(rng.nextGaussian().toFloat)
    val distractors = (0L until 30L).map { i =>
      (i, Array.fill(600)(rng.nextGaussian().toFloat).toSeq)
    }
    val a = (100L, (noisePrefix() ++ tail).toSeq)
    val b = (101L, (noisePrefix() ++ tail).toSeq)
    val df = vecDf(distractors :+ a :+ b)
    val got = Similarity.srpCosinePairs(df, threshold = 0.9, planes = 128, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((100L, 101L)), s"got ${got.toSeq}")
  }

  test("srpCosinePairs raises on vectors longer than the plane dimension") {
    val df = vecDf(Seq(1L -> Seq.fill(8)(1f), 2L -> Seq.fill(16)(1f)))
    val e = intercept[Exception] {
      Similarity.srpCosinePairs(df, threshold = 0.9, planes = 16, bands = 4, dim = 8).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exceeds plane dimension")), e.getMessage)
  }

  test("cosinePairsExact computes exact cosine on known vectors") {
    val df = vecDf(Seq(
      1L -> Seq(1f, 0f),
      2L -> Seq(1f, 0f),
      3L -> Seq(0f, 1f)))
    val out = Similarity.cosinePairsExact(df, threshold = 0.5).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    assert(math.abs(out.head.getDouble(2) - 1.0) < 1e-12)
  }

  test("pqTopK: ADC equals exact L2 when the codebook covers every subvector") {
    // corpus drawn from 3 x 3 distinct subvector combos: with codebookSize
    // >= 3 each subvector is its own centroid, so ADC reconstructs every
    // vector exactly and the approximate distances ARE the true distances
    val parts = Seq(Seq(1f, 0f), Seq(0f, 2f), Seq(-1f, -1f))
    val rows = (0L until 27L).map(i => (i, parts((i % 3).toInt) ++ parts(((i / 3) % 3).toInt)))
    val df = vecDf(rows)
    val queries = df.filter(col("vec_id") < 2)
    val got = Similarity.pqTopK(df, queries, k = 5, dim = 4, m = 2, codebookSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    // driver-side exact reference with the same (distance asc, id asc) order
    val data = rows.map { case (id, v) => (id, v.map(_.toDouble).toArray) }
    val expect = (0L until 2L).flatMap { qid =>
      val q = data.find(_._1 == qid).get._2
      data.map { case (id, v) =>
        (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(5).zipWithIndex
        .map { case ((id, d), i) => (qid, (i + 1).toLong, id, d) }
    }
    assert(got.toSeq == expect)
  }

  test("pqTopK: neighbors stay within the query's cluster; deterministic under repartition") {
    val queries = clustered.filter(col("vec_id") % 40 === 0) // 10 queries
    val got = Similarity.pqTopK(clustered, queries, k = 8, dim = 16, m = 4, codebookSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == 80)
    // the 8 planted clusters are far apart; coarse ADC must never cross them
    got.foreach { case (q, n) =>
      assert(q % 8 == n % 8, s"neighbor $n of query $q crossed clusters")
    }
    val again = Similarity.pqTopK(clustered.repartition(9), queries, k = 8, dim = 16, m = 4, codebookSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
  }

  test("ivfPqTopK: neighbors stay within the query's cluster; deterministic; empty corpus safe") {
    val queries = clustered.filter(col("vec_id") % 40 === 0) // 10 queries
    val got = Similarity.ivfPqTopK(clustered, queries, k = 8, dim = 16,
        nlist = 8, nprobe = 2, m = 4, codebookSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.length == 80)
    got.foreach { case (q, n, d) =>
      assert(q % 8 == n % 8, s"neighbor $n of query $q crossed clusters")
      assert(d >= 0 && d < 1.0, s"residual-ADC distance within a tight cluster must be small: $d")
    }
    val again = Similarity.ivfPqTopK(clustered.repartition(7), queries, k = 8, dim = 16,
        nlist = 8, nprobe = 2, m = 4, codebookSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.sortBy(t => (t._1, t._2)).toSeq == again.sortBy(t => (t._1, t._2)).toSeq)
    val empty = vecDf(Seq.empty)
    assert(Similarity.ivfPqTopK(empty, queries, k = 3, dim = 16).collect().isEmpty)
  }

  test("ivfPqTopK recall vs exact L2 holds on clustered data at partial probing") {
    import graft.functions.VectorFunctions._
    val queries = clustered.filter(col("vec_id") % 40 === 0)
    val got = Similarity.ivfPqTopK(clustered, queries, k = 10, dim = 16,
        nlist = 8, nprobe = 3, m = 8, codebookSize = 32)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val data = clustered.select(col("vec_id"), toDoubleArray(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val exact = data.filter(_._1 % 40 == 0).flatMap { case (qid, q) =>
      data.map { case (id, v) =>
        (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(10).map { case (id, _) => (qid, id) }
    }.toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("pqTopK with exact rerank recovers the true L2 top-k on the clustered fixture") {
    import graft.functions.VectorFunctions._
    val queries = clustered.filter(col("vec_id") % 40 === 0)
    // ADC top-50 per query is its whole 50-member cluster (codes collapse
    // within a tight cluster), so reranking those candidates exactly must
    // reproduce the true L2 top-8
    val got = Similarity.pqTopK(clustered, queries, k = 8, dim = 16, m = 4,
        codebookSize = 16, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val data = clustered.select(col("vec_id"), toDoubleArray(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val expect = data.filter(_._1 % 40 == 0).sortBy(_._1).flatMap { case (qid, q) =>
      data.map { case (id, v) =>
        (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(8).zipWithIndex
        .map { case ((id, d), i) => (qid, (i + 1).toLong, id, d) }
    }
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == expect.map(t => (t._1, t._2, t._3)).toSeq)
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-12, s"exact distance mismatch: $g vs $e")
    }
  }

  test("labelVote: majority wins, ties break to the smallest label, nulls can't vote") {
    import spark.implicits._
    val neighbors = Seq(
      // query 10: labels 1,1,2 -> label 1 with 2 votes
      (10L, 1L), (10L, 2L), (10L, 3L),
      // query 20: labels 2,2,1,1 -> tie at 2 votes -> smaller label 1
      (20L, 3L), (20L, 4L), (20L, 1L), (20L, 2L),
      // query 30: only unlabeled neighbors -> dropped
      (30L, 5L)).toDF("query_id", "neighbor_id")
    val corpus = Seq(
      (1L, Some(1)), (2L, Some(1)), (3L, Some(2)), (4L, Some(2)), (5L, None))
      .toDF("vec_id", "label")
    val out = Similarity.labelVote(neighbors, corpus)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(out == Map(10L -> ((1, 2L)), 20L -> ((1, 2L))))
  }

  test("knnLabelVote recovers cluster labels on the clustered fixture (exact and IVF)") {
    import spark.implicits._
    // ground truth: the generating cluster id (i % 8)
    val labeled = clustered.withColumn("label", (col("vec_id") % 8).cast("int"))
    val queries = clustered.filter(col("vec_id") % 40 === 0) // 10 queries
    val exact = Similarity.knnLabelVote(labeled, queries, k = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(exact.size == 10)
    assert(exact.forall { case (id, lbl) => lbl == (id % 8).toInt }, exact.toString)
    // the IVF route must agree on this tightly clustered fixture
    val ivf = Similarity.knnLabelVote(labeled, queries, k = 5, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ivf == exact)
  }

  test("hardNegatives: same-label twins are excluded even at cosine 1; rank matches the window reference") {
    import spark.implicits._
    // anchor 0 (label 0): id 1 is its exact twin but SAME label; ids 2..4
    // are progressively farther with label 1 — they must be the negatives
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.0f, 0.0f), 0),       // same-label twin — never a negative
      (2L, Seq(0.9f, 0.1f, 0.0f), 1),
      (3L, Seq(0.5f, 0.5f, 0.0f), 1),
      (4L, Seq(0.0f, 1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(rows, rows.filter(col("vec_id") === 0), k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == Seq((1L, 2L), (2L, 3L), (3L, 4L)), s"cross-label cosine order, twin excluded: $got")
  }

  test("hardNegatives equals a label-gated window-rank reference on the sf0.001 fixture") {
    import graft.functions.VectorFunctions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val anchors = emb.filter(col("vec_id") % 50 === 0)
    val got = Similarity.hardNegatives(emb, anchors, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    val prep = (df: DataFrame, id: String, e: String, n: String, l: String) =>
      df.filter(col("label").isNotNull)
        .select(col("vec_id").as(id), toDoubleArray(col("embedding")).as(e), col("label").cast("long").as(l))
        .withColumn(n, l2Norm(col(e)))
    val scored = prep(emb, "neg_id", "ec", "nc", "lc")
      .join(broadcast(prep(anchors, "anchor_id", "ea", "na", "la")),
        col("anchor_id") =!= col("neg_id") && col("la") =!= col("lc"))
      .select(col("anchor_id"), col("neg_id"),
        cosineWithNorms(col("ea"), col("ec"), col("na"), col("nc")).as("cosine"))
    val w = Window.partitionBy("anchor_id").orderBy(col("cosine").desc, col("neg_id"))
    val ref = scored.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= 7)
      .select("anchor_id", "rnk", "neg_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == ref.toSeq)
    assert(got.forall(_._2 <= 7))
  }
}
