package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Embedding feature statistics and PCA (north star, SURVEY §7.6): the
  * preprocessing rungs between raw embeddings and an ANN index or a
  * training mixture — per-dimension standardization stats, a one-pass
  * covariance estimate, and principal-component projection.
  *
  *  - [[featureStats]]: per-dimension n/mean/std/min/max — the inputs to
  *    feature standardization and to drift monitoring between corpus
  *    snapshots. Decimal-summed moments (the library-wide exact-sum
  *    pattern), so the whole result is bitwise engine-portable.
  *  - [[covariance]]: the d x d sample covariance in ONE corpus pass —
  *    per-partition primitive accumulation of (n, sums, upper-triangular
  *    product sums), a driver combine in partition order. d(d+3)/2 doubles
  *    per partition travel to the driver (~17 KB at d = 64), independent
  *    of corpus size.
  *  - [[pcaProject]]: top-k principal components via driver-side power
  *    iteration with deflation (k, d small; the corpus-sized work is only
  *    the covariance pass), then a map-only projection through the
  *    codegen'd [[VectorFunctions.dot]] kernel — same output shape as
  *    [[Projection.randomProject]], the data-adaptive sibling of its
  *    data-oblivious planes.
  *
  * Determinism: the covariance combine folds partial sums in partition
  * order — bit-stable for a fixed input layout (the correctness-gate
  * regime), within FP tolerance under repartitioning (PcaSpec pins the
  * tolerance contract). Power iteration itself is a pure driver-side
  * function of the covariance matrix.
  */
object Features {

  /** Per-dimension standardization stats over `vecCol` (array<float|double>),
    * long-form: (dim, n, mean, std, min_x, max_x) — one row per vector
    * position. Vectors contribute to every position they have (ragged
    * corpora yield per-dim n); null ids/vectors are excluded, and so are
    * NULL ELEMENTS within a vector — `n` counts only the values the
    * moments actually summed, so mean/std stay unbiased on vectors with
    * null components (previously n counted them while the sums skipped
    * them, silently deflating both).
    *
    * The 100 TB shape: the d-way explode feeds a partial aggregate that
    * reduces each partition to d rows before the one tiny shuffle — the
    * same scale shape as a word count, with exact decimal sums so the
    * result is order-free and bitwise oracled (std mirrors the
    * event-stats moment formula, NULL above n = 1 guard included).
    */
  def featureStats(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val n = count(lit(1))
    val s1 = sum(col("x").cast("decimal(38,8)")).cast("double")
    val s2 = sum((col("x") * col("x")).cast("decimal(38,8)")).cast("double")
    val variance = (s2 - s1 * s1 / n) / (n - 1)
    df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(posexplode(VectorFunctions.toDoubleArray(col(vecCol))).as(Seq("dim", "x")))
      .filter(col("x").isNotNull)
      .groupBy("dim")
      .agg(
        n.as("n"),
        (s1 / n).as("mean"),
        when(n > 1, when(variance > 0, sqrt(variance)).otherwise(lit(0.0))).as("std"),
        min(col("x")).as("min_x"),
        max(col("x")).as("max_x"))
  }

  /** Per-dimension drift between two embedding snapshots — the monitoring
    * view a pipeline checks before mixing a new corpus version or a new
    * encoder checkpoint into training: for every vector position, the
    * mean shift and a Welch z-score
    * `(mean_new - mean_old) / sqrt(std_old^2/n_old + std_new^2/n_new)`.
    * |z| >> 2 on any dimension flags a distribution change (encoder
    * drift, a broken preprocessing step, a corpus mix shift) that cosine
    * spot checks miss.
    *
    * Pure composition of two [[featureStats]] passes joined on the
    * dimension — the moments are exact decimal sums, every derived value
    * is one IEEE expression over identical operands in any engine, so the
    * whole result is bitwise portable. `shift_z` is NULL when either side
    * cannot estimate a variance (n <= 1) or both variances are zero.
    */
  def featureDrift(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val o = featureStats(oldDf, idCol, vecCol)
      .select(col("dim"), col("n").as("n_old"), col("mean").as("mean_old"), col("std").as("std_old"))
    val n = featureStats(newDf, idCol, vecCol)
      .select(col("dim"), col("n").as("n_new"), col("mean").as("mean_new"), col("std").as("std_new"))
    val se2 = col("std_old") * col("std_old") / col("n_old") +
      col("std_new") * col("std_new") / col("n_new")
    o.join(n, Seq("dim"), "full_outer")
      .select(
        col("dim"), col("n_old"), col("n_new"),
        col("mean_old"), col("mean_new"), col("std_old"), col("std_new"),
        (col("mean_new") - col("mean_old")).as("mean_shift"),
        when(col("std_old").isNotNull && col("std_new").isNotNull && se2 > 0,
          (col("mean_new") - col("mean_old")) / sqrt(se2)).as("shift_z"))
  }

  /** One-pass sample covariance of the first `dim` components. Vectors
    * shorter than `dim` are skipped (they carry no full observation);
    * longer ones are truncated at `dim` — [[Projection.randomProject]]'s
    * convention. Returns the dense symmetric d x d matrix (driver-side;
    * requires n >= 2 observations).
    */
  def covariance(
      df: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Double]] = {
    val (nTot, s, sp) = moments(df, dim, idCol, vecCol)
    require(nTot >= 2, s"covariance needs >= 2 vectors with >= $dim components; got $nTot")
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var t = 0
    while (i < dim) {
      var j = 0
      while (j <= i) {
        val c = (sp(t) - s(i) * s(j) / nTot) / (nTot - 1)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
        t += 1
      }
      i += 1
    }
    cov
  }

  /** (n, sums, upper-triangular product sums) over one corpus pass.
    * Each partition reduces to one primitive-array row; the driver folds
    * the collected partials in partition order (deterministic for a fixed
    * layout).
    */
  private def moments(
      df: DataFrame, dim: Int, idCol: String, vecCol: String): (Long, Array[Double], Array[Double]) = {
    require(dim >= 1, "need dim >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2
    val parts = df
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(VectorFunctions.toDoubleArray(col(vecCol)).as("e"))
      .as[Seq[Double]]
      .mapPartitions { rows =>
        val s = new Array[Double](dim)
        val sp = new Array[Double](tri)
        var n = 0L
        rows.foreach { sv =>
          if (sv != null && sv.length >= dim) {
            val v = sv.toArray
            n += 1
            var i = 0
            var t = 0
            while (i < dim) {
              s(i) += v(i)
              var j = 0
              while (j <= i) { sp(t) += v(i) * v(j); j += 1; t += 1 }
              i += 1
            }
          }
        }
        Iterator.single((n, s.toSeq, sp.toSeq))
      }
      .collect()
    val s = new Array[Double](dim)
    val sp = new Array[Double](tri)
    var n = 0L
    parts.foreach { case (pn, ps, psp) =>
      n += pn
      var i = 0
      while (i < dim) { s(i) += ps(i); i += 1 }
      var t = 0
      while (t < tri) { sp(t) += psp(t); t += 1 }
    }
    (n, s, sp)
  }

  /** Top-k eigenpairs of a symmetric PSD matrix by power iteration with
    * deflation. Deterministic: hash-derived start vectors
    * ([[Projection.planeCoeff]] — no RNG state), fixed iteration budget
    * with an early fixpoint stop, and sign normalized so the
    * largest-|component| entry (first on ties) is positive.
    * Returns (components, eigenvalues), eigenvalues descending.
    */
  private[ext] def topComponents(
      cov: Array[Array[Double]],
      k: Int,
      iterations: Int = 200): (Array[Array[Double]], Array[Double]) = {
    val d = cov.length
    require(k >= 1 && k <= d, s"need 1 <= k <= $d")
    val work = cov.map(_.clone())
    val comps = Array.ofDim[Double](k, d)
    val eigs = new Array[Double](k)

    def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
      val out = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += m(i)(j) * v(j); j += 1 }
        out(i) = acc
        i += 1
      }
      out
    }
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)

    var c = 0
    while (c < k) {
      var v = Array.tabulate(d)(j => Projection.planeCoeff(c, j))
      val n0 = norm(v)
      v = v.map(_ / n0)
      var it = 0
      var done = false
      while (it < iterations && !done) {
        val w = matVec(work, v)
        val nw = norm(w)
        if (nw == 0.0) done = true // eigenvalue 0: any unit v in the null space works
        else {
          val vNew = w.map(_ / nw)
          var delta = 0.0
          var j = 0
          while (j < d) { val t = vNew(j) - v(j); delta += t * t; j += 1 }
          v = vNew
          if (delta < 1e-28) done = true
        }
        it += 1
      }
      // sign convention: largest-|component| entry positive (first on ties)
      var best = 0
      var j = 1
      while (j < d) { if (math.abs(v(j)) > math.abs(v(best))) best = j; j += 1 }
      if (v(best) < 0) v = v.map(-_)
      val cv = matVec(work, v)
      var lambda = 0.0
      j = 0
      while (j < d) { lambda += v(j) * cv(j); j += 1 }
      comps(c) = v
      eigs(c) = lambda
      // deflate: work -= lambda v v^T
      var a = 0
      while (a < d) {
        var b = 0
        while (b < d) { work(a)(b) -= lambda * v(a) * v(b); b += 1 }
        a += 1
      }
      c += 1
    }
    (comps, eigs)
  }

  /** Project onto the top-k principal components of the corpus itself:
    * covariance in one distributed pass, eigenvectors on the driver,
    * then a map-only projection (no centering subtraction on the vectors;
    * components are directions of the CENTERED covariance, and the
    * uncentered projection differs only by a constant per component —
    * irrelevant for the downstream distance/clustering uses and cheaper
    * to audit). Output long-form like [[Projection.randomProject]]:
    * (idCol, component, value), component in [0, k).
    *
    * Vectors shorter than `dim` are excluded from BOTH the covariance and
    * the projection; null ids/vectors likewise.
    */
  def pcaProject(
      df: DataFrame,
      k: Int,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (comps, _) = topComponents(covariance(df, dim, idCol, vecCol), k)
    val v = VectorFunctions.toDoubleArray(col(vecCol))
    val projections = comps.map(c => VectorFunctions.dot(v, typedLit(c.toSeq)))
    df.filter(col(idCol).isNotNull && col(vecCol).isNotNull && size(col(vecCol)) >= dim)
      .select(col(idCol), posexplode(array(projections.toIndexedSeq: _*)).as(Seq("component", "value")))
  }
}
