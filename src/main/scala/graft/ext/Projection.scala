package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Random-projection dimensionality reduction for embedding columns
  * (Johnson-Lindenstrauss): project d-dim vectors onto k pseudo-random
  * hyperplanes. The standard embedding-compression step before storage,
  * clustering, or ANN indexing at corpus scale — k * d multiply-adds per
  * row, map-only, no shuffle.
  *
  * The planes are DERIVED, not sampled: coefficient (i, j) comes from
  * md5("i:j"), so any engine — or a retry, or a different cluster — re-derives
  * bit-identical planes with no side-channel plane matrix to ship. Every
  * arithmetic step is exact in IEEE doubles (hex-to-int is exact, /2^32 is a
  * power-of-two scale, *2 and -1 round nothing in [-1, 1)), and the
  * projection itself is the codegen'd [[VectorFunctions.dot]] kernel whose
  * ascending-index fold an external SQL engine replays exactly.
  */
object Projection {

  /** Plane coefficient (i, j) in [-1, 1): first 8 hex chars of md5("i:j")
    * as a uint32, scaled. Exact in both engines by construction.
    */
  def planeCoeff(i: Int, j: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j".getBytes("UTF-8"))
    val hex = digest.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 * 2 - 1
  }

  /** Project `vecCol` (array<float|double>, `dim` elements) onto `k`
    * hash-derived hyperplanes. Output is long-form — (id, dim, value), one
    * row per output dimension — which keeps the result join- and
    * oracle-friendly. Vectors shorter than `dim` project on their length;
    * longer ones are truncated at `dim`.
    */
  def randomProject(
      df: DataFrame,
      k: Int,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && dim >= 1, "k and dim must be >= 1")
    val v = VectorFunctions.toDoubleArray(col(vecCol))
    val projections = (0 until k).map { i =>
      val plane = (0 until dim).map(j => planeCoeff(i, j))
      VectorFunctions.dot(v, typedLit(plane))
    }
    df.select(col(idCol),
      posexplode(array(projections: _*)).as(Seq("dim", "value")))
  }
}
