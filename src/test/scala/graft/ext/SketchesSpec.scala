package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def corpus(ids: Range, salt: String) =
    ids.map(i => (i.toLong, s"tok$salt${i % 97} common the a tok${i % 13} x$i")).toDF("doc_id", "text")

  test("hll: registers are complete, mergeable by cellwise max, and estimate tracks truth") {
    val a = corpus(0 until 400, "A")
    val b = corpus(400 until 800, "B")
    val ra = Sketches.hllRegisters(a).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rb = Sketches.hllRegisters(b).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rall = Sketches.hllRegisters(a.union(b)).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ra.size == 64 && rb.size == 64 && rall.size == 64, "all 64 registers emitted")
    // the union's sketch IS the cellwise max of the parts' sketches
    (0L until 64L).foreach(k => assert(rall(k) == math.max(ra(k), rb(k)), s"bucket $k"))
    // estimate within HLL's expected band (1.04/sqrt(64) ~ 13%; allow 3 sigma)
    val m = 64.0
    val est = 0.709 * m * m / rall.values.map(v => math.pow(2.0, -v.toDouble)).sum
    val truth = a.union(b).select(explode(split(lower(trim(regexp_replace(col("text"), "[ \\t\\n\\f\\r]+", " "))), " ")))
      .filter(col("col") =!= "").distinct().count().toDouble
    assert(math.abs(est - truth) / truth < 0.4, s"est $est vs truth $truth")
  }

  test("cms: cells are complete, mergeable by cellwise sum, point queries never underestimate") {
    val a = corpus(0 until 300, "A")
    val b = corpus(300 until 600, "A")
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsCounts(df).collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ca = cells(a)
    val cb = cells(b)
    val call = cells(a.union(b))
    assert(call.size == 4 * 1024)
    call.foreach { case (k, v) => assert(v == ca(k) + cb(k), s"cell $k merges by sum") }
    // total mass per row = total token count
    val nTok = a.union(b).select(explode(split(lower(trim(regexp_replace(col("text"), "[ \\t\\n\\f\\r]+", " "))), " ")))
      .filter(col("col") =!= "").count()
    (0L until 4L).foreach { i =>
      assert(call.filter(_._1._1 == i).values.sum == nTok, s"row $i mass")
    }
    // point query for the most frequent token ('common', once per doc):
    // est = min over rows of the token's cell; CMS may only overestimate
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15), 16)
    val est = (0 until 4).map(i => call((i.toLong, h60(s"$i:common") % 1024))).min
    assert(est >= 600, "never underestimates the true count")
    assert(est <= 600 + (2.0 * nTok / 1024).toLong, "within the e/w overestimate band")
  }
}
