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

  test("hll pairwise: union estimate == single-sketch estimate; overlap tracks truth") {
    // two sources with a controlled shared vocabulary
    val a = (0 until 400).map(i => (i.toLong, "A", s"shared${i % 200} onlyA$i common the"))
    val b = (0 until 400).map(i => ((i + 1000).toLong, "B", s"shared${i % 200} onlyB$i common the"))
    val docs = (a ++ b).toDF("doc_id", "source", "text")
    val got = Sketches.hllPairwise(docs).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getString(0), r.getString(1)) == ("A", "B"))
    val (estA, estB, estU, estI) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))

    // the union estimate must equal the estimate a single sketch over the
    // concatenated stream would give (cellwise max == one sketch) — EXACTLY
    val rall = Sketches.hllRegisters(docs.select("doc_id", "text")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val sU = (0L until 64L).map(k => BigInt(1) << (55 - rall(k).toInt)).sum
    val single = Sketches.EstNumerator / sU.toDouble
    assert(estU == single, s"union est $estU != single-sketch est $single")

    // accuracy: truths are |A|=602, |B|=602, union=1004, intersect=200ish
    def truth(src: String) = docs.filter(col("source") === src)
      .select(explode(split(lower(trim(regexp_replace(col("text"), "[ \\t\\n\\f\\r]+", " "))), " ")))
      .filter(col("col") =!= "").distinct().count().toDouble
    val (ta, tb) = (truth("A"), truth("B"))
    val tu = docs.select(explode(split(lower(trim(regexp_replace(col("text"), "[ \\t\\n\\f\\r]+", " "))), " ")))
      .filter(col("col") =!= "").distinct().count().toDouble
    assert(math.abs(estA - ta) / ta < 0.4, s"estA $estA vs $ta")
    assert(math.abs(estB - tb) / tb < 0.4, s"estB $estB vs $tb")
    assert(math.abs(estU - tu) / tu < 0.4, s"estU $estU vs $tu")
    // intersection inherits both sketches' error; just require the right scale
    val ti = ta + tb - tu
    assert(estI > 0 && math.abs(estI - ti) / ti < 1.0, s"estI $estI vs $ti")
    // jaccard consistency
    assert(math.abs(r.getDouble(6) - estI / estU) == 0.0)
  }

  test("cms join size: estimate never underestimates and min tightens the overshoot") {
    import spark.implicits._
    // skewed FK join: key k appears k times on the left, once on the right
    val left = (1L to 40L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("lk")
    val right = (1L to 60L).toDF("rk") // 41..60 never join
    val rows = Sketches.cmsJoinSize(left, "lk", right, "rk").collect()
    assert(rows.length == 4)
    val exact = rows.head.getLong(2)
    val est = rows.head.getLong(3)
    assert(exact == (1L to 40L).sum, "truth: sum of multiplicities")
    assert(rows.forall(r => r.getLong(1) >= exact), "every row's inner product >= truth")
    assert(est == rows.map(_.getLong(1)).min, "estimate is the min over rows")
    assert(est >= exact)
    // at 1024 cells over 60 keys, collisions are rare: the estimate is tight
    assert(est <= exact * 2, s"est $est should be near exact $exact at this load factor")
  }

  test("cms join size: empty intersection estimates near zero; null keys drop") {
    import spark.implicits._
    val left = (1L to 30L).toDF("lk")
    val right = (1000L to 1030L).toDF("rk")
    val rows = Sketches.cmsJoinSize(left, "lk", right, "rk").collect()
    assert(rows.head.getLong(2) == 0L)
    assert(rows.head.getLong(3) <= 2L, "disjoint keys: only rare collisions contribute")
    val withNull = Seq(Some(1L), None, Some(2L)).toDF("lk")
    val r2 = Sketches.cmsJoinSize(withNull, "lk", (1L to 2L).toDF("rk"), "rk").collect()
    assert(r2.head.getLong(2) == 2L, "null keys neither join nor sketch")
  }
}
