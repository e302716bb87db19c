package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SkewProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("profile: exact histogram stats on a crafted staircase") {
    import spark.implicits._
    // key i appears i times, i = 1..10: n_rows 55, counts asc = 1..10
    val rows = (1 to 10).flatMap(i => Seq.fill(i)(i.toLong))
    val df = rows.toDF("k")
    val r = SkewProfile.profile(df, "k", "t.k").collect().head
    assert(r.getString(0) == "t.k")
    assert(r.getLong(1) == 55L && r.getLong(2) == 10L && r.getLong(3) == 10L)
    assert(r.getDouble(4) == 10.0 / 55)
    assert(r.getDouble(5) == 1.0, "10 keys: the top-10 IS everything")
    assert(r.getLong(6) == 5L, "p50 = 5th of 10 ascending counts")
    assert(r.getLong(7) == 10L, "p99 position ceil(9.9) = 10th")
    assert(r.getDouble(8) == 2.0)
  }

  test("profile: a planted hot key dominates the shares; uniform keys do not") {
    import spark.implicits._
    val hot = (Seq.fill(900)(7L) ++ (1L to 100L)).toDF("k")
    val h = SkewProfile.profile(hot, "k", "hot").collect().head
    assert(h.getLong(3) == 901L && h.getDouble(4) > 0.9, "hot key holds >90%")
    assert(h.getDouble(8) >= 901.0, "skew ratio vs p50 of 1")
    val uni = (1L to 500L).toDF("k")
    val u = SkewProfile.profile(uni, "k", "uni").collect().head
    assert(u.getLong(3) == 1L && u.getDouble(8) == 1.0, "uniform: no skew signal")
  }

  test("profiles: multi-target union, null keys excluded, partition-stable") {
    import spark.implicits._
    val a = Seq(Some(1L), Some(1L), Some(2L), None).toDF("k")
    val out = SkewProfile.profiles(Seq((a, "k", "a.k"), (a, "k", "again"))).collect()
    assert(out.length == 2 && out.map(_.getString(0)).toSet == Set("a.k", "again"))
    assert(out.forall(r => r.getLong(1) == 3L && r.getLong(2) == 2L), "null key dropped")
    val big = (0 until 5000).map(i => (i % 37).toLong).toDF("k")
    val once = SkewProfile.profile(big, "k", "x").collect().head.toSeq
    val again = SkewProfile.profile(big.repartition(11), "k", "x").collect().head.toSeq
    assert(once == again)
  }
}
