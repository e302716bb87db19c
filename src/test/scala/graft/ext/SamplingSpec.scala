package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("split assignment matches the reference implementation exactly") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val got = Sampling.deterministicSplit(df, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 2000L).foreach { i =>
      assert(got(i) == Sampling.splitOf(i.toString, splits), s"id $i")
    }
  }

  test("realized proportions are close to the requested fractions") {
    import spark.implicits._
    val n = 20000L
    val counts = Sampling.deterministicSplit((0L until n).toDF("id"), "id", splits)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    splits.foreach { case (name, frac) =>
      val p = counts.getOrElse(name, 0L).toDouble / n
      assert(math.abs(p - frac) < 0.02, s"$name: $p vs $frac") // ~6 sigma at n=20k
    }
  }

  test("assignment is stable: adding rows never moves an existing id") {
    import spark.implicits._
    val small = Sampling.deterministicSplit((0L until 100L).toDF("id"), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val large = Sampling.deterministicSplit((0L until 10000L).toDF("id"), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, s) => assert(large(id) == s) }
  }

  test("degenerate and invalid fraction specs are rejected") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException](Sampling.deterministicSplit(df, "id", Seq.empty))
    intercept[IllegalArgumentException](
      Sampling.deterministicSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4)))
    intercept[IllegalArgumentException](
      Sampling.deterministicSplit(df, "id", Seq("a" -> 1.5, "b" -> -0.5)))
    // single split: everything lands in it
    val one = Sampling.deterministicSplit(df, "id", Seq("all" -> 1.0)).head()
    assert(one.getString(1) == "all")
  }

  test("a cumulative fraction at 1.0 before the last split cannot misroute rows") {
    import spark.implicits._
    // floor(1.0 * 2^32) needs 9 hex chars; without clamping, the 8-char md5
    // prefix compare would send ~15/16 of ids to the near-zero split
    val degenerate = Seq("a" -> 1.0, "b" -> 1e-12)
    val counts = Sampling.deterministicSplit((0L until 5000L).toDF("id"), "id", degenerate)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("a", 0L) == 5000L, s"boundary overflow misrouted rows: $counts")
    (0L until 100L).foreach { i =>
      assert(Sampling.splitOf(i.toString, degenerate) == "a")
    }
  }

  test("stratified fraction 1.0 keeps EVERY row (no ffffffff boundary loss)") {
    val df = strata(2000L)
    val kept = Sampling.stratifiedSample(df, "stratum", "id", Map("a" -> 1.0), 0.0)
      .count()
    assert(kept == 2000L, s"fraction 1.0 must keep all of stratum a, kept $kept")
  }

  private def strata(n: Long) = {
    import spark.implicits._
    (0L until n).flatMap(i => Seq(("a", i), ("b", i), ("c", i))).toDF("stratum", "id")
  }

  test("stratified sample hits per-stratum fractions; unknown strata use the default") {
    val n = 10000L
    val counts = Sampling.stratifiedSample(
      strata(n), "stratum", "id", Map("a" -> 0.5, "b" -> 0.1), defaultFraction = 0.9)
      .groupBy("stratum").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("a").toDouble / n - 0.5) < 0.02, counts.toString)
    assert(math.abs(counts("b").toDouble / n - 0.1) < 0.02, counts.toString)
    assert(math.abs(counts("c").toDouble / n - 0.9) < 0.02, counts.toString)
  }

  test("stratified draws are decorrelated across strata (pair hash, not id hash)") {
    val kept = Sampling.stratifiedSample(
      strata(2000L), "stratum", "id", Map("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val aOnly = kept.collect { case ("a", i) => i }
    val bOnly = kept.collect { case ("b", i) => i }
    // if the id alone were hashed, the kept sets would be identical
    assert(aOnly != bOnly, "strata must draw independently for the same ids")
  }

  test("stratified sample is deterministic and rejects bad fractions") {
    val df = strata(100L)
    val f = Map("a" -> 0.3)
    val r1 = Sampling.stratifiedSample(df, "stratum", "id", f, 0.2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val r2 = Sampling.stratifiedSample(df, "stratum", "id", f, 0.2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(r1 == r2)
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(df, "stratum", "id", Map("a" -> 1.5)))
    // fraction 0 keeps nothing in that stratum
    val zero = Sampling.stratifiedSample(df, "stratum", "id", Map("a" -> 0.0), 1.0)
      .filter(org.apache.spark.sql.functions.col("stratum") === "a").count()
    assert(zero == 0L)
  }

  test("stratified sample: NULL stratum uses the default fraction, NULL id is excluded") {
    import spark.implicits._
    val n = 10000L
    val nullStratum = (0L until n).map(i => (Option.empty[String], Some(i))) ++
      Seq((Some("a"), Option.empty[Long]))
    val df = nullStratum.toDF("stratum", "id")
    val kept = Sampling.stratifiedSample(df, "stratum", "id", Map("a" -> 1.0), defaultFraction = 0.5)
    // null-stratum rows sample at defaultFraction with independent per-id draws
    val nullKept = kept.filter(col("stratum").isNull).count()
    assert(math.abs(nullKept.toDouble / n - 0.5) < 0.02, s"null-stratum kept $nullKept of $n")
    // the null-id row is excluded even though its stratum's fraction is 1.0
    assert(kept.filter(col("id").isNull).count() == 0L)
  }

  test("stratified sample: a literal NUL-char stratum cannot alias the null stratum") {
    import spark.implicits._
    // same ids in a NUL-valued stratum and a NULL stratum: under a
    // NUL-byte null sentinel both would hash identically and share every
    // draw; the injective v/n marker encoding keeps them independent
    val n = 4000L
    val df = ((0L until n).map(i => (Some("\u0000"), i)) ++
      (0L until n).map(i => (Option.empty[String], i))).toDF("stratum", "id")
    val kept = Sampling.stratifiedSample(df, "stratum", "id", Map.empty, defaultFraction = 0.5)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    val nulKept = kept.collect { case (Some("\u0000"), i) => i }
    val nullKept = kept.collect { case (None, i) => i }
    assert(nulKept != nullKept, "NUL-valued stratum drew identically to the null stratum")
    // both still sample at the default fraction
    assert(math.abs(nulKept.size.toDouble / n - 0.5) < 0.03, s"kept ${nulKept.size} of $n")
    assert(math.abs(nullKept.size.toDouble / n - 0.5) < 0.03, s"kept ${nullKept.size} of $n")
  }

  test("weighted sample: p proportional to weight, max-weight row always kept") {
    import spark.implicits._
    // weights 1 and 1000: the heavy rows are kept with p = 1, the light
    // rows with p = 1/1000
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) 1000L else 1L)).toDF("id", "w")
    val kept = Sampling.weightedBernoulli(df, "id", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (heavy, light) = kept.partition(_._2 == 1000L)
    assert(heavy.length == 1000, "p = w/max = 1 must keep every max-weight row")
    assert(light.length < 15, s"p = 1/1000 kept ${light.length} of 1000 light rows")
    // deterministic
    val again = Sampling.weightedBernoulli(df, "id", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.toSet == again.toSet)
  }

  test("weighted sample: realized rate tracks w/max for mid-range weights") {
    import spark.implicits._
    // weight 250 of max 1000 -> p = 0.25
    val df = ((1L to 4000L).map(i => (i, 250L)) :+ (9999L, 1000L)).toDF("id", "w")
    val n = Sampling.weightedBernoulli(df, "id", "w")
      .filter(col("w") === 250L).count()
    assert(math.abs(n - 1000L) < 120, s"expected ~1000 of 4000 at p=0.25, got $n")
  }

  test("weighted sample: null and non-positive weights never survive") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(100L)), (2L, None), (3L, Some(0L)), (4L, Some(-5L)))
      .toDF("id", "w")
    val kept = Sampling.weightedBernoulli(df, "id", "w")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"only the max-weight row may survive, got $kept")
  }

  // ------------------------------------------------------------ stratumCapK

  /** Reference selection: k smallest (u32 draw, id) per stratum. */
  private def capRef(rows: Seq[(Long, String)], k: Int): Set[Long] = {
    def u32(stratum: String, id: Long): Long = {
      val key = (if (stratum == null) "n" else "v" + stratum) + ":" + id
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
    }
    rows.groupBy(_._2).values.flatMap {
      grp => grp.map(_._1).sortBy(id => (u32(grp.head._2, id), id)).take(k)
    }.toSet
  }

  test("stratum cap keeps exactly k per large stratum, all of small strata") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, s"s${i % 3}")) ++ Seq((900L, "tiny"), (901L, "tiny"))
    val df = rows.toDF("id", "src")
    val kept = Sampling.stratumCapK(df, "src", "id", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map("s0" -> 5, "s1" -> 5, "s2" -> 5, "tiny" -> 2), s"got $bySrc")
    assert(kept.map(_._1).toSet == capRef(rows, 5), "selection must match the rank-window reference")
  }

  test("stratum cap selection is independent of other strata and stable under growth") {
    import spark.implicits._
    val s0 = (1L to 50L).map(i => (i, "a"))
    val before = Sampling.stratumCapK(s0.toDF("id", "src"), "src", "id", 4)
      .collect().map(_.getLong(0)).toSet
    // adding a foreign stratum never changes stratum a's picks
    val after = Sampling.stratumCapK((s0 ++ (100L to 160L).map(i => (i, "b"))).toDF("id", "src"),
      "src", "id", 4)
      .filter(col("src") === "a").collect().map(_.getLong(0)).toSet
    assert(before == after)
  }

  test("stratum cap: null stratum is its own capped group, null ids are dropped") {
    import spark.implicits._
    val df = ((1L to 20L).map(i => (Some(i), None: Option[String])) :+ ((None: Option[Long], Some("x"))))
      .toDF("id", "src")
    val kept = Sampling.stratumCapK(df, "src", "id", 3).collect()
    assert(kept.forall(_.isNullAt(1)) && kept.length == 3,
      "3 null-stratum rows kept; the null-id row of stratum x cannot be selected")
    intercept[IllegalArgumentException](Sampling.stratumCapK(df, "src", "id", 0))
  }

  // ---------------------------------------------------------- mixtureSample

  test("mixture sample hits each budget regime: whole, thinned, zero, unlisted") {
    import spark.implicits._
    // 4 sources x 500 docs x 10 tokens = 5000 tokens per source
    val df = (0L until 2000L).map(i => (i, s"m${i % 4}", 10L)).toDF("id", "src", "w")
    val kept = Sampling.mixtureSample(df,
      Map("m0" -> 999999L, "m1" -> 1000L, "m2" -> 0L),
      "src", "id", "w")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("m0", 0) == 500, "budget >= total keeps the source whole")
    assert(!bySrc.contains("m2") && !bySrc.contains("m3"), "budget-0 and unlisted sources are dropped")
    val m1Tokens = bySrc.getOrElse("m1", 0) * 10L
    assert(math.abs(m1Tokens - 1000L) < 400, s"~1000 of 5000 m1 tokens expected, got $m1Tokens")
    // exact replay: same kept set on a reshuffled input
    val again = Sampling.mixtureSample(df.repartition(7), Map("m0" -> 999999L, "m1" -> 1000L, "m2" -> 0L),
      "src", "id", "w").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet == again.toSet)
  }

  test("mixture sample: null ids and null sources are dropped; invalid budgets rejected") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("m0"), 10L), (None, Some("m0"), 10L), (Some(3L), None, 10L))
      .toDF("id", "src", "w")
    val kept = Sampling.mixtureSample(df, Map("m0" -> 999999L), "src", "id", "w")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
    intercept[IllegalArgumentException](
      Sampling.mixtureSample(df, Map.empty[String, Long], "src", "id", "w"))
    intercept[IllegalArgumentException](
      Sampling.mixtureSample(df, Map("m0" -> -1L), "src", "id", "w"))
  }

  test("quantile buckets: per-stratum quartiles with ntile remainder semantics") {
    import spark.implicits._
    // stratum a: 8 rows -> 2 per bucket; stratum b: 6 rows -> 2,2,1,1
    val df = ((1L to 8L).map(i => ("a", i, i * 10)) ++
      (1L to 6L).map(i => ("b", i + 100, i))).toDF("lang", "doc_id", "n_chars")
    val out = Sampling.quantileBuckets(df, k = 4, "n_chars", "doc_id", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3)).toMap
    assert((1L to 8L).map(i => out(("a", i))) == Seq(1, 1, 2, 2, 3, 3, 4, 4))
    assert((1L to 6L).map(i => out(("b", i + 100))) == Seq(1, 1, 2, 2, 3, 4))
  }

  test("quantile buckets: null values sort first; a null stratum is its own group") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), 1L, Some(50L)), (Some("a"), 2L, None), (Some("a"), 3L, Some(10L)),
      (None, 4L, Some(1L)), (None, 5L, Some(2L))).toDF("lang", "doc_id", "n_chars")
    val out = Sampling.quantileBuckets(df, k = 2, "n_chars", "doc_id", "lang").collect()
      .map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(out(2L) == 1, "null value ranks first (NULLS FIRST pinned)")
    assert(out == Map(1L -> 2, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 2))
  }

  test("boundary buckets: map-only assignment against ascending boundaries") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0)), (2L, Some(10.0)), (3L, Some(10.5)), (4L, Some(99.0)), (5L, None))
      .toDF("id", "v")
    val out = Sampling.boundaryBuckets(df, "v", Seq(10.0, 20.0)).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 1))
    intercept[IllegalArgumentException](Sampling.boundaryBuckets(df, "v", Seq(20.0, 10.0)))
    intercept[IllegalArgumentException](Sampling.boundaryBuckets(df, "v", Seq.empty))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("negativeSamples: equals the driver-side md5 reference; label/self/k invariants hold") {
    import spark.implicits._
    val items = (0L until 200L).map(i => (i, i % 4)).toDF("vec_id", "label")
    val got = Sampling.negativeSamples(items, k = 5, poolSize = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver reference: same pool rule, same pair-hash rank
    val pool = (0L until 200L).map(i => (md5hex(i.toString), i))
      .sorted.take(16).map { case (_, i) => (i, i % 4) }
    val want = (0L until 200L).flatMap { a =>
      pool.filter { case (pid, plbl) => plbl != a % 4 && pid != a }
        .map { case (pid, _) => (md5hex(s"${a}_$pid"), pid) }
        .sorted.take(5).zipWithIndex
        .map { case ((_, pid), ix) => (a, pid, ix + 1L) }
    }
    assert(got.sorted.toSeq == want.sorted.toSeq)
    val byAnchor = got.groupBy(_._1)
    assert(byAnchor.values.forall(_.length == 5), "4 labels x 16-pool: every anchor finds 5")
    assert(got.forall { case (a, n, _) => a % 4 != n % 4 && a != n })
    // determinism across runs and partitionings
    val again = Sampling.negativeSamples(items.repartition(7), k = 5, poolSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sorted.toSeq == got.sorted.toSeq)
  }

  test("negativeSamples: an anchor whose label covers the pool gets nothing, not same-label fill") {
    import spark.implicits._
    // pool will be all label 0; the lone label-1 anchor gets negatives, label-0 anchors get none
    val items = ((0L until 30L).map(i => (i, 0L)) :+ (99L, 1L)).toDF("vec_id", "label")
    val got = Sampling.negativeSamples(items, k = 3, poolSize = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty && got.forall(_._1 == 99L), s"only the cross-label anchor can sample: $got")
    assert(got.length == 3)
  }
}
