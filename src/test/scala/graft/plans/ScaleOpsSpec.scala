package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("bucketed tables join without any exchange") {
    val sf = "/root/testdata/sf0.001"
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    ScaleOps.writeBucketed(lineitem, "li_bucketed", "l_orderkey", 8)
    ScaleOps.writeBucketed(orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_bucketed", "l_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle-based join
      val joined = spark.table("li_bucketed").join(spark.table("ord_bucketed"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must be exchange-free:\n${plan.take(1500)}")
      assert(joined.count() == lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    // 95% of left rows hit key 1 — the classic hot key
    val left = (0 until 5000).map(i => (if (rng.nextDouble() < 0.95) 1L else rng.nextInt(100).toLong, i))
      .toDF("k", "payload")
    val right = (0L until 100L).map(k => (k, s"dim-$k")).toDF("k", "name")

    val plain = left.join(right, "k").select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(t => (t._1, t._2))
    val salted = ScaleOps.saltedInnerJoin(left, right, "k", salts = 8).select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(t => (t._1, t._2))
    assert(salted.toSeq == plain.toSeq)

    // the salt must actually split the hot key across multiple values
    val saltCount = left.withColumn("__salt", pmod(xxhash64(struct(col("k"), col("payload"))), lit(8)))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(saltCount > 4, s"hot key only spread over $saltCount salts")
  }

  test("approx_count_distinct tracks the exact count within its rsd bound") {
    import spark.implicits._
    // 10k rows over 1237 distinct keys, skewed; HLL at rsd=0.02 should land
    // well within 3x the bound (HLL++ error is ~rsd with high probability)
    val df = (0 until 10000).map(i => (i * i % 1237).toLong).toDF("k")
    val exact = df.select(countDistinct(col("k"))).head().getLong(0)
    val approx = df.select(approx_count_distinct(col("k"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile tracks exact interpolated percentiles within its accuracy bound") {
    import spark.implicits._
    // the 100 TB path for value_quantiles: approx_percentile's rank error is
    // <= n/accuracy; at accuracy=10000 over 20k rows that is 2 ranks
    val df = (1 to 20000).map(i => (i.toLong * 7919) % 100003).map(_.toDouble).toDF("v")
    val qs = Array(0.1, 0.5, 0.9, 0.99)
    val exact = df.stat.approxQuantile("v", qs, 0.0) // relativeError 0 = exact
    val approx = df.select(
      percentile_approx(col("v"), typedLit(qs.toSeq), lit(10000))).head()
      .getSeq[Double](0)
    qs.indices.foreach { i =>
      val tol = 100003.0 * 0.005 // 2/20000 rank error on a ~uniform value range, padded
      assert(math.abs(approx(i) - exact(i)) <= tol,
        s"p=${qs(i)}: approx ${approx(i)} vs exact ${exact(i)}")
    }
  }

  test("morton code: injective interleave, locality, and reference bit math") {
    import spark.implicits._
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ScaleOps.mortonCode(col("x"), col("y"), 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // reference interleave
    def ref(x: Long, y: Long): Long =
      (0 until 5).map(b => (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).sum
    pts.foreach { case (x, y) => assert(got((x, y)) == ref(x, y)) }
    // injective over the domain
    assert(got.values.toSet.size == pts.length)
    // locality: any 4x4 tile spans at most a 64-code range (perfect tiles
    // align at multiples of 4; this asserts the aligned case)
    for (tx <- 0L until 32L by 4; ty <- 0L until 32L by 4) {
      val codes = for (dx <- 0L until 4L; dy <- 0L until 4L) yield got((tx + dx, ty + dy))
      assert(codes.max - codes.min < 64, s"tile ($tx,$ty) scattered: ${codes.min}..${codes.max}")
    }
  }

  test("zorderBy clusters both dimensions into tight per-file ranges") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val df = (1 to 4000).map(_ => (rng.nextInt(1024).toLong, rng.nextInt(1024).toLong))
      .toDF("x", "y")
    val parts = ScaleOps.zorderBy(df, "x", "y", bitsPerDim = 10, numPartitions = Some(16))
      .rdd.glom().collect().filter(_.nonEmpty)
    assert(parts.length > 1, "need multiple partitions to assert clustering")
    // each z-ordered partition must cover a small sub-rectangle of the
    // 1024x1024 space on average, far below the full extent a random or
    // single-column sort would leave on the other axis
    val avgArea = parts.map { rows =>
      val xs = rows.map(_.getLong(0)); val ys = rows.map(_.getLong(1))
      (xs.max - xs.min + 1).toDouble * (ys.max - ys.min + 1)
    }.sum / parts.length
    assert(avgArea < 1024.0 * 1024 / 2, f"avg covered area $avgArea%.0f not clustered")
  }

  test("partitioned parquet layout: date filter prunes partitions in the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-partlayout-").toString
    // 1000 events over 10 days, laid out hive-style by event_date — the
    // storage answer that turns a time-ranged 100 TB scan into a targeted one
    (0 until 1000)
      .map(i => (i.toLong, java.sql.Date.valueOf(f"2026-01-${i % 10 + 1}%02d"), i * 1.5))
      .toDF("event_id", "event_date", "value")
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .filter(col("event_date") === java.sql.Date.valueOf("2026-01-03"))
    assert(pruned.count() == 100L)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("event_date"),
      s"expected partition filters on event_date in:\n$scan")
    // the partition filter must actually reach the scan (not a post-filter):
    // only one of the ten date directories may survive pruning
    val scanNode = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scanNode.exists(_.selectedPartitions.partitionCount == 1),
      s"expected 1 selected partition, got ${scanNode.map(_.selectedPartitions.partitionCount)}")
  }

  test("rendezvous shards: moved keys land ONLY on the new shard; churn near 1/(n+1)") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("doc_id")
    val got = ScaleOps.rendezvousShards(ids, "doc_id", 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.length == 2000)
    assert(got.forall(t => t._2 >= 0 && t._2 < 16 && t._3 >= 0 && t._3 < 17))
    val moved = got.filter(_._4)
    // THE rendezvous elasticity guarantee: a key moves iff the NEW shard's
    // weight wins, so every move targets shard 16
    assert(moved.forall(_._3 == 16L), "every moved key must land on the new shard")
    assert(got.filter(!_._4).forall(t => t._2 == t._3))
    val frac = moved.length.toDouble / got.length
    assert(frac > 0.02 && frac < 0.10, s"expected ~1/17 = 0.059 churn, got $frac")
  }

  test("rendezvous shards: assignment is a pure function of the key (stable across runs)") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("doc_id")
    def go() = ScaleOps.rendezvousShards(ids.repartition(7), "doc_id", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(go() == go())
    // balance sanity: no shard is empty or hoards >3x its fair share
    val sizes = go().values.groupBy(identity).map(_._2.size)
    assert(sizes.size == 16 && sizes.max < 3 * 500 / 16)
  }
}
