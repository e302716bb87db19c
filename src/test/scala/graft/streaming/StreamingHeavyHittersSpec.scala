package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("batch semantics: ample k recovers exact term counts across shards") {
    import spark.implicits._
    val docs = Seq(
      "alpha alpha beta",
      "alpha beta gamma",
      "delta").toDF("text")
    val out = StreamingHeavyHitters.heavyHitters(docs, k = 16, shards = 4)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 1L, "delta" -> 1L))
  }

  test("a term's occurrences always land in one shard") {
    import spark.implicits._
    val docs = (1 to 50).map(i => s"hot w$i").toDF("text")
    val rows = StreamingHeavyHitters.heavyHitters(docs, k = 64, shards = 8).collect()
    val shardsOfHot = rows.filter(_.getString(1) == "hot").map(_.getInt(0)).distinct
    assert(shardsOfHot.length == 1)
    assert(rows.find(_.getString(1) == "hot").get.getLong(2) == 50L)
  }

  test("streaming update mode: counts accumulate across micro-batches with bounded state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val query = StreamingHeavyHitters.heavyHitters(input.toDF().toDF("text"), k = 8, shards = 2)
      .writeStream.format("memory").queryName("hh_out").outputMode("update").start()
    try {
      input.addData("spam spam ham", "spam eggs")
      query.processAllAvailable()
      def latest(): Map[String, Long] = {
        // update mode re-emits a shard's rows each trigger; the freshest
        // estimate per term is the largest one emitted so far
        spark.table("hh_out").collect()
          .groupBy(_.getString(1)).map { case (t, rs) => t -> rs.map(_.getLong(2)).max }
      }
      val first = latest()
      assert(first("spam") == 3L && first("ham") == 1L)
      input.addData("spam spam")
      query.processAllAvailable()
      val second = latest()
      assert(second("spam") == 5L, s"state must carry across batches: $second")
    } finally query.stop()
  }

  test("adversarial zipf stream: every true heavy hitter survives the k-bound") {
    import spark.implicits._
    // one shard so the MG bound applies to the whole stream: n = 3000,
    // k = 8 -> any term with true count > 334 must be present
    val rng = new scala.util.Random(13)
    val terms = (1 to 3000).map { _ =>
      val r = rng.nextDouble()
      if (r < 0.3) "h1" else if (r < 0.5) "h2" else s"tail${rng.nextInt(800)}"
    }
    val docs = terms.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val out = StreamingHeavyHitters.heavyHitters(docs, k = 8, shards = 1)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val trueCounts = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((t, c) <- trueCounts if c > 3000 / 9) {
      assert(out.contains(t), s"heavy term $t (count $c) missing")
      assert(out(t) <= c && out(t) >= c - 3000 / 9, s"$t est ${out(t)} vs true $c")
    }
  }
}
