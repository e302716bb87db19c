package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CoverageSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def run(docs: Seq[(Long, String)], k: Int) = {
    import spark.implicits._
    Coverage.greedySelect(docs.toDF("doc_id", "text"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
  }

  /** Independent greedy reference over bigram sets. */
  private def ref(docs: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long)] = {
    def bigrams(t: String): Set[String] = {
      val w = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (w.length < 2) Set.empty else w.sliding(2).map(_.mkString(" ")).toSet
    }
    val gs = docs.map { case (d, t) => d -> bigrams(t) }.filter(_._2.nonEmpty).toMap
    var cov = Set.empty[String]
    val sel = Seq.newBuilder[(Long, Long, Long)]
    var r = 1L
    var done = false
    val chosen = scala.collection.mutable.Set.empty[Long]
    while (r <= k && !done) {
      val cands = gs.filterNot { case (d, _) => chosen(d) }
        .map { case (d, g) => (d, (g -- cov).size.toLong) }
        .filter(_._2 > 0)
      if (cands.isEmpty) done = true
      else {
        val (d, m) = cands.minBy { case (d, m) => (-m, d) }
        sel += ((r, d, m)); chosen += d; cov ++= gs(d); r += 1
      }
    }
    sel.result()
  }

  test("greedy picks the coverage maximizer each round, not the largest doc") {
    val docs = Seq(
      (1L, "a b c d e f"),          // 5 bigrams
      (2L, "a b c d"),              // subset of 1: gain drops to 0 after 1
      (3L, "x y z w"),              // disjoint: 3 bigrams
      (4L, "e f x y"))              // straddles 1 and 3
    val got = run(docs, 4)
    assert(got == ref(docs, 4))
    assert(got.head._2 == 1L, "round 1 takes the biggest gram set")
    assert(got.map(_._2).contains(3L), "the disjoint doc beats the subset doc")
    assert(!got.map(_._2).contains(2L), "a fully-covered subset never gets picked")
  }

  test("selection stops at saturation instead of emitting zero gains") {
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "b c"))
    val got = run(docs, 5)
    assert(got == Seq((1L, 1L, 2L)), s"doc 1 covers everything; greedy must stop: $got")
  }

  test("matches the independent reference on random corpora") {
    val rnd = new scala.util.Random(61)
    val words = ('a' to 'p').map(_.toString)
    val docs = (1L to 40L).map { d =>
      d -> Seq.fill(3 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" ")
    }
    assert(run(docs, 8) == ref(docs, 8))
  }

  test("ties break toward the smaller doc id") {
    val docs = Seq((7L, "p q r"), (3L, "x y z"), (9L, "m n o"))
    val got = run(docs, 1)
    assert(got == Seq((1L, 3L, 2L)), s"equal gains: smallest id wins: $got")
  }

  test("CELF: k picks launch ~1 corpus pass, not k — and still match plain greedy") {
    // Leskovec et al. 2007: cached gains are upper bounds under
    // submodularity, so rounds after the first are driver set arithmetic
    // over the bounded pool. Count Spark jobs via a job-group-filtered
    // listener (suites share the session, so filter is required).
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val rnd = new scala.util.Random(87)
    val words = ('a' to 'p').map(_.toString)
    val docs = (1L to 60L).map { d =>
      d -> Seq.fill(3 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" ")
    }
    val group = s"celf-jobcount-${java.util.UUID.randomUUID()}"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (group == j.properties.getProperty("spark.jobGroup.id")) jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "celf job count")
      val got = run(docs, 8)
      spark.sparkContext.clearJobGroup()
      // give the async listener bus a moment to drain; a late event could
      // only raise the count, and the assert is an upper bound
      Thread.sleep(1000L)
      assert(got == ref(docs, 8), "CELF must select exactly the plain-greedy sequence")
      assert(got.size == 8, s"fixture supports 8 positive-gain rounds: $got")
      val n = jobs.get()
      assert(n < 8, s"8 picks must not cost a corpus pass per round: $n jobs")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.sparkContext.clearJobGroup()
    }
  }

  test("CELF guard: a tiny pool forces repools but never changes the selection") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val words = ('a' to 'l').map(_.toString)
    val docs = (1L to 30L).map { d =>
      d -> Seq.fill(3 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" ")
    }
    // pool=2 < k=6: the heap drains / the floor guard trips repeatedly;
    // every repool must re-rank exactly and keep parity with plain greedy
    val got = Coverage.greedySelect(docs.toDF("doc_id", "text"), 6, pool = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == ref(docs, 6), s"pool=2 selection diverged: $got")
  }

  test("CELF repools when the pool decays to zero but outside docs still have gain") {
    import spark.implicits._
    // pool+1 exact duplicates: after the first pick every pool entry's
    // refreshed gain is 0, yet doc 4 outside the pool still gains 1.
    // Declaring saturation here would drop doc 4 — the fix repools.
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"), (4L, "x y"))
    val got = Coverage.greedySelect(docs.toDF("doc_id", "text"), 4, pool = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == ref(docs, 4), s"zero-decayed pool must repool, not stop: $got")
    assert(got == Seq((1L, 1L, 2L), (2L, 4L, 1L)))
  }

  test("byte-bounded pool collect: a tiny char budget never changes the selection") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val words = ('a' to 'l').map(_.toString)
    // one oversized document dwarfing the char budget on its own: the
    // effective pool shrinks (floor rises), repools multiply, but the
    // selected sequence must stay bit-identical to plain greedy
    val docs = (1L to 30L).map { d =>
      d -> Seq.fill(3 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" ")
    } :+ (31L -> Seq.fill(400)(words(rnd.nextInt(words.size))).mkString(" "))
    val got = Coverage.greedySelect(docs.toDF("doc_id", "text"), 6, pool = 8, maxPoolChars = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == ref(docs, 6), s"char-budget shrink diverged from plain greedy: $got")
  }
}
