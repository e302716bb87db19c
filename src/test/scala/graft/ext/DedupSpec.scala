package graft.ext

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups by normalized content (case/whitespace-insensitive)") {
    val d = docs(
      1L -> "Hello   World",
      2L -> "hello world",
      3L -> "something else entirely")
    val out = Dedup.exact(d).collect()
    assert(out.length == 2)
    val dup = out.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L) // keep_id = min doc_id
  }

  test("ngram jaccard finds the planted near-dup and not unrelated docs") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " w99"
    val unrelated = (100 to 130).map(i => s"u$i").mkString(" ")
    val out = Dedup.ngramJaccardPairs(docs(1L -> base, 2L -> nearDup, 3L -> unrelated), threshold = 0.5)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    val jac = out.head.getDouble(2)
    assert(jac > 0.8 && jac < 1.0)
  }

  test("df cap drops hot grams from the intersection join") {
    // every doc shares the same 3 leading tokens -> one hot gram; cap at 2
    // removes it, so docs overlapping ONLY in the hot gram pair up no more
    val d = docs(
      1L -> "a b c x1 x2 x3",
      2L -> "a b c y1 y2 y3",
      3L -> "a b c z1 z2 z3")
    val uncapped = Dedup.ngramJaccardPairs(d, threshold = 0.01)
    assert(uncapped.count() == 3) // all pairs share "a b c"
    val capped = Dedup.ngramJaccardPairs(d, threshold = 0.01, maxDf = 2)
    assert(capped.count() == 0)
  }

  test("minhash-LSH + exact verify equals the exact jaccard result on the sf0.001 fixture") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(real, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    val lsh = Dedup.minhashLshVerifiedPairs(real, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(exact.nonEmpty, "fixture must contain near-dups")
    assert(lsh.toSeq == exact.toSeq)
  }

  test("simhash pairs near-identical docs within the Hamming radius") {
    // SimHash needs enough tokens for stable sign votes: on short docs the
    // per-bit vote sums sit near zero and a one-token edit flips many bits.
    // 300 shared tokens + 1 extra shifts each vote sum by only 1.
    val base = (1 to 300).map(i => s"tok$i").mkString(" ")
    val almost = base + " tokX"
    val other = (2000 to 2300).map(i => s"z$i").mkString(" ")
    val out = Dedup.simhashPairs(docs(1L -> base, 2L -> almost, 3L -> other), maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("minhash per-doc kernels hash bitwise what the expression builders hash") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    // hostile fixture: repeated grams + case/whitespace noise, multibyte
    // UTF-8 tokens, exactly-n tokens, sub-n tokens, empty text
    val d = docs(
      1L -> "Alpha   beta GAMMA beta gamma beta gamma",
      2L -> "héllo wörld 中文 分词 test ünicode bytes",
      3L -> "one two three",
      4L -> "too short",
      5L -> "")
    val expGrams = d
      .select(col("doc_id"), explode(ngramHashes(tokens(col("text")), 3)).as("g"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val norms = d
      .select(col("doc_id"), normText(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val kerGrams = norms.flatMap { case (id, t) =>
      Dedup.distinctGramHashes(t, 3).map(g => (id, g))
    }.toSet
    assert(kerGrams == expGrams, "kernel gram hashes diverge from ngram_hashes + distinct")
    val sigs = Dedup.minhashSignatures(d, numHashes = 64)
    val bandCols = (0 until 32).map(b => xxhash64(col(s"h${2 * b}"), col(s"h${2 * b + 1}")).as(s"k$b"))
    val expBands = sigs.select(col("id") +: bandCols: _*).collect()
      .flatMap(r => (0 until 32).map(b => (r.getLong(0), b, r.getLong(1 + b)))).toSet
    val kerBands = norms.flatMap { case (id, t) =>
      Dedup.minhashBandRows(Dedup.distinctGramHashes(t, 3), 64, 32)
        .map { case (b, k) => (id, b, k) }
    }.toSet
    assert(kerBands == expBands, "kernel band keys diverge from the xxhash64 expression chain")
  }

  test("minhash signatures: identical docs collide on every component") {
    val d = docs(1L -> "one two three four five six", 2L -> "one two three four five six")
    val sigs = Dedup.minhashSignatures(d, numHashes = 16).collect()
    val s1 = sigs.find(_.getLong(0) == 1L).get
    val s2 = sigs.find(_.getLong(0) == 2L).get
    (1 to 16).foreach(i => assert(s1.getLong(i) == s2.getLong(i)))
  }

  test("md5 simhash matches a from-first-principles digest replication") {
    // independent reimplementation: md5 hex -> hi/lo 32-bit words, tf-weighted
    // bit votes, strict-positive sign packing into a signed int64
    def reference(text: String): Long = {
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val votes = new Array[Long](64)
      toks.groupBy(identity).foreach { case (t, g) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        val hi = java.lang.Long.parseLong(hex.substring(0, 8), 16)
        val lo = java.lang.Long.parseLong(hex.substring(8, 16), 16)
        for (j <- 0 until 64) {
          val w = if (j < 32) lo else hi
          votes(j) += g.length.toLong * (if (((w >> (j % 32)) & 1L) == 1L) 1 else -1)
        }
      }
      (0 until 64).map(j => if (votes(j) > 0) 1L << j else 0L).reduce(_ | _)
    }
    val texts = Map(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "completely different content with other words entirely",
      3L -> "the quick brown fox")
    val got = Dedup.simhashMd5Signatures(docs(texts.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, t) => assert(got(id) == reference(t), s"doc $id") }
  }

  test("incremental dedup: exact anti-join result through the bloom prefilter") {
    import spark.implicits._
    val corpus = (1L to 400L).map(i => (i, s"corpus doc number $i")).toDF("doc_id", "text")
    // 30 new docs: 10 exact dups of corpus content (normalized), 20 novel
    val newDocs = (
      (1001L to 1010L).map(i => (i, s"  Corpus DOC Number ${i - 1000} ")) ++
      (1011L to 1030L).map(i => (i, s"novel doc $i"))).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedupNew(newDocs, corpus, expectedCorpusItems = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (1011L to 1030L).toSet,
      s"dups must be dropped (no false negatives), novel kept exactly: $kept")
    // columns pass through untouched
    val cols = Dedup.incrementalDedupNew(newDocs, corpus, 1000L).columns.toSeq
    assert(cols == Seq("doc_id", "text"))
  }

  test("semanticDedup keeps one representative (min id) per cosine near-dup group") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    def noisy(v: Array[Double], eps: Double): Seq[Double] =
      v.map(x => x + rng.nextGaussian() * eps).toSeq
    val a = Array.fill(16)(rng.nextGaussian())
    val b = Array.fill(16)(rng.nextGaussian())
    // a 3-member near-dup CHAIN around `a` (transitive closure must collapse
    // it to one representative), a 2-member group around `b`, 2 singletons
    val rows = Seq(
      10L -> noisy(a, 0.001), 11L -> noisy(a, 0.001), 12L -> noisy(a, 0.001),
      20L -> noisy(b, 0.001), 21L -> noisy(b, 0.001),
      30L -> Array.fill(16)(rng.nextGaussian()).toSeq,
      31L -> Array.fill(16)(rng.nextGaussian()).toSeq)
    val df = rows.toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(df, threshold = 0.95, trainSample = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(10L, 20L, 30L, 31L), s"got $kept")
    // columns pass through untouched
    assert(Dedup.semanticDedup(df, threshold = 0.95).columns.toSeq == Seq("vec_id", "embedding"))
  }

  test("decontaminate drops docs sharing an eval n-gram and keeps the rest") {
    import spark.implicits._
    val evalSet = docs(
      100L -> "alpha beta gamma delta epsilon",
      101L -> "too short") // < n tokens: contributes no grams
    val train = docs(
      1L -> "prefix words then beta gamma delta epsilon and more", // shares a 4-gram
      2L -> "beta gamma delta somethingelse entirely here",        // only a 3-gram overlap
      3L -> "completely unrelated training document text",
      4L -> "too short doc") // < n tokens: can never match
    val kept = Dedup.decontaminate(train, evalSet, n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L), s"got $kept")
    // columns pass through untouched
    assert(Dedup.decontaminate(train, evalSet, n = 4).columns.toSeq == Seq("doc_id", "text"))
    // an empty eval set (all docs shorter than n) contaminates nothing
    val all = Dedup.decontaminate(train, docs(200L -> "tiny"), n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L, 4L))
  }

  test("blocked edit-distance pairs: within-block only, distance-capped") {
    import spark.implicits._
    val parts = Seq(
      (1L, "red widget", "B1"), (2L, "red widgets", "B1"), (3L, "red widget", "B2"),
      (4L, "blue bolt", "B1"), (5L, "bolt blue", "B1"))
      .toDF("id", "name", "brand")
    val got = Dedup.blockedEditDistancePairs(parts, "id", "name", Seq("brand"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // (1,2): dist 1, same block; (1,3): identical names but DIFFERENT block
    // -> blocked out; (4,5): dist > 2
    assert(got == Set((1L, 2L, 1)))
  }

  test("md5 simhash pairs near-identical docs like the xxhash variant") {
    val base = (1 to 300).map(i => s"tok$i").mkString(" ")
    val out = Dedup.simhashMd5Pairs(
      docs(1L -> base, 2L -> (base + " tokX"), 3L -> "unrelated words only"), maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("source overlap: shared n-grams pair the right sources with exact jaccard") {
    import spark.implicits._
    val shared = "alpha beta gamma delta" // one shared 4-gram
    val d = Seq(
      (1L, s"$shared one two", "A"),   // 6 tokens -> 3 distinct 4-grams
      (2L, s"$shared nine ten", "B"),  // 6 tokens -> 3 distinct 4-grams
      (3L, "totally different words here", "C"),
      (4L, "tiny", "A"),               // sub-n: contributes nothing
      (5L, s"$shared", null))          // null source: excluded
      .toDF("doc_id", "text", "source")
    val out = Dedup.sourceNgramOverlap(d, n = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 1, s"only A-B share a gram: ${out.mkString(",")}")
    val (a, b, nShared, jac) = out.head
    assert((a, b) == (("A", "B")) && nShared == 1L)
    assert(jac == 1.0 / 5.0, s"1 shared of 3+3-1 grams, got $jac")
  }

  // -------------------------------------------------------------- lineDedup

  private def lineDedupMap(d: org.apache.spark.sql.DataFrame) =
    Dedup.lineDedup(d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("line dedup: first (doc_id, pos) occurrence wins, later copies are removed") {
    val out = lineDedupMap(docs(
      1L -> "header\nbody one\nfooter",
      2L -> "header\nbody two\nfooter",
      3L -> "header\nbody three"))
    // doc 1 owns every one of its lines; docs 2 and 3 lose header/footer
    assert(out(1L) == (("header\nbody one\nfooter", 3L, 3L)))
    assert(out(2L) == (("body two", 3L, 1L)))
    assert(out(3L) == (("body three", 2L, 1L)))
  }

  test("line dedup: a line repeated WITHIN one doc keeps only its first position") {
    val out = lineDedupMap(docs(1L -> "a\nb\na\nc\nb"))
    assert(out(1L) == (("a\nb\nc", 5L, 3L)))
  }

  test("line dedup: a doc whose every line is claimed earlier empties to \"\"") {
    val out = lineDedupMap(docs(1L -> "x\ny", 2L -> "x\ny"))
    assert(out(2L) == (("", 2L, 0L)))
  }

  test("line dedup: null text has 0 lines; null ids are excluded; blank lines dedup too") {
    import spark.implicits._
    val d = Seq(
      (Some(1L), Some("a\n\nb\n\nc")), (Some(2L), None), (None, Some("zz")))
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(1L, 2L))
    // the second blank line (pos 3) is a duplicate of the first (pos 1)
    assert(out(1L) == (("a\n\nb\nc", 5L, 4L)))
    assert(out(2L) == (("", 0L, 0L)))
  }

  test("line dedup honors a custom separator and rejects an empty one") {
    val out = Dedup.lineDedup(docs(1L -> "p||q", 2L -> "p||r"), sep = "||")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "p||q", 2L -> "r"))
    intercept[IllegalArgumentException](Dedup.lineDedup(docs(1L -> "x"), sep = ""))
  }

  test("orderedPairsWithinGroups: the maxGroup admission cap drops only oversize groups") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("hot", 1L), ("hot", 2L), ("hot", 3L), // 3 members -> dropped at cap 2
      ("ok", 10L), ("ok", 11L)).toDF("k", "id")
    val capped = Dedup.orderedPairsWithinGroups(df, col("k"), col("id"), maxGroup = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((10L, 11L)), s"only the small group may pair: $capped")
    val uncapped = Dedup.orderedPairsWithinGroups(df, col("k"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)))
  }

  test("oversizeGroups reports exactly the keys a maxGroup cap would drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("hot", 1L), ("hot", 2L), ("hot", 3L),
      ("ok", 10L), ("ok", 11L), (null.asInstanceOf[String], 99L)).toDF("k", "id")
    val got = Dedup.oversizeGroups(df, col("k"), maxGroup = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("hot", 3L)))
    assert(Dedup.oversizeGroups(df, col("k"), maxGroup = 3L).collect().isEmpty)
  }

  test("ngram jaccard: duplicate doc_id rows cannot inflate the intersection count") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // doc 1 appears TWICE with identical text; doc 2 shares all grams.
    // Without payload dedup in the pair emission, the (1,2) pair is
    // emitted once per duplicate row: i doubles and the jaccard
    // denominator sa + sb - i hits zero -> Infinity passes any threshold
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)), s"duplicate rows corrupted jaccard: ${out.toSeq}")
  }

  test("ngram jaccard: duplicate ids with DIFFERENT text emit one row per size stratum") {
    import spark.implicits._
    // the documented degenerate-input contract: doc 1 appears with two
    // CONFLICTING variants (4 tokens -> 2 grams; 5 tokens -> 3 grams);
    // doc 2 matches the first variant exactly. Each variant pairs
    // independently against doc 2 under its own gram count: the 2-gram
    // variant scores 2/(2+2-2) = 1.0, the 3-gram variant shares the same
    // 2 grams out of 3+2-2 = 3 -> 2/3. Both clear 0.5, so the (1,2) pair
    // surfaces once per stratum — pinned here so a future "helpful"
    // collapse is a conscious contract change, not an accident
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._3)
    assert(out.toSeq == Seq((1L, 2L, 2.0 / 3.0), (1L, 2L, 1.0)),
      s"degenerate-input stratum contract changed: ${out.toSeq}")
  }

  test("per-path oversize diagnostics flag the groups the pair operators' caps would drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ten exact-duplicate docs: every minhash band key collides 10-way and
    // every simhash block collides 10-way, so a cap below 10 drops ALL of
    // it — the diagnostics must say so, and relax to empty at cap >= 10
    val docs = (1L to 10L).map(i => (i, "the same words repeated here for every doc"))
      .toDF("doc_id", "text")
    val mh = Dedup.minhashOversizeBands(docs, maxGroup = 9L, bands = 32)
    assert(mh.count() == 32, "every band's 10-doc group must be flagged at cap 9")
    assert(mh.collect().forall(_.getLong(1) == 10L))
    assert(Dedup.minhashOversizeBands(docs, maxGroup = 10L, bands = 32).collect().isEmpty)
    val sh = Dedup.simhashOversizeBlocks(Dedup.simhashSignatures(docs), maxGroup = 9L)
    assert(sh.count() == 4, "every 16-bit block's 10-doc group must be flagged at cap 9")
    assert(Dedup.simhashOversizeBlocks(Dedup.simhashSignatures(docs), maxGroup = 10L)
      .collect().isEmpty)
  }

  test("corpus diff: added/removed/changed/unchanged, null text and dup ids handled") {
    import spark.implicits._
    val oldSnap = Seq(
      (Some(1L), Some("same text")),
      (Some(2L), Some("old version")),
      (Some(3L), Some("will vanish")),
      (Some(5L), None),
      (Some(6L), None),
      (Some(7L), Some("dup")), (Some(7L), Some("dup")),
      (None, Some("no id"))).toDF("doc_id", "text")
    val newSnap = Seq(
      (Some(1L), Some("Same   TEXT")), // same normalized content
      (Some(2L), Some("new version")),
      (Some(4L), Some("brand new")),
      (Some(5L), None),                 // null text both sides -> unchanged
      (Some(6L), Some("now filled")),   // null -> text = changed
      (Some(7L), Some("dup"))).toDF("doc_id", "text")
    val out = Dedup.corpusDiff(oldSnap, newSnap).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added",
      5L -> "unchanged", 6L -> "changed", 7L -> "unchanged"))
  }

  test("dup ngram fraction: shared grams count as duplicated, unique ones don't") {
    // docs 1 and 2 share the trigram "a b c" (plus nothing else); doc 3 is
    // disjoint. doc 1: grams {a b c, b c x1, c x1 x2} -> 1 of 3 duplicated.
    val d = docs(
      1L -> "a b c x1 x2",
      2L -> "a b c",
      3L -> "q r s t")
    val out = Dedup.dupNgramFraction(d, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(out(1L) == ((3L, 1L, Some(1.0 / 3))))
    assert(out(2L) == ((1L, 1L, Some(1.0))))
    assert(out(3L) == ((2L, 0L, Some(0.0))))
  }

  test("dup ngram fraction: repeats WITHIN one doc are not corpus duplicates") {
    // "a b c" occurs twice in doc 1 but in no other doc: the gram relation
    // is distinct per doc, so its df stays 1 and nothing is flagged
    val out = Dedup.dupNgramFraction(docs(1L -> "a b c a b c"), n = 3).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 0L)
  }

  test("dup ngram fraction: gramless and null-text docs get 0 grams and a NULL fraction") {
    import spark.implicits._
    val d = Seq(
      (Some(1L), Some("too short")), (Some(2L), None), (None, Some("a b c d")))
      .toDF("doc_id", "text")
    val out = Dedup.dupNgramFraction(d, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.isNullAt(3)))).toMap
    assert(out.keySet == Set(1L, 2L)) // null ids excluded
    assert(out(1L) == ((0L, 0L, true)))
    assert(out(2L) == ((0L, 0L, true)))
  }

  test("maxGroup admission pushes drop counts to observed metrics") {
    import spark.implicits._
    import org.apache.spark.sql.util.QueryExecutionListener
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.functions.col
    // capture CollectMetrics results from the job that ran the drop — the
    // production visibility path (a listener every Spark job already has)
    val seen = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) => seen.put(k, v) }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // group 'hot' has 4 members (> cap 2, dropped), 'ok' has 2 (kept)
      val df = Seq(("hot", 1L), ("hot", 2L), ("hot", 3L), ("hot", 4L), ("ok", 10L), ("ok", 11L))
        .toDF("k", "id")
      val pairs = Dedup.orderedPairsWithinGroups(
        df, col("k"), col("id"), maxGroup = 2L, observeTag = "spec_probe")
        .select(col("__a").as("id_a"), col("__b").as("id_b")).collect()
      assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 11L)))
      // the ExecutionListenerBus is async: poll briefly for delivery
      val deadline = System.nanoTime() + 10000000000L
      while (!seen.containsKey("graft.oversize.spec_probe") && System.nanoTime() < deadline)
        Thread.sleep(50)
      val m = seen.get("graft.oversize.spec_probe")
      assert(m != null, "observed metrics never arrived")
      assert(m.getAs[Long]("dropped_rows") == 4L)
      assert(m.getAs[Long]("largest_dropped_group") == 4L)
      // and a run with nothing over the cap reports zero drops
      seen.clear()
      Dedup.orderedPairsWithinGroups(
        df, col("k"), col("id"), maxGroup = 100L, observeTag = "spec_probe_clean").collect()
      val deadline2 = System.nanoTime() + 10000000000L
      while (!seen.containsKey("graft.oversize.spec_probe_clean") && System.nanoTime() < deadline2)
        Thread.sleep(50)
      val clean = seen.get("graft.oversize.spec_probe_clean")
      assert(clean != null && clean.getAs[Long]("dropped_rows") == 0L)
      assert(clean.isNullAt(clean.fieldIndex("largest_dropped_group")))
    } finally spark.listenerManager.unregister(listener)
  }

  test("editDistancePairs: classic distances; lang/ascii gates; SNM window bound") {
    import spark.implicits._
    val d = Seq(
      (1L, "kitten", "en"),
      (2L, "sitting", "en"),                   // dist 3 from kitten
      (3L, "kitten", "de"),                    // same text, other lang: never compared
      (4L, "kittén", "en"),                    // non-ASCII: excluded by the gate
      (5L, "kitten kitten xx", "en"),          // dist >= 10 from everything short
      (6L, "zzzzzzz", "en")                    // dist 6/7 from 1,2 (kept at maxDist 8)
    ).toDF("doc_id", "text", "lang")
    val got = Dedup.editDistancePairs(d, maxDist = 8, window = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 3L, "kitten->sitting is the textbook 3")
    assert(!got.keySet.exists { case (a, b) => a == 3L || b == 3L }, "cross-lang must not pair")
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L }, "non-ASCII must be excluded")
    assert(!got.keySet.exists { case (a, b) => a == 5L || b == 5L },
      "the long doc is compared (SNM window) but every distance exceeds maxDist")
    assert(got.contains((1L, 6L)) && got.contains((2L, 6L)))
    // tighten the threshold: the banded kernel's -1 must drop the far pairs
    val tight = Dedup.editDistancePairs(d, maxDist = 3, window = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tight == Map((1L, 2L) -> 3L))
    // the window is a hard recall bound: rank neighbors beyond it never pair.
    // 20 equal-length docs in lexicographic order; window 2 pairs only
    // rank-adjacent-by<=2 texts
    val many = (0 until 20).map(i => (100L + i, s"word${('a' + i).toChar}x", "en"))
      .toDF("doc_id", "text", "lang")
    val windowed = Dedup.editDistancePairs(many, maxDist = 8, window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(windowed.forall { case (a, b) => b - a <= 2 }, s"window must bound rank distance: $windowed")
    assert(windowed.size == 2 * 20 - 3, "each doc pairs with its <=2 successors")
  }

  test("multi-pass SNM supersets single-pass and recovers prefix-typo pairs") {
    import spark.implicits._
    // 30 filler docs whose texts sort BETWEEN "aaa..." and "zzz..." push the
    // prefix-typo pair ("aab...x" vs "zab...x" — same suffix) out of the
    // forward window; the reversed-text pass sorts them adjacent again
    val suffix = "commonsuffixpayload" // 19 chars; docs 1/2 are 22 chars
    // fillers: same 22-char length, first letters b..y so they sort BETWEEN
    // "aab…" and "zab…" forward, and a shared "…filler" tail that sorts far
    // from "…payload" in the reversed pass
    val fill = (0 until 24).map(i =>
      (100L + i, f"${('b' + i).toChar}%c${i}%02dfillerfillerfillerz", "en"))
    val d = (Seq(
      (1L, "aab" + suffix, "en"),
      (2L, "zab" + suffix, "en")) ++ fill).toDF("doc_id", "text", "lang")
    val single = Dedup.editDistancePairs(d, maxDist = 8, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Dedup.editDistancePairsMultiPass(d, maxDist = 8, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(single.subsetOf(multi.keySet), "multi-pass must superset single-pass")
    assert(!single.contains((1L, 2L)),
      "the forward window alone must miss the prefix-typo pair (fixture premise)")
    assert(multi.get((1L, 2L)).contains(1L),
      s"the reversed pass must recover it at dist 1: $multi")
    // a pair found by BOTH passes is measured once (no duplicate rows)
    val rows = Dedup.editDistancePairsMultiPass(d, maxDist = 8, window = 4).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("editDistancePairsPhonetic: the soundex pass recovers sound-alike typos both lexicographic passes miss") {
    import spark.implicits._
    // docs 1/2: same per-token soundex ("s530 k650 r163") but different
    // lengths AND different first/last characters, so with straddling
    // fillers neither the forward nor the reversed ranking puts them
    // within the window — only the phonetic ranking (identical keys,
    // adjacent by id tie-break) does
    val d1 = "smith karen reports"   // 19 chars
    val d2 = "smyth karon repports"  // 20 chars
    // 19-char fillers sort AFTER d1 forward (start 'z') and after
    // reverse(d1) reversed (end 'z'); 20-char fillers sort BEFORE d2
    // forward (start 'a') and before reverse(d2) reversed (end 'a')
    val f19 = (0 until 6).map(i => (100L + i, "z" + f"q${i}%02dfillerfiller" + "z" * 3, "en"))
    val f20 = (0 until 6).map(i => (200L + i, "a" + f"b${i}%02dfillerfillerx" + "a" * 3, "en"))
    val d = (Seq((1L, d1, "en"), (2L, d2, "en")) ++ f19 ++ f20).toDF("doc_id", "text", "lang")
    assert(f19.forall(_._2.length == 19) && f20.forall(_._2.length == 20))
    val two = Dedup.editDistancePairsMultiPass(d, maxDist = 8, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val three = Dedup.editDistancePairsPhonetic(d, maxDist = 8, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(!two.contains((1L, 2L)),
      "fixture premise: both lexicographic passes must miss the sound-alike pair")
    assert(two.subsetOf(three.keySet), "3-pass must superset 2-pass at equal window")
    assert(three.get((1L, 2L)).contains(3L),
      s"the phonetic pass must recover the pair at dist 3: $three")
    // dedup across passes: one row per pair
    val rows = Dedup.editDistancePairsPhonetic(d, maxDist = 8, window = 4).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("erMatchScores: agreement vector, evidence sum, and decision bands") {
    import spark.implicits._
    import Dedup.{ErWeights => W}
    val d = Seq(
      (1L, "acme corporation", "en", "crawl"),  // len 16, band 1
      (2L, "acme corporation", "en", "crawl"),  // exact dup of 1: all four agree
      (3L, "acme corporatino", "en", "feed"),   // transposition (dist 2), other source
      (4L, "zzzz yyyy xxx ww", "en", "crawl"),  // same block, unrelated text
      (5L, "acme corporation", "de", "crawl"),  // other lang: never compared
      (6L, "acmé corporation", "en", "crawl")   // non-ASCII: excluded
    ).toDF("doc_id", "text", "lang", "source")
    val got = Dedup.erMatchScores(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)),
          r.getLong(6), r.getString(7))).toMap
    // 1-2: everything agrees -> full evidence, "match"
    val full = W.exactAgree + W.nearAgree + W.sourceAgree + W.lenAgree
    assert(got((1L, 2L)) == (((true, true, true, true)), full, "match"))
    // 1-3 and 2-3: near but not exact, source differs, length equal
    val near = W.exactDis + W.nearAgree + W.sourceDis + W.lenAgree
    assert(got((1L, 3L)) == (((false, true, false, true)), near,
      if (near >= W.matchAt) "match" else "possible"))
    assert(got.contains((2L, 3L)))
    // 1-4: same block but only source+len agree -> below the possible cut, dropped
    val weak = W.exactDis + W.nearDis + W.sourceAgree + W.lenAgree
    assert(weak < W.possibleAt && !got.contains((1L, 4L)),
      s"weak evidence ($weak) must fall below the clerical-review cut")
    assert(!got.keySet.exists { case (a, b) => a == 5L || b == 5L }, "cross-lang never pairs")
    assert(!got.keySet.exists { case (a, b) => a == 6L || b == 6L }, "non-ASCII excluded")
  }

  test("erMatchScores: near gate is the banded kernel; length tolerance is inclusive") {
    import spark.implicits._
    val d = Seq(
      (1L, "abcdefgh", "en", "s"),
      (2L, "abcdefghix", "en", "s"),  // dist 2, len diff 2 (inclusive edge)
      (3L, "abcqqqqqqqqq", "en", "s") // dist > 4 from 1, len diff 4
    ).toDF("doc_id", "text", "lang", "source")
    val got = Dedup.erMatchScores(d, nearDist = 4, lenTol = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getBoolean(3), r.getBoolean(5), r.getLong(6))).toMap
    assert(got((1L, 2L))._1, "dist 2 <= nearDist 4")
    assert(got((1L, 2L))._2, "len diff exactly lenTol must agree (inclusive)")
    // 1-3 / 2-3: not near, not len-agree, same source only -> dropped below the cut
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
  }

  test("containmentPairs: a contained quote scores ~1 in its own direction only") {
    val rnd = new scala.util.Random(23)
    def salad(n: Int, r: scala.util.Random): String =
      Seq.fill(n)(('a' + r.nextInt(26)).toChar.toString + ('a' + r.nextInt(26)).toChar).mkString(" ")
    val big = salad(120, rnd)                  // ~360 chars
    val quote = big.substring(90, 290)         // a 200-char run of big
    val other = salad(120, new scala.util.Random(99))
    val got = Dedup.containmentPairs(docs(1L -> big, 2L -> quote, 3L -> other), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(5), r.getDouble(6))).toMap
    assert(got.keySet == Set((1L, 2L)), s"only the quote pair should surface, got $got")
    val (contBig, contQuote) = got((1L, 2L))
    // direction: the QUOTE is contained in BIG, not vice versa
    assert(contQuote >= 0.9, s"quote-side containment should be ~1, got $contQuote")
    assert(contBig < contQuote, "the big doc is not contained in its own quote")
  }

  test("containmentPairs: identical docs hit exactly 1.0 both ways; df cap starves shared counts") {
    val text = "the winnowing containment gate must see this exact duplicated sentence " * 3
    val d = docs(1L -> text, 2L -> text)
    val full = Dedup.containmentPairs(d, threshold = 0.5).collect()
    assert(full.length == 1)
    assert(full.head.getDouble(5) == 1.0 && full.head.getDouble(6) == 1.0)
    assert(full.head.getLong(2) == full.head.getLong(3), "shared == size for identical docs")
    // every fingerprint here has df = 2; capping at df <= 1 removes ALL
    // intersection evidence while sizes are untouched -> no pair clears 0.5
    val starved = Dedup.containmentPairs(d, threshold = 0.5, maxDf = 1L).collect()
    assert(starved.isEmpty, "df cap must only starve the intersection, killing the pair")
  }

  test("dupSpans: localizes the shared paragraph, skips unique docs, splits separated runs") {
    // pre-normalized text (lowercase, single spaces) so char positions in the
    // input are the positions dupSpans reports
    val shared = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val ua = "abc def ghi jkl mno abc ghi jkl def mno"
    val ub = "pqr stu vwx yz0 123 stu vwx pqr 123 yz0"
    val uc = "completely unrelated content using its own distinct words qqq www eee"
    val a = s"$ua $shared $ua"
    val b = s"$ub $shared $ub"
    val d = docs(1L -> a, 2L -> b, 3L -> uc)
    val out = Dedup.dupSpans(d).collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(!byDoc.contains(3L), "fully unique doc must produce no spans")
    for (id <- Seq(1L, 2L)) {
      val spans = byDoc.getOrElse(id, fail(s"doc $id should carry a span"))
      assert(spans.length == 1, s"doc $id: one merged span expected, got ${spans.length}")
      val (s0, s1) = (spans.head.getLong(1), spans.head.getLong(2))
      val sharedStart = (if (id == 1L) ua else ub).length + 2L // 1-based, after "prefix "
      val sharedEnd = sharedStart + shared.length - 1
      // the space joining prefix and shared region is itself shared (" the")
      // in both docs, so the span may legitimately begin up to k-1 chars
      // before the paragraph proper — boundary-gram coincidence, not a bug
      assert(s0 >= sharedStart - 4 && s1 <= sharedEnd + 4,
        s"doc $id: span [$s0,$s1] must sit inside the shared region [$sharedStart,$sharedEnd] ± k-1")
      assert(s1 - s0 >= shared.length - 2 * 9,
        s"doc $id: span [$s0,$s1] must cover most of the ${shared.length}-char shared run")
    }
    // two shared runs separated by >gap unique chars stay two islands
    val s2 = "another duplicated sentence that is long enough to fingerprint"
    val mid1 = "aardvark interlude zzz yyy xxx aardvark interlude zzz yyy xxx"
    val mid2 = "numeric gapfiller 987 654 321 numeric gapfiller 987 654 321 ppp"
    val d2 = docs(10L -> s"$shared $mid1 $s2", 11L -> s"$shared $mid2 $s2")
    val out2 = Dedup.dupSpans(d2).collect().groupBy(_.getLong(0))
    for (id <- Seq(10L, 11L))
      assert(out2(id).length == 2, s"doc $id: the two separated shared runs must stay two spans")
  }

  test("dupSpansRemove: excises exactly the reported spans, passes unique docs whole") {
    val shared = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val ua = "abc def ghi jkl mno abc ghi jkl def mno"
    val ub = "pqr stu vwx yz0 123 stu vwx pqr 123 yz0"
    val uc = "completely unrelated content using its own distinct words qqq www eee"
    val d = docs(1L -> s"$ua $shared $ua", 2L -> s"$ub $shared $ub", 3L -> uc)
    val spans = Dedup.dupSpans(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val out = Dedup.dupSpansRemove(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // unique doc passes through whole with zero accounting
    assert(out(3L) == ((0L, 0L, uc)))
    // excision replays the span table exactly, per doc
    val texts = Map(1L -> s"$ua $shared $ua", 2L -> s"$ub $shared $ub")
    for (id <- Seq(1L, 2L)) {
      val t = texts(id)
      val sp = spans(id).sortBy(_._2)
      val expected = {
        val sb = new StringBuilder
        var nxt = 1L
        sp.foreach { case (_, s0, s1) =>
          sb.append(t.substring(nxt.toInt - 1, s0.toInt - 1)); nxt = s1 + 1
        }
        sb.append(t.substring(nxt.toInt - 1)).toString
      }
      val (nSpans, nRemoved, clean) = out(id)
      assert(nSpans == sp.length.toLong, s"doc $id span count")
      assert(nRemoved == sp.map(x => x._3 - x._2 + 1).sum, s"doc $id removed chars")
      assert(clean == expected, s"doc $id cleaned text")
      assert(clean.length == t.length - nRemoved)
    }
    // span touching position 1: an empty leading segment must not break the fold
    val s2 = "another duplicated sentence that is long enough to fingerprint"
    val d2 = docs(20L -> s"$s2 unique tail twenty one", 21L -> s"$s2 different ending here")
    val rem = Dedup.dupSpansRemove(d2).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(rem(20L).endsWith("one") && !rem(20L).contains("duplicated"))
    assert(rem(21L).endsWith("here") && !rem(21L).contains("duplicated"))
  }
}
