package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("quality features on a known string") {
    // text: "The cat is on the mat!" -> 22 chars, 6 tokens
    val r = TextAnalysis.quality(docs(1L -> "The cat is on the mat!")).collect().head
    assert(r.getLong(1) == 22) // n_chars
    assert(r.getLong(2) == 6) // n_tokens
    assert(math.abs(r.getDouble(3) - 16.0 / 22) < 1e-12, "alpha ratio") // 16 letters
    assert(math.abs(r.getDouble(4) - 1.0 / 22) < 1e-12, "punct ratio") // '!'
    // stopwords among [the, cat, is, on, the, mat!]: the, is, on, the = 4
    // ("mat!" is not 'mat', tokens keep punctuation)
    assert(math.abs(r.getDouble(5) - 4.0 / 6) < 1e-12, "stopword ratio")
    // distinct tokens: the, cat, is, on, mat! = 5
    assert(math.abs(r.getDouble(6) - 5.0 / 6) < 1e-12, "distinct ratio")
  }

  test("normalization whitespace class excludes vertical tab (engine-portable contract)") {
    import org.apache.spark.sql.functions.col
    // Java \s matches \x0B but DuckDB/RE2 \s does not, so the normalizer
    // pins the explicit class [ \t\n\f\r]: \x0B must NOT split tokens
    val r = TextAnalysis.quality(docs(1L -> "ab c\td"))
      .select(col("n_tokens")).collect().head.getLong(0)
    assert(r == 3, s"a\\x0Bb must stay ONE token; got $r tokens")
  }

  test("empty text is guarded to zero ratios, not NaN/null") {
    val r = TextAnalysis.quality(docs(1L -> "")).collect().head
    assert(r.getLong(1) == 0)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    assert(!r.isNullAt(5) && !r.isNullAt(6))
  }

  test("language id picks the marker-richest lexicon") {
    val out = TextAnalysis.langId(docs(
      1L -> "der hund ist nicht ein vogel und das haus",
      2L -> "le chat est dans la maison et les jardins",
      3L -> "the dog is in the house and it is a good day",
      4L -> "el perro es una mascota y los gatos")).collect()
    val pred = out.map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(pred == Map(1L -> "de", 2L -> "fr", 3L -> "en", 4L -> "es"))
  }

  test("token counts: whitespace vs BPE-ish") {
    val r = TextAnalysis.tokenCounts(docs(1L -> "abc 123 x!y")).collect().head
    assert(r.getLong(1) == 3) // ws tokens
    assert(r.getLong(2) == 5) // abc, 123, x, !, y
  }

  test("vocabulary: top-k by frequency, lexicographic ties, empty tokens excluded") {
    val out = TextAnalysis.vocabulary(
      docs(1L -> "b b b a a c", 2L -> "a c d", 3L -> "   "), topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // a:3, b:3 (tie -> a first), c:2; d cut at k=3; blank doc contributes nothing
    assert(out.toSeq == Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("fingerprints: whitespace/case-insensitive md5; rolling hash within modulus") {
    val out = TextAnalysis.fingerprints(docs(1L -> "A  b\tC", 2L -> "a b c")).collect()
    val byId = out.map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(byId(1L) == byId(2L), "same normalized content must fingerprint identically")
    assert(byId(1L)._2 >= 0 && byId(1L)._2 < TextAnalysis.rollingHashMod)
  }

  test("tf-idf: rare terms outrank common ones; rank is a total order") {
    // 'zebra' appears in one doc, 'the' in all three: zebra's idf dominates
    val out = TextAnalysis.tfIdfTopTerms(docs(
      1L -> "the zebra the cat",
      2L -> "the dog the cat",
      3L -> "the bird"), topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(5)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq
    assert(doc1.head == "zebra", s"rarest term must rank first, got $doc1")
    assert(out.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq == Seq(1, 2)))
  }

  test("bm25: matching more query terms scores higher; non-matching docs absent") {
    val out = TextAnalysis.bm25Scores(docs(
      1L -> "spark query engine",
      2L -> "spark runtime notes",
      3L -> "nothing relevant here"), Seq("spark", "query"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.keySet == Set(1L, 2L), "doc 3 matches no term and must not appear")
    assert(out(1L) > out(2L), "two matched terms must outscore one")
  }

  test("bm25: length normalization down-weights long docs at equal tf") {
    val out = TextAnalysis.bm25Scores(docs(
      1L -> "spark a b c d e f g h i j k l m n o p q r s t u v w x y z",
      2L -> "spark ok"), Seq("spark"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(2L) > out(1L))
  }

  test("repetition ratio: repeated 3-grams are counted, short docs guarded") {
    val out = TextAnalysis.repetitionRatio(docs(
      1L -> "a b c a b c a b c", // 7 grams, distinct: abc,bca,cab -> 3
      2L -> "all distinct words here now",
      3L -> "x y"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out(1L) == ((7L, 3L, 4.0 / 7.0)))
    assert(out(2L) == ((3L, 3L, 0.0)))
    assert(out(3L) == ((0L, 0L, 0.0)), "docs shorter than n grams are zero, not null")
  }

  test("pii scrub replaces emails, phones, and ipv4 with typed tags") {
    val out = TextAnalysis.piiScrub(docs(
      1L -> "mail a.user+x@sub.example.org or call 415-555-1234 from 192.168.0.1",
      2L -> "no pii at all here",
      3L -> "two mails a@b.io c@d.co and ip 10.0.0.255"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L)._1 == 1L && out(1L)._2 == 1L && out(1L)._3 == 1L)
    assert(out(1L)._4 == "mail <EMAIL> or call <PHONE> from <IP>")
    assert(out(2L) == ((0L, 0L, 0L, "no pii at all here")))
    assert(out(3L)._1 == 2L && out(3L)._3 == 1L)
    assert(out(3L)._4 == "two mails <EMAIL> <EMAIL> and ip <IP>")
  }

  test("chunking: full coverage, exact overlap, single chunk for short docs") {
    import spark.implicits._
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "one two"), (3L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.chunkDocs(df, chunkTokens = 5, overlapTokens = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: 10 tokens, chunk 5, stride 3 -> starts 0, 3, 6 (start 7 would
    // violate start <= n - overlap - 1 = 7? no: 0,3,6 with last covering 7..10)
    val d1 = rows.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2))
    assert(d1.map(_._3).toSeq == Seq(
      "t1 t2 t3 t4 t5", "t4 t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(d1.map(_._4).toSeq == Seq(5, 5, 4))
    // every token appears in some chunk; consecutive chunks share exactly
    // the overlap (here 2) on full-width chunks
    assert(d1.flatMap(_._3.split(" ")).toSet == (1 to 10).map(i => s"t$i").toSet)
    // short doc: one chunk
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0, "one two", 2)))
    // blank text yields NO chunks (the scaladoc contract; blank normalizes
    // to a single empty token, which the emptiness filter rejects)
    assert(rows.filter(_._1 == 3L).isEmpty)
  }

  test("chunking rejects degenerate parameters") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](TextAnalysis.chunkDocs(df, 0, 0))
    intercept[IllegalArgumentException](TextAnalysis.chunkDocs(df, 5, 5))
  }

  test("bigram lm score: common transitions outrank a scrambled doc; short docs are 0") {
    import spark.implicits._
    // docs 1-4 share the frequent transition pattern; doc 5 is the same
    // vocabulary in a transition order seen nowhere else; doc 6 too short
    val common = "the cat sat on the mat"
    val df = (Seq.tabulate(4)(i => (i + 1L, common)) ++
      Seq((5L, "mat the on sat cat the"), (6L, "word"))).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 == 5 && out(5L)._1 == 5)
    assert(out(1L)._2 > out(5L)._2,
      s"fluent ${out(1L)._2} must outrank scrambled ${out(5L)._2}")
    assert(out(6L) == ((0L, 0.0)), "sub-bigram docs score 0 with 0 transitions")
    assert(out(1L) == out(2L), "identical docs score identically")
  }

  test("bigram lm score: every conditional distribution sums to 1 and the score is partition-stable") {
    import spark.implicits._
    val df = Seq((1L, "a b a c a b"), (2L, "b a b c"), (3L, "c a")).toDF("doc_id", "text")
    val once = TextAnalysis.bigramLmScore(df).collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val again = TextAnalysis.bigramLmScore(df.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(once == again, "ordered fold must make the double sum partition-invariant")
    // hand-checked: bigrams of doc 3 = [c a]; C(c,a)=2 ("b c|a"? no: doc2 has
    // "b c" then end; doc 1 has "a c","c a"; doc 3 "c a") -> C(c a)=2, C*(c)=2 -> p=1
    assert(once(3L) == 1.0, s"doc 3's only transition is deterministic: ${once(3L)}")
  }

  test("linear text score: tf-weighted logit with bias; unmatched and null-text docs score the bias") {
    import spark.implicits._
    val docs = Seq(
      (Some(1L), Some("good good bad plain")),
      (Some(2L), Some("nothing matches here")),
      (Some(3L), None),
      (None, Some("good"))).toDF("doc_id", "text")
    val weights = Seq(("good", 1.0), ("bad", -2.0)).toDF("term", "weight")
    val out = TextAnalysis.linearTextScore(docs, weights, bias = 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // null ids excluded
    assert(out(1L) == ((2L, 0.5 + 2 * 1.0 + 1 * -2.0)))
    assert(out(2L) == ((0L, 0.5)))
    assert(out(3L) == ((0L, 0.5)))
  }

  test("linear text score: term-ordered fold is partition-invariant") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val vocab = (0 until 50).map(i => s"w$i")
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(30)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val weights = vocab.map(t => (t, rng.nextGaussian())).toDF("term", "weight")
    val once = TextAnalysis.linearTextScore(docs, weights).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val again = TextAnalysis.linearTextScore(docs.repartition(17), weights).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(once == again)
  }

  /** Driver-side winnowing reference: per window take the minimal 40-bit
    * md5-prefix gram hash, ties to the RIGHTMOST position — the
    * independent implementation the packed-frame-max formulation must
    * match set-for-set.
    */
  private def md5Prefix40(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(5).map("%02x".format(_)).mkString, 16)
  }

  private def referenceWinnow(text: String, k: Int = 5, w: Int = 4): Set[(Long, Long)] = {
    val t = text.replaceAll("[ \\t\\n\\f\\r]+", " ").trim.toLowerCase
    val np = t.length - k + 1
    if (np < w) return Set.empty
    (1 to (np - w + 1)).map { ws =>
      val window = (ws until ws + w).map(p => (p, md5Prefix40(t.substring(p - 1, p - 1 + k))))
      val minH = window.map(_._2).min
      (window.filter(_._2 == minH).map(_._1).max.toLong, minH)
    }.toSet
  }

  test("trendingTerms: surging vocabulary surfaces; stable and fading terms rank below") {
    // ids 0..9: even = old half, odd = new half
    val corpus = (0L to 9L).map { id =>
      val base = "stable words here always"
      val surge = if (id % 2 == 1) " surging" else ""
      val fade = if (id % 2 == 0) " fading" else ""
      id -> s"$base$surge$fade"
    }
    val out = TextAnalysis.trendingTerms(docs(corpus: _*), topK = 10, minDfNew = 3L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("surging") == ((0L, 5L, 6.0)), "(5+1)/(0+1)")
    assert(out("stable") == ((5L, 5L, 1.0)))
    assert(!out.contains("fading"), "df_new = 0 fails the min-df gate")
    // ranking: surging first
    val ranked = TextAnalysis.trendingTerms(docs(corpus: _*), topK = 10, minDfNew = 3L)
      .collect().map(_.getString(0))
    assert(ranked.head == "surging")
  }

  test("rankedRetrieval: one-query case agrees bitwise with bm25Scores (independent summation)") {
    // bm25Scores pivots per-term contributions into fixed-order columns;
    // rankedRetrieval folds a term-SORTED array — two different summation
    // implementations. With the query terms passed in sorted order the
    // addition order coincides, so scores must match to the last bit.
    val rnd = new scala.util.Random(21)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val corpus = (1L to 60L).map { i =>
      i -> Seq.fill(rnd.nextInt(25) + 3)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val d = docs(corpus: _*)
    val terms = Seq("alpha", "beta", "gamma") // sorted
    val viaPivot = TextAnalysis.bm25Scores(d, terms, topK = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(4))
    val viaFold = TextAnalysis.rankedRetrieval(d, Seq("q" -> terms), topK = 10).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(viaFold.toSeq == viaPivot.toSeq, "ranking and bitwise scores must agree")
  }

  test("rankedRetrieval: ranks are contiguous, scores non-increasing, partition-stable") {
    val corpus = Seq(
      1L -> "spark spark spark stream",
      2L -> "spark stream",
      3L -> "stream only here",
      4L -> "nothing relevant at all",
      5L -> "spark")
    val d = docs(corpus: _*)
    val qs = Seq("q_ss" -> Seq("spark", "stream"), "q_s" -> Seq("stream"))
    val out = TextAnalysis.rankedRetrieval(d, qs, topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    qs.foreach { case (q, _) =>
      val rows = out.filter(_._1 == q).sortBy(_._2)
      assert(rows.map(_._2).toSeq == (1L to rows.length).toSeq, s"$q ranks contiguous")
      assert(rows.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4 || (a._4 == b._4 && a._3 < b._3)
        case _ => true
      }, s"$q ordered by (score desc, id)")
    }
    // doc 4 matches nothing: absent everywhere
    assert(!out.exists(_._3 == 4L))
    val again = TextAnalysis.rankedRetrieval(d.repartition(11), qs, topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.sortBy(x => (x._1, x._2)).toSeq == again.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("winnow: equals the reference selection, including all-tie repetitive text") {
    val fixtures = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "aaaaaaaaaaaaaaaa", // every gram identical: ties in EVERY window
      3L -> "abcabcabcabcabcabc", // period-3 repetition: periodic ties
      4L -> "Mixed   CASE\nand\twhitespace  runs here",
      5L -> "tiny") // shorter than k: no grams at all
    val got = TextAnalysis.winnow(docs(fixtures: _*)).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    fixtures.foreach { case (id, text) =>
      val want = referenceWinnow(text)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
  }

  test("winnow: shared substrings of length >= w+k-1 share a fingerprint; windows are covered") {
    val shared = "winnowing guarantee x" // 21 chars >= 4+5-1
    val a = s"prefix one $shared and then a suffix"
    val b = s"a completely different start $shared trailing text"
    val got = TextAnalysis.winnow(docs(1L -> a, 2L -> b)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fpsA = got.filter(_._1 == 1L).map(_._3).toSet
    val fpsB = got.filter(_._1 == 2L).map(_._3).toSet
    assert((fpsA & fpsB).nonEmpty, "the >= w+k-1 shared run must surface a common fingerprint")
    // cover property: every full window of w consecutive gram positions
    // contains at least one selected position
    val posA = got.filter(_._1 == 1L).map(_._2).toSet
    val npA = a.length - 5 + 1
    (1 to (npA - 3)).foreach { ws =>
      assert((ws until ws + 4).exists(p => posA.contains(p.toLong)), s"window at $ws uncovered")
    }
  }

  test("pmiCollocations: equals a brute-force driver reference; floors and ties hold") {
    val d = docs(
      1L -> "alpha beta alpha beta alpha beta alpha beta alpha beta",
      2L -> "gamma delta gamma delta gamma delta gamma delta gamma delta",
      3L -> "alpha delta beta gamma alpha delta beta gamma alpha delta")
    val got = TextAnalysis.pmiCollocations(d, topK = 10, minCount = 4L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(5))).toSeq
    // brute force
    val texts = Seq(
      "alpha beta alpha beta alpha beta alpha beta alpha beta",
      "gamma delta gamma delta gamma delta gamma delta gamma delta",
      "alpha delta beta gamma alpha delta beta gamma alpha delta")
    val toks = texts.map(_.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val n = toks.map(_.size).sum.toLong
    val bis = toks.flatMap(w => w.zip(w.tail))
    val nb = bis.size.toLong
    val bic = bis.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val want = bic.toSeq.filter(_._2 >= 4L).map { case ((a, b), c2) =>
      (a, b, c2, (c2.toDouble * n.toDouble * n.toDouble) /
        (nb.toDouble * uni(a).toDouble * uni(b).toDouble))
    }.sortBy { case (a, b, _, r) => (-r, a, b) }.take(10)
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty && got.forall(_._3 >= 4L))
  }

  test("rrfFusion: rank arithmetic is exact; the length prior can overturn a BM25 margin") {
    import spark.implicits._
    // d1 and d2 both match 'needle' once; d2 is much longer, so BM25's
    // length normalization ranks d1 FIRST — but the length prior ranks d2
    // first, and with equal bm25-vs-prior weights the fused order flips
    // nothing at rank 1... unless the prior margin dominates the tie.
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"needle one two"),
      (2L, s"needle $filler")
    ).toDF("doc_id", "text")
    val q = Seq("q1" -> Seq("needle"))
    val got = TextAnalysis.rrfFusion(docs, q, topK = 10, poolK = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .sortBy(_._1)
    // BM25: d1 (short) beats d2 (long); prior: d2 (41 tokens) beats d1 (3)
    val Seq(first, second) = got.toSeq
    assert(got.map(t => (t._2, t._3, t._4)).toSet ==
      Set((1L, 1L, 2L), (2L, 2L, 1L)), s"component ranks: $got")
    // both fuse to 1/61 + 1/62 — the exact tie breaks by doc_id
    val tied = 1.0 / 61.0 + 1.0 / 62.0
    assert(first._5 == tied && second._5 == tied)
    assert(first._2 == 1L, "doc_id tie-break puts doc 1 first")
  }

  test("rrfFusion equals the window reference over the ranked-retrieval pool on sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val queries = Seq("qa" -> Seq("table", "scan"), "qb" -> Seq("fast", "key", "merge"))
    val got = TextAnalysis.rrfFusion(docs, queries, topK = 5, poolK = 15)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val pool = TextAnalysis.rankedRetrieval(docs, queries, topK = 15)
      .withColumnRenamed("rank", "bm25_rank")
    val dl = docs.select(col("doc_id"),
      size(array_remove(graft.functions.TextFunctions.tokens(col("text")), "")).cast("long").as("dl"))
    val wP = Window.partitionBy("query_id").orderBy(col("dl").desc, col("doc_id"))
    val ref = pool.join(dl, "doc_id")
      .withColumn("prior_rank", row_number().over(wP).cast("long"))
      .withColumn("rrf", lit(1.0) / (lit(60.0) + col("bm25_rank").cast("double"))
        + lit(1.0) / (lit(60.0) + col("prior_rank").cast("double")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getString(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("rank")), r.getLong(r.fieldIndex("doc_id")))).sorted.toSeq
    assert(got == ref)
  }

  test("soundex: the NARA truth table including h/w transparency and head suppression") {
    val want = Map(
      "robert" -> "r163", "rupert" -> "r163",       // classic collision pair
      "ashcraft" -> "a261", "ashcroft" -> "a261",   // s-h-c: h transparent, codes collapse
      "tymczak" -> "t522",                           // y resets; c,z collapse
      "pfister" -> "p236",                           // head p suppresses f (same code)
      "honeyman" -> "h555", "jackson" -> "j250",
      "ww" -> "w000", "aeiou" -> "a000")
    want.foreach { case (w, s) =>
      assert(TextAnalysis.soundexWord(w) == s, s"soundex($w)")
    }
    assert(TextAnalysis.soundexWord("") == null && TextAnalysis.soundexWord(null) == null)
    // non-coding characters are transparent, never coded
    assert(TextAnalysis.soundexWord("o'brien") == TextAnalysis.soundexWord("obrien"))
  }

  test("soundexKeys: vocabulary roll-up carries frequencies; phonetic buckets group typos") {
    import spark.implicits._
    val d = Seq((1L, "robert rupert robert"), (2L, "smith smyth")).toDF("doc_id", "text")
    val got = TextAnalysis.soundexKeys(d).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got("robert") == ("r163", 2L) && got("rupert") == ("r163", 1L))
    assert(got("smith")._1 == got("smyth")._1, "phonetic bucket must unite the spellings")
  }
}
