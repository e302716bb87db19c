package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for training-data curation (north star, SURVEY
  * §7.6): quality scoring, language ID, token counting, fingerprinting. Pure
  * column expressions — whole-stage codegen, no UDFs, linear single-pass.
  */
object TextAnalysis {

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

  /** Per-document quality features: lengths + character-class and lexical ratios. */
  def quality(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("toks", tokens(t))
      .select(
        col(idCol),
        length(t).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        charClassRatio(t, "a-zA-Z").as("alpha_ratio"),
        charClassRatio(t, ".,;:!?").as("punct_ratio"),
        stopwordRatio(col("toks"), defaultStopwords).as("stopword_ratio"),
        distinctRatio(col("toks")).as("distinct_ratio"))
  }

  /** Marker-lexicon language ID: per-language marker-token counts + argmax
    * (ties broken in lexicon order en > de > fr > es).
    */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = docs
      .withColumn("toks", tokens(col(textCol)))
      .select(
        col(idCol) +: langMarkers.map { case (lang, markers) =>
          markerScore(col("toks"), markers).as(s"score_$lang")
        }: _*)
    val langs = langMarkers.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) { case ((lang, i), rest) =>
      val beatsAllLater = langs.drop(i + 1).map(l2 => col(s"score_$lang") >= col(s"score_$l2")).reduce(_ && _)
      when(beatsAllLater, lang).otherwise(rest)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** Whitespace token count + BPE-ish subword count (alpha runs / digit runs
    * / single symbols).
    */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      size(tokens(col(textCol))).cast("long").as("ws_tokens"),
      bpeishTokenCount(col(textCol)).as("bpe_tokens"))

  /** Corpus vocabulary: the `topK` most frequent whitespace tokens of the
    * normalized text, ties broken lexicographically (total order -> the
    * LIMIT boundary is deterministic and oracle-checkable). Plan shape:
    * explode -> partial-aggregated count -> `TakeOrderedAndProject` — the
    * only full shuffle carries one row per distinct token, and the top-k is
    * a per-partition heap + driver merge, never a global sort.
    */
  def vocabulary(docs: DataFrame, topK: Int = 100, textCol: String = "text"): DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(topK)

  /** Heavy-hitters vocabulary via a Misra-Gries sketch + exact recount —
    * the bounded-memory scale path for [[vocabulary]]: the exact form's
    * count shuffle carries EVERY distinct term (a web-scale vocabulary is
    * itself corpus-sized), while the sketch reduces each partition to at
    * most `sketchK` (term, count) entries before its one tiny shuffle,
    * then exactly recounts ONLY the surviving candidates (a semi-join
    * prune, so the recount exchange carries O(sketchK) terms too).
    *
    * Exactness contract ([[graft.functions.MisraGriesAggregator]]'s
    * guarantee): the result EQUALS the exact top-`topK` whenever the true
    * `topK`-th frequency exceeds n_tokens / (sketchK + 1) — size `sketchK`
    * to the corpus skew, exactly like `nlist` sizes the IVF quantizer.
    * Below that threshold the tail of the list may differ (candidates are
    * encounter-order-dependent in the slack band); the recount makes every
    * REPORTED frequency exact in all regimes.
    */
  def approxVocabulary(
      docs: DataFrame,
      topK: Int = 100,
      sketchK: Int = 256,
      textCol: String = "text"): DataFrame = {
    require(topK >= 1 && sketchK >= topK, "need sketchK >= topK >= 1")
    val toks = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val mg = udaf(new graft.functions.MisraGriesAggregator(sketchK),
      org.apache.spark.sql.Encoders.STRING)
    val candidates = toks.agg(mg(col("token")).as("sketch"))
      .select(explode(map_keys(col("sketch"))).as("token"))
    toks.join(broadcast(candidates), Seq("token"), "left_semi")
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(topK)
  }

  /** Content fingerprints: MD5 of normalized text plus a polynomial rolling
    * hash (base-31 over code points, mod 1e9+7 — a native codegen'd
    * [[graft.functions.TextExpressions.RollingHash]] expression; the
    * previous `aggregate(split(text, ""), ...)` form evaluated an
    * interpreted lambda once per character). The modulus keeps the
    * accumulator well inside int64 so the hash is engine-portable
    * (unchecked int64 wraparound is engine-specific).
    */
  val rollingHashMod = 1000000007L

  /** Per-document TF-IDF top terms. IDF uses the rational Robertson form
    * `(N - df + 0.5) / (df + 0.5)` rather than its logarithm: the ranking is
    * identical (log is monotone) and every input is an exact integer or
    * half-integer, so the score is one correctly-rounded IEEE division and
    * multiplication away from exact — bit-identical across engines, where a
    * libm `ln` is not.
    *
    * Plan shape: explode -> two hash aggregations (tf, df) -> broadcast df
    * back -> per-doc window rank. The window partitions on the doc id, so
    * the sort is per-document (bounded by tokens-per-doc) — no global sort,
    * no skew beyond document length.
    */
  def tfIdfTopTerms(
      docs: DataFrame,
      topK: Int = 5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val idf = (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val w = Window.partitionBy("id").orderBy(col("tfidf").desc, col("token"))
    tf.join(df, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * idf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("id").as(idCol), col("token"), col("tf"), col("df"), col("tfidf"), col("rank"))
  }

  /** BM25 document scores for a fixed bag of query terms, top `topK` docs.
    *
    * Same rational IDF as [[tfIdfTopTerms]] (no `ln` — see there). The
    * per-term contributions are aggregated as one conditional column per
    * term and added in a FIXED order: each conditional aggregate sees at
    * most one row per doc (tf is unique per (doc, term)), so the double
    * summation order is deterministic under any partitioning — the property
    * a bare `sum(contrib)` over a shuffled relation does not have.
    *
    * Plan shape: tf aggregation over query terms only (the filter prunes the
    * exploded relation before the shuffle), broadcast term df + corpus
    * stats, one per-doc aggregation, `TakeOrderedAndProject` for the top-k.
    */
  def bm25Scores(
      docs: DataFrame,
      terms: Seq[String],
      topK: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms.distinct == terms, "duplicate query terms would create ambiguous columns")
    require(terms.forall(t => !t.contains("`")), "backticks in query terms are not supported")
    // doc length per-row (array_remove drops the empty-string token of
    // blank docs) — no explode, no shuffle; the exploded relation is built
    // once, already filtered to the query terms, so the only corpus-wide
    // shuffle carries O(|terms|) rows per doc
    val dl = docs.select(
      col(idCol).as("id"),
      size(array_remove(tokens(col(textCol)), "")).cast("long").as("dl"))
    val tf = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .filter(col("token").isInCollection(terms))
      .groupBy("id", "token")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(sum(col("dl")).as("sum_dl")))
      .select(col("n"), (col("sum_dl").cast("double") / col("n")).as("avgdl"))
    val idf = (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val denom = col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) / denom
    val scored = tf
      .join(broadcast(df), "token")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", contrib)
    // backticked access: a term containing '.' (a legal whitespace token,
    // e.g. "3.5") would otherwise parse as a struct-field path in col()
    val termCols = terms.map(t => max(when(col("token") === t, col("contrib"))).as(s"c_$t"))
    val score = terms.map(t => coalesce(col(s"`c_$t`"), lit(0.0))).reduce(_ + _)
    scored
      .groupBy("id")
      .agg(termCols.head, termCols.tail: _*)
      .withColumn("score", score)
      .select(col("id").as(idCol) +: terms.map(t => col(s"`c_$t`")) :+ col("score"): _*)
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Multi-query BM25 ranked retrieval: top-`topK` documents per query,
    * completing the search surface next to [[bm25Scores]] (one fixed bag)
    * and [[InvertedIndex.conjunctive]] (boolean AND).
    *
    * Scores use the same rational-IDF BM25 as [[bm25Scores]]; per
    * (query, doc) the term contributions are summed by a TERM-ORDERED
    * fold (`aggregate(array_sort(...))` — the quality_logit pattern), so
    * the double addition order is partition-independent and the oracle
    * replays it with an ORDER BY fold. Ranking is the bounded
    * [[graft.functions.TopKAggregator]] — partial top-k on the map side,
    * O(k) rows per (query, partition) shuffled, never a corpus-wide rank
    * window. One corpus pass builds tf for the union of all query terms;
    * query→term mapping and df broadcast.
    */
  def rankedRetrieval(
      docs: DataFrame,
      queries: Seq[(String, Seq[String])],
      topK: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty), "queries must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = queries.flatMap(_._2).distinct
    val dl = docs.select(
      col(idCol).as("id"),
      size(array_remove(tokens(col(textCol)), "")).cast("long").as("dl"))
    val tf = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .filter(col("token").isInCollection(terms))
      .groupBy("id", "token")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(sum(col("dl")).as("sum_dl")))
      .select(col("n"), (col("sum_dl").cast("double") / col("n")).as("avgdl"))
    val idf = (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val denom = col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) / denom
    val qdf = queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
      .toDF("query_id", "token")
    val perQueryDoc = tf
      .join(broadcast(df), "token")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", contrib)
      .join(broadcast(qdf), "token")
      .groupBy(col("query_id"), col("id"))
      .agg(expr(
        "aggregate(array_sort(collect_list(struct(token, contrib))), cast(0.0 AS DOUBLE), (a, x) -> a + x.contrib)")
        .as("score"))
    val topk = udaf(new graft.functions.TopKAggregator(topK),
      org.apache.spark.sql.Encoders.product[graft.functions.ScoredId])
    perQueryDoc
      .groupBy("query_id")
      .agg(topk(col("id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("s.id").as(idCol),
        col("s.score").as("score"))
  }

  /** Reciprocal-rank fusion of BM25 relevance with a document-quality
    * prior — the standard hybrid-retrieval combiner (Cormack et al.,
    * SIGIR'09): for each query, the BM25 top-`poolK` CANDIDATE POOL is
    * re-ranked by `1/(kRrf + bm25_rank) + 1/(kRrf + prior_rank)`, where
    * `prior_rank` orders the pool by document token length (the crude
    * deterministic quality prior; swap in any per-doc score). Fusing
    * ranks instead of scores needs no calibration between the two
    * signals — the property that made RRF the default fusion baseline.
    *
    * Scale shape: everything after [[rankedRetrieval]] operates on the
    * POOL — |queries|·poolK rows — so both rank windows and the final
    * top-`topK` cut are bounded per query, never corpus-wide; the one
    * join attaches the doc-length prior to pool rows (AQE broadcasts the
    * pool side). Rank inputs are exact integers; the fused score is a
    * fixed two-division IEEE tree — bitwise portable.
    *
    * Output: (query_id, rank, doc_id, bm25_rank, prior_rank, rrf).
    */
  def rrfFusion(
      docs: DataFrame,
      queries: Seq[(String, Seq[String])],
      topK: Int = 10,
      poolK: Int = 20,
      kRrf: Int = 60,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val pool = rankedRetrieval(docs, queries, topK = poolK, idCol = idCol, textCol = textCol)
      .withColumnRenamed("rank", "bm25_rank")
    val dl = docs.select(col(idCol),
      size(array_remove(tokens(col(textCol)), "")).cast("long").as("__dl"))
    val wPrior = Window.partitionBy("query_id").orderBy(col("__dl").desc, col(idCol))
    val wFinal = Window.partitionBy("query_id").orderBy(col("rrf").desc, col(idCol))
    pool.join(dl, idCol)
      .withColumn("prior_rank", row_number().over(wPrior).cast("long"))
      .withColumn("rrf",
        lit(1.0) / (lit(kRrf.toDouble) + col("bm25_rank").cast("double")) +
          lit(1.0) / (lit(kRrf.toDouble) + col("prior_rank").cast("double")))
      .withColumn("rank", row_number().over(wFinal).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col(idCol),
        col("bm25_rank"), col("prior_rank"), col("rrf"))
  }

  /** Top-k adjacent-bigram collocations by pointwise mutual information —
    * the phrase-mining signal ("new york" is a unit, "the cat" is not) a
    * tokenizer-vocabulary or stop-phrase pipeline starts from. PMI is
    * emitted as the exact-count RATIO
    *
    *   p(a,b) / (p(a)·p(b)) = (c_ab · N²) / (N_b · c_a · c_b)
    *
    * — rational over exact BIGINT counts in one fixed IEEE tree, never a
    * `log` (the [[trendingTerms]] convention: log is monotone, so
    * ranking by the ratio IS ranking by PMI, and no transcendental
    * function has to agree bitwise across engines). `minCount` floors
    * the bigram count — the standard guard against the PMI
    * rare-pair explosion (a hapax bigram of two hapax words scores N).
    *
    * Scale shape: one token pass feeds the bigram and unigram hash
    * aggregates (map-side combined); two broadcast-friendly count joins;
    * the top-k is `orderBy(...).limit(k)` — TakeOrderedAndProject, a
    * per-partition heap + driver merge, never a global sort.
    */
  def pmiCollocations(
      docs: DataFrame,
      topK: Int = 20,
      minCount: Long = 5L,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), array_remove(tokens(col(textCol)), "").as("w"))
    val uni = toks.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val nTok = toks.select(explode(col("w")).as("t")).agg(count(lit(1)).as("n"))
    val bi = toks
      .filter(size(col("w")) >= 2)
      .select(posexplode(col("w")).as(Seq("p", "w1")), col("w"))
      .filter(col("p") < size(col("w")) - 1)
      .select(col("w1"), expr("w[p + 1]").as("w2"))
    val biCnt = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val nBi = bi.agg(count(lit(1)).as("nb"))
    val ratio = (col("c2").cast("double") * col("n").cast("double") * col("n").cast("double")) /
      (col("nb").cast("double") * col("ca").cast("double") * col("cb").cast("double"))
    biCnt
      .filter(col("c2") >= minCount)
      .join(uni.select(col("t").as("w1"), col("c").as("ca")), "w1")
      .join(uni.select(col("t").as("w2"), col("c").as("cb")), "w2")
      .crossJoin(nTok).crossJoin(nBi)
      .select(col("w1"), col("w2"), col("c2"), col("ca"), col("cb"), ratio.as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Trending terms between two corpus snapshots: document frequency in
    * the "old" half vs the "new" half (split deterministically on the
    * id), scored by the add-one growth ratio `(df_new + 1)/(df_old + 1)`
    * — rational over exact counts, so bitwise portable (no log). The
    * monitoring question a corpus pipeline asks between crawls: which
    * vocabulary is surging. Top-k by (growth desc, term asc) — a
    * bounded TakeOrderedAndProject, never a rank window. `minDfNew`
    * suppresses noise terms that only just appeared.
    */
  def trendingTerms(docs: DataFrame, topK: Int = 20, minDfNew: Long = 3L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pairs = docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0 && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        explode(split(normText(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .select(col("id"), col("term"), (col("id") % 2 === 1).as("is_new"))
      .distinct()
    pairs
      .groupBy("term")
      .agg(
        sum(when(col("is_new"), 0L).otherwise(1L)).as("df_old"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("df_new"))
      .filter(col("df_new") >= minDfNew)
      .withColumn("growth",
        (col("df_new").cast("double") + lit(1.0)) / (col("df_old").cast("double") + lit(1.0)))
      .orderBy(col("growth").desc, col("term"))
      .limit(topK)
      .select(col("term"), col("df_old"), col("df_new"), col("growth"))
  }

  /** Intra-document repetition: how much of the doc is repeated word
    * n-grams. `dup_ratio = (n_grams - n_distinct) / n_grams` — the
    * boilerplate/template signal used to down-weight or drop repetitive
    * docs.
    *
    * Both counts are PER-DOC facts, so the whole operator is one compiled
    * per-doc pass (round 17, optimization guide §2.4/§4): normalization
    * stays a codegen'd Column (the [[graft.ext.Coverage]] convention —
    * engine semantics for lower/trim/regexp stay Spark's), and a typed
    * map counts grams and distinct grams through one HashSet. The
    * previous explode + two-phase countDistinct + join-back shape paid
    * two aggregate exchanges and a join for what one linear scan
    * computes; the round-robin staging exchange spreads the kernel off
    * the single scan split (§2.5 input-skew shape at the small end, a
    * no-op at cluster scale where the scan has many splits).
    */
  def repetitionRatio(
      docs: DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    Stage.spread(docs.select(col(idCol).cast("long").as("id"), normText(col(textCol)).as("__t")))
      .as[(java.lang.Long, String)]
      .map { case (id, t) =>
        // split(" ", -1) mirrors Spark's split(): trailing empties kept,
        // empty text -> [""] (n_grams 0 for any n >= 2 either way)
        val w = if (t == null) null else t.split(" ", -1)
        val nGrams = if (w == null) 0 else math.max(w.length - (n - 1), 0)
        if (nGrams == 0) (id, 0L, 0L, 0.0)
        else {
          val seen = new java.util.HashSet[String]()
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i < nGrams) {
            sb.setLength(0)
            var k = 0
            while (k < n) {
              if (k > 0) sb.append(' ')
              sb.append(w(i + k))
              k += 1
            }
            seen.add(sb.toString)
            i += 1
          }
          val d = seen.size.toLong
          (id, nGrams.toLong, d, (nGrams - d).toDouble / nGrams)
        }
      }
      .toDF(idCol, "n_grams", "n_distinct_grams", "dup_ratio")
  }

  /** Corpus-trained bigram language-model fluency score — the KenLM-style
    * quality signal that flags wordsalad/garbled docs (improbable token
    * transitions score low) and boilerplate (high): for each document,
    * the mean transition probability over its bigram positions,
    *
    *   lm_score = (1 / n_bigrams) * SUM_i  C(w_{i-1}, w_i) / C*(w_{i-1})
    *
    * where `C` counts bigram instances corpus-wide and `C*(w)` counts
    * instances of `w` as a bigram PREFIX (so the conditional distribution
    * sums to 1 per prefix). The corpus scores itself, so every scored
    * bigram has C >= 1 and no smoothing is needed — held-out scoring would
    * need an explicit backoff, deliberately out of scope.
    *
    * Deliberately NO logarithm: a mean of per-position probabilities ranks
    * fluency the same way a mean log-prob does for filtering purposes, and
    * every step stays one correctly-rounded IEEE operation on exact
    * integer counts — summed in POSITION order through an ordered fold —
    * so an external engine replays the score bitwise ([[tfIdfTopTerms]]'
    * no-`ln` argument). Docs with fewer than 2 tokens have no transitions:
    * n_bigrams = 0, lm_score = 0.0.
    *
    * Scale shape: ONE corpus-wide count aggregation (bigrams); the prefix
    * totals then aggregate the vocabulary-sized bigram-count relation, not
    * the corpus (`C*(w) = SUM_g C(w, g)` by definition), so the corpus
    * pays a single count shuffle. Both count relations join back against
    * the corpus-sized bigram relation (vocabulary build side, corpus probe
    * side — stopword-heavy prefixes skew the probe, which AQE skew-join
    * splits), then one per-doc regroup whose ordered fold runs over each
    * doc's own bigrams only.
    */
  def bigramLmScore(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bi = Stage.spread(docs.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), tokens(col("__text")).as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col("id"), posexplode(wordNgrams(col("__w"), 2)).as(Seq("pos", "g")))
      .withColumn("w1", substring_index(col("g"), " ", 1))
    val c2 = bi.groupBy("g").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(substring_index(col("g"), " ", 1).as("__p")).agg(sum(col("c2")).as("c1"))
    val scored = bi
      .join(c2, "g")
      .join(c1, col("w1") === col("__p"))
      .select(col("id"), col("pos"), (col("c2").cast("double") / col("c1")).as("p"))
    val agg = scored
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(
          transform(sort_array(collect_list(struct(col("pos"), col("p")))), x => x.getField("p")),
          lit(0.0), (acc, x) => acc + x).as("__s"))
    docs.select(col(idCol).as("id"))
      .join(agg, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("__s") / col("n_bigrams"), lit(0.0)).as("lm_score"))
  }

  /** Linear bag-of-words document scorer — the classifier-filter step of a
    * curation pipeline (fastText/CCNet-style quality or domain classifiers
    * reduce to exactly this at inference time): per document,
    * `logit = bias + sum over matched terms of tf(term) * weight(term)`.
    * The weight table is a (term, weight) DataFrame — one row per term,
    * trained elsewhere — broadcast so scoring is a map-side join; terms
    * not in the table contribute nothing. The raw logit is emitted (not a
    * sigmoid): it is monotone in the probability, thresholds translate
    * directly, and it avoids pinning `exp` across engines.
    *
    * Output: one row per non-null-id doc — `idCol`, `n_matched` (distinct
    * vocabulary terms hit), `logit` (= `bias` for docs matching nothing,
    * including null-text docs).
    *
    * Determinism: the per-doc contribution sum folds in TERM order
    * (`sort_array(collect_list(struct(term, c)))` — terms are distinct per
    * doc after the tf aggregate), so the double sum is order-free under
    * any partitioning and externally replayable; the list is bounded by
    * |weights|, the broadcast bound itself.
    */
  def linearTextScore(
      docs: DataFrame,
      weights: DataFrame,
      bias: Double = 0.0,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tf = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .groupBy("id", "t")
      .agg(count(lit(1)).as("tf"))
    val contrib = tf
      .join(broadcast(weights.select(col("term").as("t"), col("weight"))), Seq("t"))
      .select(col("id"), col("t"), (col("tf") * col("weight")).as("c"))
    val agg = contrib
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_matched"),
        aggregate(
          transform(sort_array(collect_list(struct(col("t"), col("c")))), x => x.getField("c")),
          lit(0.0), (a, x) => a + x).as("__s"))
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"))
      .join(agg, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (lit(bias) + coalesce(col("__s"), lit(0.0))).as("logit"))
  }

  /** PII scrubbing: replace emails, NANP-style phone numbers, and IPv4
    * addresses with typed placeholder tags, and count what was scrubbed.
    * Patterns are RE2-compatible (no lookaround, no backreferences) so the
    * same regex runs on Spark (Java regex) and any RE2 engine bit-identically
    * on these character classes. Scrub order: emails first (their domains
    * would otherwise be partially eaten by the IP pattern on numeric hosts).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def piiScrub(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"),
        ipv4Re, "<IP>")
    docs.select(
      col(idCol),
      regexp_count(t, lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(regexp_replace(t, emailRe, "<EMAIL>"), lit(phoneRe)).cast("long").as("n_phones"),
      regexp_count(
        regexp_replace(regexp_replace(t, emailRe, "<EMAIL>"), phoneRe, "<PHONE>"),
        lit(ipv4Re)).cast("long").as("n_ips"),
      scrubbed.as("scrubbed"))
  }

  /** Overlapping token-window chunking — long documents split into
    * context-window-sized pieces for embedding/training, each chunk
    * overlapping the previous by `overlapTokens` so no span of
    * `chunkTokens - overlapTokens` consecutive tokens straddles a boundary
    * unseen.
    *
    * Chunk starts step by `stride = chunkTokens - overlapTokens` while
    * `start <= n - overlapTokens - 1`, which guarantees (a) every token is
    * covered, (b) every chunk past the first contributes at least one new
    * token (no degenerate all-overlap tail chunk), (c) docs with at most
    * `chunkTokens` tokens yield exactly one chunk. Empty docs yield none.
    *
    * One generator expression per row (`explode(sequence(...))`) — the
    * per-chunk `slice`/`array_join` are ordinary codegen'd expressions, so
    * the operator stays in whole-stage codegen; at 100 TB chunking is a
    * map-only pass with no shuffle.
    */
  def chunkDocs(
      docs: DataFrame,
      chunkTokens: Int = 64,
      overlapTokens: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be >= 1")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlapTokens must be in [0, chunkTokens)")
    val stride = chunkTokens - overlapTokens
    // blank text normalizes to a single empty token (split never returns an
    // empty array), so "at least one REAL token" is the emptiness test
    docs
      .select(col(idCol), tokens(col(textCol)).as("__w"))
      .filter(not(size(col("__w")) === 1 && element_at(col("__w"), 1) === ""))
      .select(col(idCol),
        posexplode(sequence(lit(0), greatest(size(col("__w")) - overlapTokens - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_id", "__start")),
        col("__w"))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("__w"), col("__start") + lit(1), lit(chunkTokens)), " ").as("chunk_text"),
        least(size(col("__w")) - col("__start"), lit(chunkTokens)).as("n_chunk_tokens"))
  }

  def fingerprints(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.functions.TextExpressions.RollingHash
    val rolling = ColumnBridge.column(
      RollingHash(ColumnBridge.expression(normText(col(textCol))), 31L, rollingHashMod))
    docs.select(
      col(idCol),
      fingerprint(col(textCol)).as("fingerprint"),
      rolling.as("rolling_hash"))
  }

  /** Winnowing fingerprint selection (the Schleimer–Wilkerson–Aiken /
    * MOSS local-sampling scheme): hash every character k-gram of the
    * normalized text, then in each sliding window of `w` consecutive
    * k-grams keep the MINIMAL hash, ties broken by the RIGHTMOST
    * position. The selection guarantee: any substring match of length
    * ≥ w + k − 1 between two documents shares at least one selected
    * fingerprint, at an expected density of 2/(w+1) — the
    * position-robust sketch that whole-document [[fingerprints]] and
    * fixed-stride shingles are not (an insertion shifts every
    * downstream gram, but winnowing re-selects the same local minima).
    *
    * The k-gram hash is the low 40 bits of md5 (hex prefix) — portable,
    * so the DuckDB oracle replays the whole selection. The per-window
    * argmin-with-rightmost-tie needs no w-way join or nested window:
    * hash and position pack into one orderable BIGINT
    * `(2^40 − h) · 2^20 + pos` (pos < 2^20 enforced by construction,
    * max value 2^60 — no overflow), so a single max per window start
    * selects the winnowed gram.
    *
    * 100 TB shape (round 17, optimization guide §1.2/§2.4): ONE per-doc
    * pass. The selection is local to a document, so the old shape —
    * explode one row per character k-gram (L − k + 1 rows per doc),
    * md5 each through four chained expressions, exchange + sort the
    * gram rows for a doc-partitioned frame max, then a distinct
    * exchange — paid two shuffles and a per-gram expression chain for
    * what a single flatMap computes in-place. This pass hashes each
    * gram once (one MessageDigest per row, zero per-gram string
    * allocation: grams are (offset, length) slices of the doc's UTF-8
    * bytes), takes the window max over a primitive array, and dedups
    * per doc in a local hash set (the old global distinct was per-doc
    * by construction: doc_id is in every key). Zero shuffles of gram
    * rows at any scale; the one exchange below is the staging
    * round-robin of the NARROW (doc_id, normalized-text) rows that
    * decouples kernel parallelism from the scan's split count (the
    * bench corpus is one parquet row group = one split; the same
    * convention as the expensive per-doc fixture writers, PlanShapeSpec
    * "staging exchange" family). Measured at sf0.1/local[32]:
    * winnow_fingerprints 3.47s → see OPTIMIZATION_r17.md (plan:
    * 2 Exchange + Window + explode → 1 round-robin Exchange, map-only).
    *
    * Bitwise-identical outputs to the expression form: Spark `length`/
    * `substring` slice by code point, so grams are built over code-point
    * offsets into the UTF-8 bytes; `md5(CAST(substring(...) AS BINARY))`
    * is MD5 over exactly those bytes; the hex-prefix low-40-bits equal
    * the first 5 digest bytes big-endian.
    *
    * Documents with fewer than `w` k-grams produce no fingerprints
    * (no full window exists — the standard guarantee threshold).
    */
  def winnow(docs: DataFrame, k: Int = 5, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1 && w >= 1, "k-gram size and window size must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val maxPos = 1048576L // 2^20: keeps (2^40)·2^20 = 2^60 inside BIGINT
    val base = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"), normText(col(textCol)).as("t"))
      // np = number of k-grams; docs past the 2^20-gram packing domain are
      // excluded rather than mis-packed (chunk upstream for longer payloads)
      .filter(length(col("t")) >= k && (length(col("t")) - (k - 1)).cast("long") < maxPos)
      .repartition(spark.sparkContext.defaultParallelism)
    base.as[(Long, String)].flatMap { case (docId, t) =>
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // code-point start offsets: Spark substring/length slice by code
      // point, and a code point starts at every non-continuation byte
      val nCp = t.codePointCount(0, t.length)
      val offs = new Array[Int](nCp + 1)
      var ci = 0
      var bi = 0
      while (bi < bytes.length) {
        if ((bytes(bi) & 0xc0) != 0x80) { offs(ci) = bi; ci += 1 }
        bi += 1
      }
      offs(nCp) = bytes.length
      val np = nCp - (k - 1)
      val md = java.security.MessageDigest.getInstance("MD5")
      val vs = new Array[Long](math.max(np, 0))
      var i = 0
      while (i < np) {
        md.update(bytes, offs(i), offs(i + k) - offs(i))
        val dg = md.digest() // digest() resets the instance for reuse
        var h = 0L
        var j = 0
        while (j < 5) { h = (h << 8) | (dg(j) & 0xffL); j += 1 }
        vs(i) = (1099511627776L - h) * maxPos + (i + 1).toLong
        i += 1
      }
      // frame max per window start; ties impossible (pos is in the pack),
      // and max picks the smallest hash / rightmost position by design
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val seen = new java.util.HashSet[java.lang.Long]()
      var s0 = 0
      while (s0 + w <= np) {
        var mv = vs(s0)
        var j = s0 + 1
        while (j < s0 + w) { if (vs(j) > mv) mv = vs(j); j += 1 }
        if (seen.add(mv)) out += ((docId, mv % maxPos, 1099511627776L - mv / maxPos))
        s0 += 1
      }
      out
    }.toDF("doc_id", "pos", "fp")
  }

  /** NARA Soundex of one lowercase word — the phonetic blocking key for
    * entity resolution (Russell 1918; the NARA standard variant): first
    * letter + three digits from coded consonants, where `h`/`w` are
    * TRANSPARENT for adjacency (same-code consonants separated only by
    * them still collapse — "ashcraft" → a261, the case naive
    * implementations miss), vowels reset adjacency, and the first
    * letter's own code suppresses an immediately following duplicate
    * ("pfister" → p236). Characters outside the coding map (digits,
    * punctuation, non-ASCII) are treated as non-coding, the NARA
    * treatment of non-letters. Null/empty input → null.
    */
  def soundexWord(word: String): String = {
    if (word == null || word.isEmpty) return null
    def code(c: Char): Char = c match {
      case 'b' | 'f' | 'p' | 'v' => '1'
      case 'c' | 'g' | 'j' | 'k' | 'q' | 's' | 'x' | 'z' => '2'
      case 'd' | 't' => '3'
      case 'l' => '4'
      case 'm' | 'n' => '5'
      case 'r' => '6'
      case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => '0'
      case _ => '-'
    }
    var last = code(word.charAt(0))
    val sb = new StringBuilder
    var i = 1
    while (i < word.length) {
      val k = code(word.charAt(i))
      if (k != '-') {
        if (k == '0') last = '0'
        else if (k != last) { sb.append(k); last = k }
      }
      i += 1
    }
    word.substring(0, 1) + (sb.toString + "000").substring(0, 3)
  }

  /** Per-token Soundex keys over the corpus vocabulary:
    * (token, sdx, freq) — the phonetic-bucket table an ER pass blocks
    * on. One token aggregate (the [[vocabulary]] shuffle) + a map-only
    * encode of the distinct tokens.
    */
  def soundexKeys(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (t, f) => (t, soundexWord(t), f) }
      .toDF("token", "sdx", "freq")
  }
}
