package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Similarity}

/** Plan-shape regression tests: the scale properties this engine claims are
  * verified on the PHYSICAL PLAN, not taken on faith — a refactor that
  * silently turns an equi-join into a cartesian or re-introduces a window
  * shuffle in top-k must fail here.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def assertNoCartesian(p: String): Unit = {
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop join in plan")
  }

  test("LSH self-joins stay equi-joins (no cartesian blowup)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Seq(
      Dedup.minhashLshPairs(docs),
      Dedup.simhashPairs(docs),
      Dedup.ngramJaccardPairs(docs),
      Dedup.minhashLshVerifiedPairs(docs)).foreach(df => assertNoCartesian(plan(df)))
  }

  test("ngramJaccardPairs: one scan, two exchanges, zero joins") {
    // round-7 shape: within-doc gram dedup is map-side, sizes ride the
    // exploded rows, df capping reuses the single g-exchange — a join or a
    // second scan here means the broadcast-the-whole-gram-set semi-join
    // (a 100 TB driver hazard) crept back
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(Dedup.ngramJaccardPairs(docs))
    assert(!p.contains("Join"), s"join crept back into ngramJaccardPairs:\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 1, "corpus must be scanned exactly once")
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2,
      s"expected the g-window exchange + the intersect exchange only:\n$p")
  }

  test("srpCosinePairs: one native band-key expression, equi-joins only") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(Similarity.srpCosinePairs(emb))
    assertNoCartesian(p)
    assert(p.contains("srp_band_keys"), "native SrpBandKeys expression missing from plan")
    // exactly one slice is expected — the grouped pair emission
    // (orderedPairsWithinGroups); a PER-PLANE slice tree (one per plane,
    // seconds of analyzer + janino work at planes = 128) must stay dead
    assert("slice\\(".r.findAllIn(p).length <= 1, "per-plane slice tree crept back into SRP")
  }

  test("fingerprints: native rolling hash, no interpreted per-char fold") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ext.TextAnalysis.fingerprints(docs))
    assert(p.contains("rolling_hash"), "native RollingHash expression missing from plan")
    assert(!p.contains("aggregate("), "per-character HOF fold crept back into fingerprints")
  }

  test("ivfTopK: kernel argmin assignment — no sort, no window, one shuffle") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(Similarity.ivfTopK(emb, emb.filter(col("vec_id") % 50 === 0)))
    assertNoCartesian(p)
    assert(!p.contains("Window"), "rank-window shuffle crept back into IVF")
    assert(!p.contains("SortMergeJoin"), "IVF join must broadcast, not sort-merge")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"IVF should shuffle only the bounded top-k aggregate, saw $exchanges:\n$p")
  }

  test("bruteForceTopK: bounded partial aggregation, not a rank window") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") % 50 === 0)))
    assert(!p.contains("Window"), "top-k must partial-aggregate, not rank the cross product")
    assert(p.contains("ObjectHashAggregate"), "bounded TopKAggregator missing from plan")
  }

  test("q1: filter and column pruning reach the parquet scan") {
    val p = plan(QueryCatalog.queries("q1_lineitem")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "unused columns must be pruned from the scan")
  }

  test("q3: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan(QueryCatalog.queries("q3_top10")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("bm25: top-k via TakeOrderedAndProject; tf shuffle is term-pruned") {
    val p = plan(QueryCatalog.queries("bm25_scores")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), "bm25 top-k must not global-sort")
    // the corpus-stats join is a broadcast of ONE row (n, avgdl) — the
    // BroadcastNestedLoopJoin-Cross it compiles to is the intended shape;
    // a row-producing cartesian would show up as CartesianProduct instead
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
  }

  test("tfidf: window partitions on the doc id — never a global sort") {
    val p = plan(QueryCatalog.queries("tfidf_top_terms")(spark, sf))
    assert(p.contains("Window"), "per-doc rank window expected")
    assert(!p.matches("(?s).*Sort \\[tfidf.*DESC.*\\], true.*"),
      "global (allOrder=true) sort on the score must not appear")
  }

  test("token packing: window is partitioned by the shard, not global") {
    val p = plan(QueryCatalog.queries("token_packing")(spark, sf))
    // a partitioned window sorts locally (global=false): "Sort [...], false"
    assert(!p.matches("(?s).*Sort \\[.*\\], true.*"), "global sort in packing window")
    assert(p.contains("Window"), "window cumsum expected")
  }

  test("runtime bloom-filter pruning injects on selective shuffle joins") {
    // GraftSession ships bloomFilter.enabled=true; here the size thresholds
    // are forced down so the tiny local fixture exercises the injection the
    // way a 100 TB fact scan would hit it with the defaults
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val part = spark.read.parquet(s"$sf/part.parquet").filter(col("p_size") === 1)
      val joined = li.join(part, li("l_partkey") === part("p_partkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        "runtime bloom filter not injected into the fact side:\n" + p.take(3000))
    } finally old.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("repetition ratio: no per-row array_distinct over a HOF subexpression") {
    val p = plan(QueryCatalog.queries("repetition_ratio")(spark, sf))
    assert(!p.contains("array_distinct"),
      "distinct gram count must aggregate exploded grams, not re-evaluate a per-row HOF")
  }

  test("chunk_docs: map-only generator pass — no exchange at all") {
    val p = plan(QueryCatalog.queries("chunk_docs")(spark, sf))
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n${p.take(1500)}")
    assert(p.contains("Generate"), "expected a generator (explode) node")
  }

  test("interval join: equi-join on the key with the range as condition, no nested loop") {
    val p = plan(QueryCatalog.queries("interval_join_attrib")(spark, sf))
    assertNoCartesian(p)
  }

  test("grouped_topk_agg: bounded aggregation, never a rank window") {
    val p = plan(QueryCatalog.queries("grouped_topk_agg")(spark, sf))
    assert(!p.contains("Window"), s"rank window crept back into grouped top-k:\n${p.take(1200)}")
    assert(p.contains("ObjectHashAggregate"), "expected the TopKAggregator aggregation")
  }

  test("funnel: every stage shuffles on the user id alone (fixed-width key)") {
    val p = plan(QueryCatalog.queries("funnel_conversion")(spark, sf))
    // prior-stage times must ride through as aggregates, not widen the
    // grouping key — a k-step funnel whose exchange key grows O(k) ships
    // every earlier timestamp with every shuffled row
    assert(!"hashpartitioning\\([^)]*__t".r.findFirstIn(p).isDefined,
      s"funnel exchange key widened beyond uid:\n${p.take(2000)}")
  }

  test("decontaminate: training grams are never shuffled — broadcast semi-join only") {
    val p = plan(QueryCatalog.queries("decontaminate")(spark, sf))
    // the training-side gram Generate must feed the LeftSemi probe
    // directly: in the tree text the probe child renders between the
    // LeftSemi line and its BroadcastExchange build side, so an Exchange in
    // that span means the full-corpus gram relation (the dominant volume at
    // scale) started paying a shuffle it never needs
    val semi = p.indexOf("LeftSemi")
    assert(semi >= 0, s"expected a broadcast semi-join:\n${p.take(2000)}")
    val build = p.indexOf("BroadcastExchange", semi)
    assert(build >= 0,
      s"eval gram set is no longer a broadcast build (training grams are being shuffled):\n${p.take(2000)}")
    val probeSpan = p.substring(semi, build)
    assert(probeSpan.contains("Generate"),
      s"expected the gram generate as the semi-join probe:\n${p.take(2000)}")
    assert(!probeSpan.contains("Exchange"),
      s"training gram relation is being shuffled before the semi-join:\n$probeSpan")
    assert(p.contains("LeftAnti"), "surviving docs must come from an anti-join")
  }

  test("gram dedup paths use compiled gram kernels, not interpreted HOFs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // ngramJaccardPairs hashes grams in the native ngram_hashes expression;
    // minhashLshVerifiedPairs moved to the per-doc typed kernel (round 17:
    // distinctGramHashes + minhashBandRows — shows as object serialization
    // nodes, no distinct/groupBy exchanges on the gram relation). Both must
    // stay off the interpreted per-gram transform(...) path.
    val pJac = plan(Dedup.ngramJaccardPairs(docs))
    assert(pJac.contains("ngram_hashes"), s"native gram kernel missing:\n${pJac.take(1200)}")
    assert(!pJac.contains("transform("), "interpreted per-gram transform back in the hot path")
    val pLsh = plan(Dedup.minhashLshVerifiedPairs(docs))
    assert(pLsh.contains("SerializeFromObject"),
      s"compiled per-doc minhash kernel missing:\n${pLsh.take(1200)}")
    assert(!pLsh.contains("transform("), "interpreted per-gram transform back in the hot path")
    assert(!pLsh.contains("ngram_hashes") || pLsh.contains("SerializeFromObject"),
      "minhash gram build regressed to the expression chain")
  }

  test("stratum_cap: bounded aggregation + broadcast semi-join, never a rank window") {
    val p = plan(QueryCatalog.queries("stratum_cap")(spark, sf))
    assert(!p.contains("Window"), s"rank window crept back into the stratum cap:\n${p.take(1200)}")
    assert(p.contains("ObjectHashAggregate"), "expected the bounded TopKAggregator selection")
    assert(p.contains("LeftSemi"), "kept rows must come back via a semi-join")
  }

  test("mixture_sample: one totals aggregation broadcast back, map-only filter") {
    val p = plan(QueryCatalog.queries("mixture_sample")(spark, sf))
    assertNoCartesian(p)
    assert(p.contains("BroadcastHashJoin"), "per-source totals must broadcast, not shuffle the corpus")
    // exactly one shuffle: the partial/final totals aggregation. More means
    // the corpus itself started paying an exchange for a scalar-per-source.
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one hash exchange (the totals agg):\n${p.take(2000)}")
  }

  test("line_dedup: linear shuffles only — no self-join, no corpus window") {
    val p = plan(QueryCatalog.queries("line_dedup")(spark, sf))
    assertNoCartesian(p)
    assert(!p.contains("Window"), "first-occurrence selection must be an aggregate, not a rank window")
    // joins: only the final per-doc LEFT join of counts to rebuilt text
    assert(!p.contains("Inner"), s"unexpected inner join (line self-join?) in:\n${p.take(2000)}")
  }

  test("dup_ngram_fraction: compiled gram kernel, linear shuffles, no window") {
    val p = plan(QueryCatalog.queries("dup_ngram_fraction")(spark, sf))
    assertNoCartesian(p)
    // round 17: grams come from the per-doc typed kernel (distinctGramHashes
    // — shows as object serialization), which also removed the (id, g)
    // distinct exchange the expression chain paid
    assert(p.contains("SerializeFromObject"), "compiled per-doc gram kernel missing")
    assert(!p.contains("transform("), "interpreted per-gram transform back in the hot path")
    assert(!p.contains("Window"), "df counting must stay an aggregate, not a rank window")
  }

  test("knn_label_vote: bounded top-k aggregation + one-aggregate vote, no window") {
    val p = plan(QueryCatalog.queries("knn_label_vote")(spark, sf))
    assertNoCartesian(p)
    assert(!p.contains("Window"), s"rank/vote window crept into the label vote:\n${p.take(1200)}")
    assert(p.contains("ObjectHashAggregate"), "expected the bounded TopKAggregator selection")
  }

  test("feature_stats: the word-count shape — exactly one exchange, partial aggregation") {
    val p = plan(QueryCatalog.queries("feature_stats")(spark, sf))
    assert(!p.contains("Window") && !p.contains("Join"), s"unexpected operator:\n${p.take(1200)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one exchange (the per-dim aggregate):\n${p.take(2000)}")
  }

  test("quality_logit: weight table broadcasts; vocabulary via TakeOrderedAndProject") {
    val p = plan(QueryCatalog.queries("quality_logit")(spark, sf))
    assertNoCartesian(p)
    assert(p.contains("BroadcastHashJoin"), "weights must broadcast, not shuffle the tf relation")
    assert(p.contains("TakeOrderedAndProject"), "top-100 vocab must not be a global sort")
  }

  test("pca_project: the projection itself is map-only — no exchange at all") {
    val p = plan(QueryCatalog.queries("pca_project")(spark, sf))
    assert(!p.contains("Exchange"), s"projection pass must not shuffle:\n${p.take(1200)}")
    assert(!p.contains("Join"), "projection must not join")
  }

  test("pq paths: shuffle-free encode; search shuffles only bounded aggregates") {
    val pCodes = plan(QueryCatalog.queries("pq_codes")(spark, sf))
    assert(!pCodes.contains("Exchange"), s"PQ encode must not shuffle:\n${pCodes.take(1200)}")
    // ADC-only library form: the one top-k aggregate is the only exchange
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pAdc = plan(graft.ext.Similarity.pqTopK(
      emb, emb.filter(col("vec_id") % 50 === 0), k = 10, dim = 64, m = 8, codebookSize = 16))
    assert(!pAdc.contains("Window"), "rank window crept into the ADC search")
    assert("Exchange hashpartitioning".r.findAllIn(pAdc).length <= 1,
      s"ADC-only search should shuffle only the top-k aggregate:\n${pAdc.take(2000)}")
    // registered production form adds the exact rerank: ONE more bounded
    // exchange (the |Q| x rerank shortlist's top-k) — never a window, and
    // the candidate relation is the join's small side
    val pSearch = plan(QueryCatalog.queries("pq_topk")(spark, sf))
    assert(!pSearch.contains("Window"), "rank window crept into the reranked search")
    assert("Exchange hashpartitioning".r.findAllIn(pSearch).length <= 2,
      s"reranked search should shuffle only the two bounded top-k aggregates:\n${pSearch.take(2000)}")
  }

  test("curriculum_buckets: the window partitions by the stratum — never a global sort") {
    val p = plan(QueryCatalog.queries("curriculum_buckets")(spark, sf))
    assert(p.contains("Window"), "ntile is expected to be a window")
    assert(!p.contains("rangepartitioning"),
      s"global range sort crept into the per-stratum bucketing:\n${p.take(1200)}")
  }

  test("audio_frame_stats: the PCM decode is a map-only generator pass — no exchange") {
    val p = plan(QueryCatalog.queries("audio_frame_stats")(spark, sf))
    assert(!p.contains("Exchange"), s"PCM decode must not shuffle:\n${p.take(1200)}")
    assert(!p.contains("Join"), "PCM decode must not join")
  }

  test("rolling_stats: the range-frame window partitions by the key — never a global sort") {
    val p = plan(QueryCatalog.queries("rolling_stats")(spark, sf))
    assert(p.contains("Window"), "range frame is expected to be a window")
    assert(!p.contains("rangepartitioning"),
      s"global range sort crept into the per-key rolling stats:\n${p.take(1200)}")
  }

  test("archive and compression codecs: per-doc kernels, no joins") {
    // round 17: the EXPENSIVE roundtrip kernels (full deflate/gzip, LZMA,
    // zstd, brotli) carry the one staging round-robin exchange (scan-split
    // decoupling — see the staging-exchange family below); the cheap ones
    // stay strictly map-only. Neither class may join, and nothing may add
    // a hash exchange.
    Seq("snappy_roundtrip", "lz4_roundtrip", "rans_roundtrip",
      "utf8_stats").foreach { key =>
      val p = plan(QueryCatalog.queries(key)(spark, sf))
      assert(!p.contains("Exchange"), s"$key must not shuffle:\n${p.take(1200)}")
      assert(!p.contains("Join"), s"$key must not join")
    }
    Seq("text_gunzip", "deflate_roundtrip", "zstd_roundtrip", "xz_lzma_roundtrip",
      "brotli_roundtrip", "brotli_q1_roundtrip").foreach { key =>
      val p = plan(QueryCatalog.queries(key)(spark, sf))
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges == 1, s"$key: one staging exchange expected, got $exchanges:\n${p.take(1200)}")
      assert(p.contains("REPARTITION_BY_NUM") || p.contains("RoundRobinPartitioning"),
        s"$key: the staging exchange must be the round-robin repartition")
      assert(!p.contains("Join"), s"$key must not join")
    }
  }

  test("warc/csv extraction: exactly one exchange — the shard-synthesis grouping") {
    Seq("warc_extract", "warc_http_extract", "warc_http_enc_extract",
      "csv_extract").foreach { key =>
      val p = plan(QueryCatalog.queries(key)(spark, sf))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 1,
        s"$key: the only shuffle should be building the archives (got $exchanges):\n${p.take(1500)}")
      assertNoCartesian(p)
    }
  }

  test("sitemap_extract: two host exchanges — fixture staging plus the file-set grouping") {
    // unlike the WARC keys (archive -> map-only flatMap), sitemap ingestion
    // genuinely needs a host's FILES together (index + children), so the
    // extract side is its own groupByKey on host; the first exchange is the
    // fixture writer, absent in real ingestion where files come from storage
    val p = plan(QueryCatalog.queries("sitemap_extract")(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, s"got $exchanges exchanges:\n${p.take(1500)}")
    assert(!p.contains("Join"), "no joins in the sitemap path")
    assertNoCartesian(p)
  }

  test("robots decisions: the rule/file side broadcasts — never a shuffled join") {
    Seq("robots_decisions", "robots_txt_decisions").foreach { key =>
      val p = plan(QueryCatalog.queries(key)(spark, sf))
      assert(p.contains("BroadcastHashJoin"),
        s"$key: per-host rules must broadcast into the URL side:\n${p.take(1200)}")
      assert(!p.contains("SortMergeJoin"), s"$key: the URL table must not shuffle for the join")
      assertNoCartesian(p)
    }
  }

  test("zstd_dict_train: the top-gram table broadcasts; rank is top-k, not a corpus window") {
    val p = plan(QueryCatalog.queries("zstd_dict_train")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"the 2048-row top-gram table must broadcast into the segment scorer:\n${p.take(1200)}")
    assert(p.contains("TakeOrderedAndProject"),
      "the segment rank must be a bounded top-k, not a global sort")
    assertNoCartesian(p)
  }

  test("pagerank: one contribution shuffle per iteration, no cartesian, no window") {
    import spark.implicits._
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 0L, 1L)).toDF("src", "dst", "weight")
    // a single-iteration plan after the lineage cut: the contribution
    // aggregation and the node left-join are the whole round (threshold 0
    // forces the distributed path — the one whose shape matters at scale)
    val pr1 = graft.ext.Graph.pagerank(edges, iterations = 1, driverEdgeThreshold = 0)
    val p = plan(pr1)
    assertNoCartesian(p)
    assert(!p.contains("Window"), "pagerank must not use windows")
  }

  test("triangles: equi-joins only — the wedge join must never go cartesian") {
    import spark.implicits._
    val edges = (for (a <- 0L to 5L; b <- 0L to 5L if a < b) yield (a, b, 1L))
      .toDF("src", "dst", "weight")
    val p = plan(graft.ext.Graph.triangles(edges))
    assertNoCartesian(p)
    assert(!p.contains("Window"), "triangles must not use windows")
  }

  test("winnow: one per-doc pass — staging exchange only, no window, no join") {
    // round 17: the selection is document-local, so the explode + window +
    // distinct shape (two gram-row shuffles) collapsed into one flatMap;
    // the single allowed exchange is the round-robin staging repartition
    // of the narrow (doc_id, text) rows — a Window, a Join, or a SECOND
    // exchange means gram rows started shuffling again
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ext.TextAnalysis.winnow(docs))
    assert(!p.contains("Join"), "winnow must be join-free")
    assert(!p.contains("Window"), "gram-row window crept back into winnow")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"one staging exchange expected, got $exchanges:\n${p.take(1200)}")
    assert(p.contains("REPARTITION_BY_NUM") || p.contains("RoundRobinPartitioning"),
      s"the staging exchange must be the round-robin repartition:\n${p.take(1200)}")
  }

  test("url_normalize + robots: map-only rewrite; rules broadcast, never shuffled") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pUrl = plan(QueryCatalog.queries("url_normalize")(spark, sf))
    assert(!pUrl.contains("Exchange"), s"url_normalize must not shuffle:\n${pUrl.take(1200)}")
    assert(!pUrl.contains("Join"), "url_normalize must not join")
    val pRob = plan(QueryCatalog.queries("robots_decisions")(spark, sf))
    assert(pRob.contains("BroadcastHashJoin") || pRob.contains("BroadcastExchange"),
      s"the rule set must broadcast:\n${pRob.take(1200)}")
    assert(!pRob.contains("SortMergeJoin"), "rules must never shuffle-join")
    val pNfc = plan(QueryCatalog.queries("unicode_nfc")(spark, sf))
    assert(!pNfc.contains("Exchange") && !pNfc.contains("Join"), "unicode_nfc is map-only")
  }

  test("bitpack/gorilla/rle: bucket- or series-partitioned windows — never a global sort, no joins") {
    Seq("bitpack_blocks", "gorilla_ts", "rle_runs").foreach { key =>
      val p = plan(QueryCatalog.queries(key)(spark, sf))
      assert(!p.contains("Join"), s"$key must be join-free")
      assert(p.contains("hashpartitioning"),
        s"$key's window must partition by the bucket/series key:\n${p.take(1200)}")
      assert(!p.contains("rangepartitioning"),
        s"$key must never global-sort:\n${p.take(1200)}")
    }
  }

  test("inverted index: linear shuffles, no self-join; retrieval broadcasts the query terms") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pIdx = plan(graft.ext.InvertedIndex.postingsBlocks(docs).toDF())
    assert(!pIdx.contains("Join"), "index build is aggregation-only, never a join")
    assertNoCartesian(pIdx)
    val pRet = plan(QueryCatalog.queries("boolean_retrieval")(spark, sf))
    assertNoCartesian(pRet)
    assert(pRet.contains("BroadcastHashJoin"),
      s"query-term attach must broadcast:\n${pRet.take(1200)}")
  }

  test("wordpiece_tokens is MAP-ONLY — zero exchanges") {
    val p = plan(QueryCatalog.queries("wordpiece_tokens")(spark, sf))
    assert(!p.contains("Exchange"), s"wordpiece_tokens must not shuffle:\n${p.take(1500)}")
  }

  test("dremel_shred: per-doc kernel behind one staging exchange") {
    // round 17: the shred/reassemble kernel joined the staging-exchange
    // family (it was the last multi-second single-split key) — one
    // round-robin exchange of (doc_id, tokens), nothing else
    val p = plan(QueryCatalog.queries("dremel_shred")(spark, sf))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"one staging exchange expected, got $exchanges:\n${p.take(1500)}")
    assert(p.contains("REPARTITION_BY_NUM") || p.contains("RoundRobinPartitioning"),
      s"the staging exchange must be the round-robin repartition:\n${p.take(1200)}")
    assert(!p.contains("Join") && !p.contains("Window"), "dremel_shred stays join/window-free")
  }

  test("skyline: no hash shuffle of the base relation — one single-partition frontier merge") {
    val p = plan(QueryCatalog.queries("skyline_parts")(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"),
      s"phase 1 must reduce in place; only the frontier union moves:\n${p.take(1500)}")
    assert("Exchange SinglePartition".r.findAllIn(p).length == 1)
    assert(!p.contains("Join"), "skyline is join-free")
  }

  test("SNM pair generation: distributed rank + equi-joins — no per-lang window, no cartesian") {
    // the rank is the two-pass partition-offset scheme (snmRanked): a
    // `row_number() OVER (PARTITION BY lang)` window here would funnel the
    // dominant language (en = 41% of docs) through ONE task at 100 TB
    for (k <- Seq("edit_distance_pairs", "er_match_scores", "edit_distance_pairs_mp",
      "edit_distance_pairs_3p")) {
      val p = plan(QueryCatalog.queries(k)(spark, sf))
      assertNoCartesian(p)
      assert(!p.contains("Window"), s"$k must rank distributively, not via a window:\n${p.take(1500)}")
    }
  }

  test("pack_sequences: one shard exchange, partition-local sort, no window") {
    val p = plan(QueryCatalog.queries("pack_sequences")(spark, sf))
    assert(!p.contains("], true, 0"), s"the NFD sort must stay partition-local:\n${p.take(1500)}")
    assert(!p.contains("Window"), "packing is a sequential scan, not a window")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"exactly one exchange on the shard key:\n${p.take(1500)}")
    assertNoCartesian(p)
  }

  test("zstd_roundtrip: per-doc kernel behind one staging exchange") {
    val p = plan(QueryCatalog.queries("zstd_roundtrip")(spark, sf))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"one staging exchange expected, got $exchanges:\n${p.take(1500)}")
    assert(!p.contains("Join"), "zstd_roundtrip must not join")
  }

  test("bitmap_and_compressed: container equi-join, no cartesian, no base-scan join") {
    val p = plan(QueryCatalog.queries("bitmap_and_compressed")(spark, sf))
    assertNoCartesian(p)
  }

  test("grid_dbscan: neighbor adjacency is an equi-join on generated keys, not a theta join") {
    val p = plan(QueryCatalog.queries("grid_dbscan")(spark, sf))
    assertNoCartesian(p)
  }

  test("per-series scans (holt/viterbi) keep their sorts partition-local") {
    for (k <- Seq("holt_smooth", "hmm_states")) {
      val p = plan(QueryCatalog.queries(k)(spark, sf))
      // sortWithinPartitions renders `Sort [...], false, 0`; a global sort
      // would render `Sort [...], true, 0`
      assert(!p.contains("], true, 0"), s"$k must not globally sort:\n${p.take(1500)}")
      assertNoCartesian(p)
    }
  }

  test("round-12 composition keys: broadcasts where claimed, no cartesian, no corpus window") {
    // discovery_frontier: the per-host rule universe broadcasts into the
    // unioned frontier; the only frontier-scale shuffle is the argmax group
    val pf = plan(QueryCatalog.queries("discovery_frontier")(spark, sf))
    assert(pf.contains("BroadcastHashJoin"), s"frontier: rules must broadcast:\n${pf.take(1200)}")
    assert(!pf.contains("Window"), "frontier has no window")
    assertNoCartesian(pf)
    // crawl_schedule: robots files + per-host delays broadcast; the rank
    // window is HOST-partitioned (local sort, never a global one)
    val ps = plan(QueryCatalog.queries("crawl_schedule")(spark, sf))
    assert(ps.contains("BroadcastHashJoin"), s"schedule: files/delays must broadcast:\n${ps.take(1200)}")
    assert(ps.contains("Window"), "schedule: per-host rank window expected")
    assert(!ps.matches("(?s).*Sort \\[.*\\], true.*"), "schedule: global sort must not appear")
    assertNoCartesian(ps)
    // caption_align: equi-join on doc + argmax, no window, no cartesian
    val pc = plan(QueryCatalog.queries("caption_align")(spark, sf))
    assert(!pc.contains("Window"), "alignment is an argmax, not a window")
    assertNoCartesian(pc)
    // wet_convert: map-only conversion — no joins, no windows anywhere
    val pw = plan(QueryCatalog.queries("wet_convert")(spark, sf))
    assert(!pw.contains("Join") && !pw.contains("Window"), "wet conversion stays map-only")
  }

  test("round-13/14 ingest keys: per-document decode stays map-only") {
    // books/office/codec ingestion is one typed flatMap per document —
    // a shuffle or join appearing here means fixture staging or decode
    // stopped being per-row
    // the keys whose kernels are genuinely cheap: no exchange anywhere —
    // decode is per-row and the single-partition scan is fine (round 17:
    // everything measured >= ~0.4s steady moved to the staging-exchange
    // family below; what remains is expression-level text work and the
    // already-staged arrow fixture)
    Seq("audio_flac_frame_stats", "ogg_streams", "cjk_tokens", "unicode_nfkc",
      "sentence_split", "arrow_batches").foreach { key =>
      val p = plan(QueryCatalog.queries(key)(spark, sf))
      assert(!p.contains("Exchange"), s"$key must not shuffle:\n${p.take(1200)}")
      assert(!p.contains("Join"), s"$key must not join")
      assert(!p.contains("Window"), s"$key must not window")
    }
    // the EXPENSIVE per-document writers (zlib, CFB, AES, packfile
    // synthesis): decode stays per-row, but the fixture STAGING carries
    // exactly one round-robin exchange of bare doc ids — the bench's
    // documents table is a single parquet row group (one scan partition),
    // and the render+extract CPU must spread across cores the way a real
    // multi-file corpus scan would. More than one exchange, or any
    // join/window, is a regression.
    // (round 17: sqlite_rows / parquet_meta / gguf_meta moved down from the
    // cheap list — their renders are full page-level databases, parquet
    // page stacks, and gguf tensor blocks, the most expensive writers in
    // the family; measured single-split at 2.4/2.1/0.9s steady they were
    // the suite's last single-core hot paths)
    // (round 17, second wave: every per-doc render/decode kernel measured
    // >= ~0.4s steady on the single-split bench corpus joined the family —
    // their kernels are full format writers + from-scratch decoders, the
    // very class the staging exchange exists for)
    Seq("pdf_extract", "epub_extract", "docx_extract", "odt_extract",
      "pptx_extract", "xlsx_extract", "ipynb_cells", "git_objects",
      "gpx_points", "ppt_extract", "deb_extract", "rpm_meta",
      "ttf_meta", "sqlite_rows", "parquet_meta", "gguf_meta",
      "rtf_extract", "latex_extract", "markdown_extract",
      "multimodal_webp_decode", "exif_meta", "exif_strip",
      "doc_extract", "xls_cells", "msg_extract",
      "ics_events", "vcard_contacts", "toml_entries",
      "java_properties", "svg_text", "svg_meta",
      "eml_extract", "yaml_entries", "orc_meta", "cpio_entries",
      "class_meta", "elf_meta",
      "safetensors_meta", "npy_meta", "pickle_scan",
      "wasm_meta", "pe_meta", "bson_docs", "macho_meta",
      "dex_classes", "msgpack_items", "sst_entries", "cbor_items",
      "midi_meta", "torrent_meta", "dicom_meta", "protobuf_scan",
      "charset_decode", "content_extract").foreach { key =>
      val p = plan(QueryCatalog.queries(key)(spark, sf))
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges == 1, s"$key: one staging exchange expected, got $exchanges:\n${p.take(1200)}")
      assert(p.contains("REPARTITION_BY_NUM") || p.contains("RoundRobinPartitioning"),
        s"$key: the staging exchange must be the round-robin repartition")
      assert(!p.contains("Join") && !p.contains("Window"), s"$key stays join/window-free")
    }
  }

  test("round-13 archive keys: wat/cdx shapes — shard grouping only; cdx_seek one equi-join") {
    // wat_convert / cdx_records ride the same shard-synthesis grouping as
    // the warc family: exactly one hash exchange, nothing else
    Seq("wat_convert", "cdx_records").foreach { key =>
      val p = plan(QueryCatalog.queries(key)(spark, sf))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 1,
        s"$key: the only shuffle should be building the archives (got $exchanges):\n${p.take(1500)}")
      assert(!p.contains("Window"), s"$key must not window")
      assertNoCartesian(p)
    }
    // cdx_seek: the documented fixture-scale equi-join of index records to
    // their segment blobs — exactly one join, never a cartesian
    val ps = plan(QueryCatalog.queries("cdx_seek")(spark, sf))
    assert("Join".r.findAllIn(ps).length >= 1, "cdx_seek joins records to segments")
    assert(!ps.contains("Window"), "cdx_seek must not window")
    assertNoCartesian(ps)
  }

  test("dup_spans_remove: the consumer adds one equi-join + fold over its producer — no window") {
    // the span-removal consumer must stay: producer pipeline + ONE join
    // (spans back onto documents) + a per-doc ordered fold — a Window or
    // cartesian appearing here is the per-span-explosion regression the
    // round-13 design explicitly avoided
    val producer = plan(QueryCatalog.queries("dup_spans")(spark, sf))
    val consumer = plan(QueryCatalog.queries("dup_spans_remove")(spark, sf))
    assertNoCartesian(consumer)
    val pw = "Window".r.findAllIn(producer).length
    val cw = "Window".r.findAllIn(consumer).length
    assert(cw <= pw, s"span removal added a window over its producer ($pw -> $cw)")
    val pe = "Exchange hashpartitioning".r.findAllIn(producer).length
    val ce = "Exchange hashpartitioning".r.findAllIn(consumer).length
    assert(ce <= pe + 2,
      s"span removal should add at most the span-pack + join exchanges (producer $pe, consumer $ce):\n${consumer.take(1500)}")
  }

  test("skew_profile / lang_source_chi2: zero Window operators — no single-partition funnel") {
    // round-16 pins for the two r15 weak components: both previously ranked
    // or totaled through GLOBAL windows (Window.partitionBy() with no keys),
    // which move the whole relation to ONE partition and spray "No Partition
    // Defined" warnings across the driver log. The rewrites reduce through
    // aggregations (count-value histogram fold; grouped marginals + 1-row
    // broadcast total) — a Window of ANY kind reappearing in either plan is
    // the regression.
    // zstd_dict_train joined the list in the second half of round 16: its
    // final <=128-row rank previously rode an unpartitioned row_number
    // window (the last WindowExec warning source in the whole suite); it
    // now ranks via TakeOrderedAndProject + a 1-row sort_array/posexplode
    // aggregate, the skew_profile pattern
    Seq("skew_profile", "lang_source_chi2", "zstd_dict_train").foreach { key =>
      val p = plan(QueryCatalog.queries(key)(spark, sf))
      assert(!p.contains("Window"), s"$key must not window:\n${p.take(1500)}")
      assert(!p.contains("CartesianProduct"), s"cartesian product in $key")
    }
    // skew_profile is pure aggregation — no join of any kind may appear
    val ps = plan(QueryCatalog.queries("skew_profile")(spark, sf))
    assert(!ps.contains("Join"), s"skew_profile must not join:\n${ps.take(1500)}")
    // chi2's grid and total ride BROADCASTS (the b-marginal via
    // BroadcastNestedLoopJoin Cross — bounded category sides — the observed
    // counts via BroadcastHashJoin): a shuffled sort-merge join here means a
    // marginal started paying a corpus exchange
    val p2 = plan(QueryCatalog.queries("lang_source_chi2")(spark, sf))
    assert(!p2.contains("SortMergeJoin"), s"chi2 grid must broadcast, not sort-merge:\n${p2.take(1500)}")
  }
}
