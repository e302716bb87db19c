package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ======== Greedy max-coverage data selection (submodular curation) ====
  *
  * The coverage-driven subset-selection baseline for training-data
  * curation: pick `k` documents maximizing the number of DISTINCT word
  * bigrams covered — the classic greedy algorithm for monotone
  * submodular maximization, whose (1 − 1/e) approximation guarantee
  * (Nemhauser, Wolsey & Fisher 1978) is the reason every
  * coverage/facility-location data-selection paper starts here: after
  * dedup removes copies, coverage selection removes REDUNDANCY — ten
  * unique-but-interchangeable documents add ten near-zero marginal
  * gains, which frequency sampling cannot see.
  *
  * Semantics: rounds r = 1..k; each round scores every unselected doc
  * by its marginal gain (distinct grams not yet covered) and takes the
  * argmax, ties toward the smallest doc id; selection STOPS at
  * saturation (no doc adds a new gram — emitting zero-gain picks would
  * be redundancy by construction). Deterministic, mirrored by the
  * oracle, which unrolls every round as MATERIALIZED CTE levels (an
  * empty level stays empty through all later levels, so the oracle
  * truncates exactly where the operator stops).
  *
  * 100 TB shape: the gram relation materializes ONCE (one distinct
  * shuffle); a CORPUS-WIDE gain pass is one anti-join + one count
  * aggregate over it (gram-keyed, map-side combinable). Round 9 ran
  * that full pass EVERY round (k rounds = k linear passes — the
  * bpe_train multi-pass budget); round 10 replaced the per-round passes
  * with CELF lazy evaluation (Leskovec et al., "Cost-effective Outbreak
  * Detection in Networks", KDD 2007): submodularity means marginal
  * gains only DECAY, so a gain computed in an earlier round is an upper
  * bound — most rounds need only driver set arithmetic over a bounded
  * candidate pool instead of a corpus pass. See [[greedySelect]] for
  * the exactness guard; the selected set is bit-identical to plain
  * greedy (CELF reorders evaluations, never changes the argmax), so the
  * unrolled-CTE oracle is unchanged.
  */
object Coverage {

  /** Greedy top-`k` coverage selection over distinct word bigrams,
    * CELF-accelerated. Output: (rank, doc_id, marginal_gain) — one row
    * per round, fewer if the corpus saturates.
    *
    * Mechanics: ONE corpus gain pass ranks all docs by marginal gain
    * vs the covered set and collects the top `pool`+1 rows; the pool's
    * bigram sets (≤ `pool` documents of text — the bounded-collect
    * convention, same order as `negative_samples`' fixed pool) come to
    * the driver once. POOL SIZING is the repool-rate lever: the guard
    * floor is the (pool+1)-th gain AT POOL TIME, so in a redundant
    * corpus (gains decay fast as coverage grows) a small pool falls
    * below its floor after few picks and repools — measured at sf0.1:
    * pool 16 → 43 jobs, 64 → 37, 256 → 25 (and beats the per-round
    * plain-greedy baseline), 1024 → 19. Default 256 ≈ driver state of
    * 256 documents' bigram sets, the same order as the other bounded
    * collects; raise it when k is large or redundancy extreme. The
    * collect is additionally BYTE-bounded by `maxPoolChars` (Σ gram
    * chars across the pool): the effective pool shrinks to the longest
    * gain-ordered prefix that fits, and the guard floor rises to the
    * first excluded gain — row-bounded AND byte-bounded driver state,
    * bit-identical selection. Subsequent rounds run the classic CELF heap: pop
    * the highest cached bound, refresh it against the covered set
    * (pure driver set ops — zero Spark jobs), select when the top is
    * fresh. EXACTNESS GUARD: docs outside the pool have gain ≤ `floor`
    * (the (pool+1)-th gain at pool time, and gains only decay), so a
    * fresh top strictly above `floor` is the global argmax — ties at
    * the floor inside the pool carry the smallest ids by the pool
    * ordering, so the first selection after a (re)pool is uncondition-
    * ally exact, and any later fresh top ≤ floor triggers a REPOOL
    * (full pass vs current covered) instead of an unsafe pick. k picks
    * therefore cost 1 + (#guard-trips) corpus passes instead of k —
    * typically 1 (CoverageSpec pins the job-count cut with a listener)
    * — while selecting the byte-identical sequence plain greedy would.
    */
  def greedySelect(docs: DataFrame, k: Int = 8, idCol: String = "doc_id",
      textCol: String = "text", pool: Int = 256, maxPoolChars: Long = 1L << 25): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(pool >= 1, "pool must be >= 1")
    require(maxPoolChars >= 1L, "maxPoolChars must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val norm = lower(trim(regexp_replace(col(textCol), "[ \\t\\n\\f\\r]+", " ")))
    // per-doc distinct bigrams in one compiled flatMap (round 17): the
    // previous explode(array_distinct(transform(sequence(...), i ->
    // concat_ws(...)))) chain paid an interpreted lambda dispatch per gram
    // (higher-order functions are CodegenFallback). Identical gram set:
    // split on the same normalized string, adjacent pairs joined by one
    // space, first-occurrence dedup per doc. Deliberately NOT widened with
    // a staging exchange: the CELF driver rounds re-scan this persisted
    // relation many times, and the single cached partition measured FASTER
    // than 32 tiny ones for those pool passes (see OPTIMIZATION_r17.md).
    val grams = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("d"), norm.as("__t"))
      .as[(Long, String)]
      .flatMap { case (d, t) =>
        val w = t.split(" ", -1)
        if (w.length < 2) Iterator.empty
        else {
          val seen = new java.util.LinkedHashSet[String]()
          var i = 0
          while (i < w.length - 1) {
            seen.add(w(i) + " " + w(i + 1))
            i += 1
          }
          val out = new Array[(Long, String)](seen.size())
          val it = seen.iterator()
          var j = 0
          while (it.hasNext) { out(j) = (d, it.next()); j += 1 }
          out.iterator
        }
      }
      .toDF("d", "gr")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val covered = scala.collection.mutable.HashSet.empty[String]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      // (re)pool: one corpus-wide gain pass vs the current covered set
      val ids: Seq[Long] = selected.map(_._2).toSeq
      val remaining = if (ids.isEmpty) grams else grams.filter(!col("d").isin(ids: _*))
      val marg =
        if (ids.isEmpty) remaining.groupBy("d").agg(count(lit(1)).as("marg"))
        else {
          val coveredDf = grams.filter(col("d").isin(ids: _*)).select("gr").distinct()
          remaining.join(coveredDf, Seq("gr"), "left_anti")
            .groupBy("d").agg(count(lit(1)).as("marg"))
        }
      val top = marg.orderBy(col("marg").desc, col("d").asc).limit(pool + 1).collect()
      if (top.isEmpty) exhausted = true // saturation: nothing adds a new gram
      else {
        // BYTE-BOUND the driver collect: the pool's gram SETS come to the
        // driver, and gram-set size per doc is unbounded (a handful of
        // pathological documents could hold more text than driver heap).
        // One tiny gram-char aggregate over the candidate pool sizes each
        // doc; the pool then SHRINKS to the longest gain-ordered prefix
        // whose Σ gram chars fits `maxPoolChars` (always ≥ 1 doc — a
        // single selection's gram set is the irreducible driver state).
        // The guard floor rises to the first EXCLUDED row's gain, so the
        // CELF exactness argument is untouched: everything outside the
        // effective pool — shrunk-away rows included — has gain ≤ floor.
        val candRows = top.take(pool)
        val candIds = candRows.map(_.getLong(0)).toSeq
        val charSizes: Map[Long, Long] = grams
          .filter(col("d").isin(candIds: _*))
          .groupBy("d").agg(sum(length(col("gr"))).as("n"))
          .collect()
          .map(row => row.getLong(0) -> row.getLong(1)).toMap
        var budget = maxPoolChars
        var cut = 0
        while (cut < candRows.length &&
          (cut == 0 || charSizes.getOrElse(candRows(cut).getLong(0), 0L) <= budget)) {
          budget -= charSizes.getOrElse(candRows(cut).getLong(0), 0L)
          cut += 1
        }
        val poolRows = candRows.take(cut)
        val floor =
          if (cut < candRows.length) candRows(cut).getLong(1) // first shrunk-away row
          else if (top.length == pool + 1) top.last.getLong(1)
          else 0L
        val poolIds = poolRows.map(_.getLong(0)).toSeq
        val gramSets: Map[Long, Array[String]] = grams
          .filter(col("d").isin(poolIds: _*))
          .groupBy("d").agg(collect_set(col("gr")).as("g"))
          .collect()
          .map(row => row.getLong(0) -> row.getSeq[String](1).toArray).toMap
        // CELF heap: (cached bound, doc, round the bound was computed in)
        case class Ent(bound: Long, d: Long, round: Int)
        implicit val ord: Ordering[Ent] = Ordering.by((e: Ent) => (e.bound, -e.d))
        val heap = scala.collection.mutable.PriorityQueue.empty[Ent]
        poolRows.foreach(row => heap.enqueue(Ent(row.getLong(1), row.getLong(0), r)))
        var sincePool = 0
        var repool = false
        while (r <= k && !exhausted && !repool) {
          if (heap.isEmpty) repool = true // pool spent before k: re-rank the rest
          else {
            val e = heap.dequeue()
            if (e.round == r) {
              if (e.bound <= 0L) {
                // The fresh top adds nothing — but that's only a GLOBAL
                // saturation statement when the pool speaks for the whole
                // corpus: right after a (re)pool (sincePool == 0, the
                // corpus-wide argmax is in the pool) or when no doc exists
                // outside it (floor == 0). Otherwise outside docs can
                // still hold gains in (0, floor] — e.g. ≥ pool+1 near-
                // duplicates decaying every pool entry to 0 — so re-rank
                // the remaining corpus instead of stopping early.
                if (sincePool == 0 || floor == 0L) exhausted = true
                else repool = true
              } else if (e.bound > floor || sincePool == 0) {
                selected += ((r.toLong, e.d, e.bound))
                covered ++= gramSets(e.d)
                r += 1; sincePool += 1
              } else repool = true // guard: an outside doc could now win
            } else heap.enqueue( // stale: refresh in the driver, re-rank
              Ent(gramSets(e.d).count(g => !covered.contains(g)).toLong, e.d, r))
          }
        }
      }
    }
    grams.unpersist()
    val out = StructType(Seq(
      StructField("rank", LongType), StructField("doc_id", LongType),
      StructField("marginal_gain", LongType)))
    spark.createDataFrame(
      java.util.Arrays.asList(selected.toSeq.map(t => Row(t._1, t._2, t._3)): _*), out)
  }
}
