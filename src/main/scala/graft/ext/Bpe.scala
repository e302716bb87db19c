package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== Merge-based subword tokenizer (BPE apply), from scratch ====
  *
  * The tokenization step every LLM data pipeline runs: spell text into
  * symbols, then apply a FIXED, priority-ordered merge table — the
  * byte-pair-encoding apply phase. The repo's `token_counts` key covers
  * regex word-splitting; this operator is the real merge machinery:
  *
  *  - spelling: the text's SPACES become the '▁' word-boundary marker
  *    (the SentencePiece convention), then the string is split into
  *    individual CODEPOINTS joined by ' ' — the working separator;
  *  - merge application: for each rule `(a, b)` in priority order, one
  *    global left-to-right non-overlapping pass replaces `"a b"` with
  *    `"ab"`. This pass semantics is chosen deliberately: it is EXACTLY
  *    what both `java.lang.String.replace` and DuckDB's `replace()`
  *    implement, so the oracle replays the entire tokenizer as a 40-deep
  *    nested `replace()` chain and the result is bitwise-comparable.
  *    (Real BPE libraries merge rank-by-rank within words — on text
  *    whose words contain each pair at most once, the two are identical;
  *    the divergence on degenerate repeats like "aaaa" is documented
  *    here rather than hidden.)
  *
  * Codepoint discipline matters: Scala iterates UTF-16 chars by default
  * while DuckDB's substr/length count codepoints, so the speller walks
  * `codePoints()` — an astral emoji is ONE symbol on both engines.
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * tokenizer; north-star LLM-pipeline scope. 100 TB shape: map-only,
  * single pass, the merge table is a per-executor constant.
  */
object Bpe {

  /** Priority-ordered merge table (highest first), an English-frequency
    * flavored fixture shared verbatim by the DuckDB oracle builder.
    */
  val Merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("e", "s"), ("t", "i"), ("a", "l"), ("an", "d"), ("o", "u"),
    ("a", "r"), ("s", "t"), ("in", "g"), ("o", "f"), ("i", "s"),
    ("i", "t"), ("e", "d"), ("the", "▁"), ("and", "▁"), ("s", "▁"),
    ("e", "▁"), ("d", "▁"), ("t", "▁"), ("y", "▁"), ("o", "▁"),
    ("▁", "the"), ("▁", "a"), ("▁", "w"), ("▁", "s"), ("▁", "b"),
    ("c", "h"), ("s", "h"), ("w", "h"), ("q", "u"), ("l", "l"))

  /** Spell a text into space-joined codepoint symbols with '▁' word
    * boundaries.
    */
  private[ext] def spell(text: String): String = {
    val marked = text.replace(' ', '▁')
    val sb = new StringBuilder(marked.length * 2)
    val it = marked.codePoints().iterator()
    var first = true
    while (it.hasNext) {
      if (!first) sb.append(' ')
      sb.appendAll(Character.toChars(it.next()))
      first = false
    }
    sb.toString
  }

  /** One left-to-right non-overlapping pass per merge rule, in priority
    * order — `String.replace` semantics on both engines.
    */
  private[ext] def applyMerges(spelled: String): String =
    Merges.foldLeft(spelled) { case (s, (a, b)) => s.replace(a + " " + b, a + b) }

  private[ext] def tokenize(text: String): Array[String] = {
    if (text.isEmpty) Array.empty
    else applyMerges(spell(text)).split(' ')
  }

  /** ======== BPE TRAIN: learn the merge table from the corpus ========
    * The distributed training loop real tokenizers run: per round, count
    * every adjacent symbol pair across the corpus (a groupBy with
    * map-side partial aggregation — the classic shape), pick the most
    * frequent pair, rewrite the corpus with that merge, repeat. Two
    * determinism decisions make it oracle-able bitwise:
    *
    *  - tie-break: `count DESC, md5(pair) ASC` — the md5 hex is ASCII,
    *    so Spark's UTF-16 string order and DuckDB's UTF-8 binary order
    *    agree, which raw pair strings do NOT guarantee for astral text;
    *  - the rewrite is the same one-pass replace as [[applyMerges]].
    *
    * Exactly ONE DataFrame is ever persisted: the spelled base corpus.
    * Each round's rewrite accumulates as a nested codegen'd `replace`
    * Column over that base instead of persisting a new corpus per round
    * — the r16 shape (8 MEMORY_AND_DISK persists live at once, deferred
    * unpersist churn) is what stalled under suite memory pressure (one
    * interleaved rep ran ~100s vs a 3.97s median). Round k re-applies k
    * replaces over the cache — O(rounds²) linear string scans total,
    * noise next to the per-round shuffle for the rounds this operator
    * targets; `collapseEvery` bounds the expression depth (and the
    * re-apply cost) for large `rounds` by folding the chain back into a
    * fresh single cache, with the old one unpersisted only after the
    * next action materializes the new one.
    */
  final case class LearnedMerge(rank: Long, pair: String, cnt: Long)

  def trainMerges(docs: DataFrame, rounds: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // spelling is the one typed step (codepoint iteration); every round
    // after it stays inside whole-stage codegen: transform/element_at
    // for the pair explode, functions.replace (literal-safe) for the
    // rewrite — no per-row lambda or Encoder round trips in the loop
    // a small corpus parquet arrives as ONE scan split, which would run all
    // `rounds` sequential pair-count jobs single-core; spread it once up
    // front (one tiny shuffle) — BEFORE the spell map, so the codepoint
    // iteration itself runs wide too (round 17; it previously ran on the
    // single scan split and landed entirely in the cold materialization).
    // At scale the scan already has >= default parallelism splits and no
    // shuffle is added.
    val target = spark.sparkContext.defaultParallelism
    val texts = docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0 && col(textCol).isNotNull)
      .select(col(textCol))
    val spelled = (if (docs.rdd.getNumPartitions < target) texts.repartition(target) else texts)
      .as[String]
      .map(spell)
      .toDF("mg")
    var base = spelled
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val collapseEvery = 16
    var chain: org.apache.spark.sql.Column = col("mg")
    var depth = 0
    var retiring: DataFrame = null // collapsed-out base, unpersisted after the next action
    val learned = Seq.newBuilder[LearnedMerge]
    var k = 0
    while (k < rounds) {
      // pair emission is one compiled flatMap (round 17): the former
      // split + transform(sequence(...), i -> concat(element_at...)) +
      // explode chain paid an interpreted lambda dispatch per pair per
      // round (higher-order functions are CodegenFallback) — ~1.5M pairs
      // x `rounds` on the fixture. The replace chain stays a codegen'd
      // Column inside the select; identical pair strings
      // (split-on-space adjacency, single-space join).
      val best = base
        .select(chain.as("mg"))
        .as[String]
        .flatMap { mg =>
          val t = mg.split(" ", -1)
          if (t.length < 2) Iterator.empty
          else Iterator.range(0, t.length - 1).map(i => t(i) + " " + t(i + 1))
        }
        .toDF("p")
        .groupBy("p").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, md5(col("p").cast("binary")).asc)
        .limit(1)
        .collect()
      if (retiring != null) { retiring.unpersist(); retiring = null }
      require(best.nonEmpty, s"corpus exhausted after $k merges; lower `rounds`")
      val pair = best(0).getString(0)
      learned += LearnedMerge((k + 1).toLong, pair, best(0).getLong(1))
      chain = replace(chain, lit(pair), lit(pair.replace(" ", "")))
      depth += 1
      if (depth >= collapseEvery && k + 1 < rounds) {
        retiring = base
        base = base.select(chain.as("mg"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        chain = col("mg")
        depth = 0
      }
      k += 1
    }
    if (retiring != null) retiring.unpersist()
    base.unpersist()
    learned.result().toDF()
  }

  /** The same training loop as DuckDB SQL, one CTE chain per round —
    * MATERIALIZED, since each round's corpus feeds both the next pair
    * count and the next rewrite.
    */
  private[graft] def oracleTrainSql(textCol: String, rounds: Int): String = {
    val spelled =
      s"array_to_string(list_transform(range(length(replace($textCol, ' ', '▁'))), " +
        s"i -> substr(replace($textCol, ' ', '▁'), CAST(i + 1 AS INT), 1)), ' ')"
    val roundsSql = (1 to rounds).map { k =>
      s"""p$k AS MATERIALIZED (SELECT p, count(*)::BIGINT AS cnt FROM (
         |    SELECT unnest(list_transform(range(len(string_split(mg, ' ')) - 1),
         |      i -> string_split(mg, ' ')[CAST(i + 1 AS INT)] || ' ' ||
         |           string_split(mg, ' ')[CAST(i + 2 AS INT)])) AS p
         |    FROM c${k - 1} WHERE length(mg) > 0) GROUP BY p),
         |b$k AS MATERIALIZED (SELECT p, cnt FROM p$k ORDER BY cnt DESC, md5(p) ASC LIMIT 1),
         |c$k AS MATERIALIZED (SELECT replace(mg, (SELECT p FROM b$k),
         |    replace((SELECT p FROM b$k), ' ', '')) AS mg FROM c${k - 1})""".stripMargin
    }.mkString(",\n")
    val unions = (1 to rounds)
      .map(k => s"SELECT ${k}::BIGINT AS rank, p AS pair, cnt FROM b$k").mkString("\nUNION ALL\n")
    s"""WITH d AS (SELECT $textCol FROM documents
       |           WHERE doc_id IS NOT NULL AND doc_id >= 0 AND $textCol IS NOT NULL),
       |c0 AS MATERIALIZED (SELECT $spelled AS mg FROM d),
       |$roundsSql
       |$unions""".stripMargin
  }

  final case class BpeStats(doc_id: Long, n_chars: Long, n_tokens: Long, checksum: Long)

  /** Per-document subword statistics: codepoint count, merged token
    * count, and the base-31 checksum over the merged symbol stream
    * (UTF-8 bytes of the space-joined tokens) — one drifted merge
    * anywhere in a document changes the stream and fails the hash.
    */
  def bpeStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Dataset[BpeStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0 && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val merged = if (text.isEmpty) "" else applyMerges(spell(text))
        val nTokens = if (text.isEmpty) 0L else merged.count(_ == ' ') + 1L
        var c = 0L
        merged.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
        BpeStats(id, text.codePointCount(0, text.length).toLong, nTokens, c)
      }
  }

  /** The DuckDB expression tree for the same tokenizer, built from the
    * SAME merge table so the two engines cannot drift: spell via
    * substr-per-codepoint, then the nested replace() chain.
    */
  private[graft] def oracleMergedExpr(textCol: String): String = {
    val spelled =
      s"array_to_string(list_transform(range(length(replace($textCol, ' ', '▁'))), " +
        s"i -> substr(replace($textCol, ' ', '▁'), CAST(i + 1 AS INT), 1)), ' ')"
    Merges.foldLeft(spelled) { case (acc, (a, b)) =>
      val from = (a + " " + b).replace("'", "''")
      val to = (a + b).replace("'", "''")
      s"replace($acc, '$from', '$to')"
    }
  }
}
