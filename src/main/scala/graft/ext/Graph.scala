package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** ======== Link-graph analytics: fixed-point PageRank ========
  *
  * Crawl pipelines rank hosts by link authority (PageRank over the host
  * graph) and use the score as a document-quality prior. This module
  * implements power-iteration PageRank in EXACT fixed-point integer
  * arithmetic — scores are scaled BIGINTs, every per-edge contribution
  * is a floor division `pr(src) DIV outdeg(src)`, and per-node sums are
  * integer additions, which are order-independent — so the result is
  * bit-identical on any engine, any partitioning, any reduce order, and
  * the DuckDB oracle replays all iterations exactly. (Float PageRank
  * cannot be oracled bitwise: cross-partition double sums reorder. The
  * deliberate fixed-point divergence from textbook PageRank: each floor
  * division sheds < 1 scale unit — at SCALE = 10^12 the relative error
  * is ~1e-10 per term — and dangling-node mass is dropped rather than
  * redistributed, both documented invariants.)
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * graph path; north-star LLM-pipeline scope.
  *
  * 100 TB shape: the textbook distributed formulation — one shuffle per
  * iteration (contributions grouped by destination) plus one broadcast-
  * size join with the out-degree relation; per-round results are
  * persisted and lineage-cut (the [[Clusters]] pattern — the plan stays
  * constant-size per round instead of doubling), previous rounds
  * unpersisted. Edges partition by src once and are reused every
  * iteration.
  */
object Graph {

  /** Deterministic host-graph FIXTURE over a document corpus: each doc
    * contributes one link `doc_id mod nHosts -> md5(doc_id) mod nHosts`
    * (the md5 makes the destination both well-mixed and SQL-replayable),
    * self-loops dropped, multi-edges aggregated into weights.
    */
  def hostEdges(docs: DataFrame, nHosts: Int = 64, idCol: String = "doc_id"): DataFrame =
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(
        (col(idCol) % nHosts).cast("long").as("src"),
        (expr(s"conv(substring(md5(cast($idCol AS STRING)), 1, 6), 16, 10)").cast("long") % nHosts)
          .as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("weight"))

  /** Fixed-point power iteration over a weighted edge list (`src`, `dst`,
    * `weight`). All nodes appearing on either side form the universe;
    * every node holds `SCALE / n` initially and each round becomes
    *
    *   pr'(v) = (15 * SCALE) DIV (100 * n)
    *          + (85 * sum over in-edges(w * (pr(src) DIV outdeg(src)))) DIV 100
    *
    * with `outdeg` the weighted out-degree — integer arithmetic
    * throughout, see the object scaladoc for the exactness argument.
    */
  /** Fixed-point HITS (hubs & authorities) over the same weighted edge
    * list — the mutual-reinforcement companion to [[pagerank]]: each
    * round `auth'(v) = Σ_in w·hub(src)` then `hub'(v) = Σ_out w·auth'(dst)`,
    * each rescaled to `Σ = scale` with one integer floor division per
    * node (`x · scale DIV Σx` — the normalization every HITS needs,
    * made order-free by integer arithmetic so the oracle replays it).
    * The per-round Σ is a single bounded driver scalar (the [[Clusters]]
    * convergence-check pattern). Keep `scale` modest (default 10^6):
    * pre-normalization values reach `Σw · scale` and the rescale
    * multiplies by `scale` again — 10^6 keeps the worst case far inside
    * a BIGINT for any graph this side of 10^6-weighted-degree.
    */
  def hits(edges: DataFrame, iterations: Int = 8, scale: Long = 1000000L,
      driverEdgeThreshold: Int = 200000): DataFrame = {
    val spark = edges.sparkSession
    def cutLineage(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)
    val e = edges
      .select(col("src").cast("long"), col("dst").cast("long"), col("weight").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // small-graph fast path (the [[Clusters]] threshold pattern): an
    // 8-round × 2-phase distributed iteration is ~40 scheduled jobs — for
    // a graph that fits on the driver, the SAME integer recurrence runs
    // in microseconds. Exactness is not at stake (integer arithmetic is
    // order-free); GraphSpec pins both paths equal on the same graph.
    if (driverEdgeThreshold > 0 && e.count() <= driverEdgeThreshold) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
      val bySrc = es.groupBy(_._1)
      val byDst = es.groupBy(_._2)
      def rescale(m: Map[Long, Long]): Map[Long, Long] = {
        val s = m.values.sum
        if (s == 0) m else m.map { case (k, v) => k -> (v * scale) / s }
      }
      var hub = nodes.map(_ -> scale).toMap
      var auth = nodes.map(_ -> 0L).toMap
      var it = 0
      while (it < iterations) {
        auth = rescale(nodes.map { h =>
          h -> byDst.getOrElse(h, Array.empty[(Long, Long, Long)])
            .map { case (s, _, w) => w * hub(s) }.sum
        }.toMap)
        hub = rescale(nodes.map { h =>
          h -> bySrc.getOrElse(h, Array.empty[(Long, Long, Long)])
            .map { case (_, d, w) => w * auth(d) }.sum
        }.toMap)
        it += 1
      }
      e.unpersist()
      import spark.implicits._
      return nodes.map(h => (h, hub(h), auth(h))).toSeq.toDF("h", "hub", "auth")
    }
    val nodes = e.select(col("src").as("h")).union(e.select(col("dst").as("h")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    def rescale(scores: DataFrame, colName: String): DataFrame = {
      val total = scores.agg(sum(colName)).head.getLong(0)
      if (total == 0L) scores // edgeless corner: nothing to normalize
      else scores.select(col("h"), expr(s"($colName * ${scale}L) DIV ${total}L").as(colName))
    }
    var hub = cutLineage(nodes.select(col("h"), lit(scale).as("hub")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var auth: DataFrame = cutLineage(nodes.select(col("h"), lit(0L).as("auth")))
    var it = 0
    while (it < iterations) {
      val authRaw = nodes.join(
        e.join(hub.withColumnRenamed("h", "src"), "src")
          .groupBy(col("dst").as("h")).agg(sum(col("weight") * col("hub")).as("auth")),
        Seq("h"), "left").select(col("h"), coalesce(col("auth"), lit(0L)).as("auth"))
      val prevAuth = auth
      auth = cutLineage(rescale(authRaw, "auth")).persist(StorageLevel.MEMORY_AND_DISK)
      auth.count()
      if (it > 0) prevAuth.unpersist() // round 0's auth was never persisted
      val hubRaw = nodes.join(
        e.join(auth.withColumnRenamed("h", "dst"), "dst")
          .groupBy(col("src").as("h")).agg(sum(col("weight") * col("auth")).as("hub")),
        Seq("h"), "left").select(col("h"), coalesce(col("hub"), lit(0L)).as("hub"))
      val nextHub = cutLineage(rescale(hubRaw, "hub")).persist(StorageLevel.MEMORY_AND_DISK)
      nextHub.count()
      hub.unpersist()
      hub = nextHub
      it += 1
    }
    hub.join(auth, "h").select(col("h"), col("hub"), col("auth"))
  }

  def pagerank(edges: DataFrame, iterations: Int = 10, scale: Long = 1000000000000L,
      driverEdgeThreshold: Int = 200000): DataFrame = {
    val spark = edges.sparkSession
    def cutLineage(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)
    val e = edges
      .select(col("src").cast("long"), col("dst").cast("long"), col("weight").cast("long"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // small-graph fast path — same recurrence on the driver (see [[hits]])
    if (driverEdgeThreshold > 0 && e.count() <= driverEdgeThreshold) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
      val n = nodes.length.toLong
      val outd = es.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
      val byDst = es.groupBy(_._2)
      val base = (15L * scale) / (100L * n)
      var pr = nodes.map(_ -> scale / n).toMap
      var it = 0
      while (it < iterations) {
        pr = nodes.map { h =>
          h -> (base + (85L * byDst.getOrElse(h, Array.empty[(Long, Long, Long)])
            .map { case (s, _, w) => w * (pr(s) / outd(s)) }.sum) / 100L)
        }.toMap
        it += 1
      }
      e.unpersist()
      import spark.implicits._
      return nodes.map(h => (h, pr(h))).toSeq.toDF("h", "pr")
    }
    val outd = e.groupBy("src").agg(sum("weight").as("od")).persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("h")).union(e.select(col("dst").as("h")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val base = (15L * scale) / (100L * n)
    var pr = cutLineage(nodes.select(col("h"), lit(scale / n).as("pr")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var it = 0
    while (it < iterations) {
      val inc = e
        .join(pr.withColumnRenamed("h", "src"), "src")
        .join(outd, "src")
        .select(col("dst").as("h"), (col("weight") * expr("pr DIV od")).as("c"))
        .groupBy("h").agg(sum("c").as("inc"))
      val next = cutLineage(
        nodes
          .join(inc, Seq("h"), "left")
          .select(col("h"),
            (lit(base) + expr(s"(85 * coalesce(inc, 0L)) DIV 100")).as("pr")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before unpersisting the round it reads
      pr.unpersist()
      pr = next
      it += 1
    }
    pr
  }

  /** Exact per-node triangle counts + local clustering coefficient over
    * an undirected view of the edge list — the third classic web-graph
    * signal next to [[pagerank]] and [[hits]] (a host whose neighbors
    * interlink is a community hub; one whose neighbors never meet is a
    * link farm).
    *
    * Algorithm: DEGREE-ORDERED ORIENTATION (the node-iterator++ /
    * Schank–Wagner formulation). Undirected-ify to canonical `u < v`
    * pairs, then orient every edge from the endpoint that is SMALLER
    * under the total order `(degree, node)`. Every triangle then has
    * exactly one vertex with two out-edges under this orientation, so
    * enumerating wedges `a→b, a→c` (with `b` before `c` in the same
    * order) and probing the closing oriented edge `b→c` counts each
    * triangle exactly once — and the oriented out-degree is bounded by
    * O(√m), which bounds the wedge relation by Σ d⁺(v)² — the term that
    * makes naive wedge enumeration explode on power-law graphs (a
    * 10⁶-degree hub contributes 10¹² unordered wedges but only O(m)
    * oriented ones). 100 TB shape: three shuffles (distinct, degree,
    * wedge join), no iteration, no driver state.
    *
    * `lcc = 2·tri / (deg·(deg−1))` is the one IEEE division in the
    * output, applied to exact integers — bitwise portable, 0.0 for
    * degree < 2. No reference citation — the reference has no graph
    * path; north-star scope.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges
      .filter(col("src") =!= col("dst"))
      .select(
        least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("u").as("h")).unionAll(und.select(col("v").as("h")))
      .groupBy("h").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // orient from lower (deg, h) to higher; carry the head's order key for the wedge sort
    val ann = und
      .join(deg.select(col("h").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("h").as("v"), col("deg").as("dv")), "v")
    val uFirst = (col("du") < col("dv")) || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = ann.select(
      when(uFirst, col("u")).otherwise(col("v")).as("a"),
      when(uFirst, col("v")).otherwise(col("u")).as("b"),
      when(uFirst, col("dv")).otherwise(col("du")).as("db"))
    val x = oriented.as("x")
    val y = oriented.as("y")
    val wedges = x.join(y,
      col("x.a") === col("y.a") &&
        (col("x.db") < col("y.db") || (col("x.db") === col("y.db") && col("x.b") < col("y.b"))))
      .select(col("x.a").as("ta"), col("x.b").as("tb"), col("y.b").as("tc"))
    // the wedge's (tb, tc) ordering matches the orientation, so the closing
    // edge — if the triangle exists — is stored exactly as tb→tc
    val tris = wedges.join(
      oriented.select(col("a").as("tb"), col("b").as("tc")), Seq("tb", "tc"))
    val triCnt = tris
      .select(explode(array(col("ta"), col("tb"), col("tc"))).as("h"))
      .groupBy("h").agg(count(lit(1)).as("tri"))
    val out = deg.join(triCnt, Seq("h"), "left")
      .select(
        col("h").as("host"),
        col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(lit(2.0) * coalesce(col("tri"), lit(0L)) / (col("deg") * (col("deg") - 1)))
          .as("lcc"))
    out
  }
}
