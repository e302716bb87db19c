package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ======== Cost-based join-order enumeration (System R style) ========
  *
  * The optimizer's core decision, run as a first-class query: enumerate
  * every LEFT-DEEP, cross-product-free join order of the TPC-H chain
  *
  *   nation —(nationkey)— customer —(custkey)— orders —(orderkey)— lineitem
  *
  * and cost each with the Selinger/System R model (Selinger et al.,
  * SIGMOD 1979): C_out — the sum of intermediate result cardinalities —
  * under the uniformity/independence estimate
  *
  *   |P ⋈_k R| = ⌊ |P| · |R| / max(d_P(k), d_R(k)) ⌋
  *
  * where the distinct counts d come from the DATA (exact count/
  * count-distinct aggregates — the statistics a real optimizer keeps in
  * its catalog), and the floor division order is pinned so every cost
  * is an exact BIGINT both engines reproduce bit-for-bit. A chain of 4
  * relations admits exactly 8 connected left-deep orders (each prefix
  * must stay connected — cross products excluded, as System R does);
  * all 8 are emitted with their estimated cost and final cardinality,
  * so the gate grades the whole cost surface, not just the argmin.
  *
  * Scale shape: the statistics are 4 counts + 4 distinct-key counts —
  * one bounded aggregate per relation (distinct counts shuffle the key
  * column once each); the enumeration itself is driver arithmetic over
  * 8 orders. This is exactly how a production optimizer scales: stats
  * collection is the data-sized work, planning is O(orders).
  */
object JoinOrder {

  /** The chain's relations, in canonical order. */
  val Relations = Seq("nation", "customer", "orders", "lineitem")

  /** Edges: (left relation, right relation, key name). */
  val Edges = Seq(
    ("nation", "customer", "nationkey"),
    ("customer", "orders", "custkey"),
    ("orders", "lineitem", "orderkey"))

  /** (relation, key) -> stat name of its distinct count. */
  val DistinctStats = Seq(
    ("nation", "nationkey"), ("customer", "nationkey"),
    ("customer", "custkey"), ("orders", "custkey"),
    ("orders", "orderkey"), ("lineitem", "orderkey"))

  /** All connected left-deep orders of the chain (prefix connectivity —
    * no cross products). For a 4-chain: exactly 8.
    */
  val ConnectedOrders: Seq[Seq[String]] = {
    val adj = Edges.flatMap { case (a, b, _) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def extend(prefix: Seq[String]): Seq[Seq[String]] =
      if (prefix.length == Relations.length) Seq(prefix)
      else Relations.filterNot(prefix.contains)
        .filter(r => prefix.exists(p => adj(p).contains(r)))
        .flatMap(r => extend(prefix :+ r))
    Relations.flatMap(r => extend(Seq(r)))
  }

  /** Per-order join steps after the first relation: (relation joined in,
    * its anchor already in the prefix, the join key) — shared by
    * [[costOf]] and the oracle generator so the two cannot drift.
    */
  def stepPlan(order: Seq[String]): Seq[(String, String, String)] =
    order.tail.zipWithIndex.map { case (r, i) =>
      val prefix = order.take(i + 1)
      val anchor = prefix.find(p => Edges.exists { case (x, y, _) =>
        (x == p && y == r) || (x == r && y == p)
      }).get
      (r, anchor, edgeKey(anchor, r))
    }

  private def edgeKey(a: String, b: String): String =
    Edges.collectFirst {
      case (x, y, k) if (x == a && y == b) || (x == b && y == a) => k
    }.get

  /** Cost one order given the stats maps; mirrors the oracle's floor
    * arithmetic exactly. Returns (cost, finalRows).
    */
  def costOf(order: Seq[String], card: Map[String, Long],
      distinct: Map[(String, String), Long]): (Long, Long) = {
    var est = card(order.head)
    var cost = 0L
    stepPlan(order).foreach { case (r, anchor, k) =>
      val denom = math.max(distinct((anchor, k)), distinct((r, k)))
      est = est * card(r) / denom
      cost += est
    }
    (cost, est)
  }

  /** Collect the exact stats and emit all connected left-deep orders:
    * (ord, est_cost, est_rows). `tables` maps relation name -> frame
    * with the standard TPC-H prefixed columns (n_nationkey, ...).
    *
    * Stats gathering (round 17, optimization guide §2.6): the previous
    * form ran 10 sequential driver jobs (4 counts + 6 countDistincts);
    * each relation's cardinality and its key distinct-counts now ride
    * ONE aggregate, and the 4 per-table aggregates run as concurrent
    * jobs from a small driver pool — actions are only sequential because
    * the driver calls them sequentially. Exact counts either way, so the
    * emitted costs are bit-identical.
    */
  def enumerate(spark: SparkSession, tables: Map[String, DataFrame]): DataFrame = {
    val prefix = Map("nation" -> "n", "customer" -> "c", "orders" -> "o", "lineitem" -> "l")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(Relations.size)
    val (card, distinct) =
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        val perTable = Relations.map { r =>
          val keys = DistinctStats.collect { case (`r`, k) => k }
          r -> scala.concurrent.Future {
            spark.sparkContext.setJobDescription(s"join_order_dp: stats($r)")
            val aggs = count(lit(1)).as("__n") +:
              keys.map(k => countDistinct(col(s"${prefix(r)}_$k")).as(k))
            val row = tables(r).agg(aggs.head, aggs.tail: _*).head()
            (row.getLong(0), keys.zipWithIndex.map { case (k, i) => k -> row.getLong(i + 1) }.toMap)
          }
        }
        val rows = perTable.map { case (r, f) =>
          r -> scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf)
        }
        (rows.map { case (r, (n, _)) => r -> n }.toMap,
          rows.flatMap { case (r, (_, ds)) => ds.map { case (k, v) => (r, k) -> v } }.toMap)
      } finally pool.shutdown()
    val rows = ConnectedOrders.map { ord =>
      val (cost, fin) = costOf(ord, card, distinct)
      Row(ord.map(prefix).mkString("."), cost, fin)
    }
    val schema = StructType(Seq(
      StructField("ord", StringType), StructField("est_cost", LongType),
      StructField("est_rows", LongType)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }
}
