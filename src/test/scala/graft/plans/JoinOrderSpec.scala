package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class JoinOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("the 4-chain admits exactly the 8 connected left-deep orders") {
    val got = JoinOrder.ConnectedOrders.map(_.mkString(",")).toSet
    assert(got == Set(
      "nation,customer,orders,lineitem",
      "customer,nation,orders,lineitem",
      "customer,orders,nation,lineitem",
      "customer,orders,lineitem,nation",
      "orders,customer,nation,lineitem",
      "orders,customer,lineitem,nation",
      "orders,lineitem,customer,nation",
      "lineitem,orders,customer,nation"))
    // every prefix is connected: no order starts with a cross product
    assert(!got.exists(_.startsWith("nation,orders")))
    assert(!got.exists(_.startsWith("lineitem,customer")))
  }

  test("costOf follows the Selinger recurrence with pinned floor order") {
    val card = Map("nation" -> 10L, "customer" -> 100L, "orders" -> 1000L, "lineitem" -> 7000L)
    val d = Map(
      ("nation", "nationkey") -> 10L, ("customer", "nationkey") -> 10L,
      ("customer", "custkey") -> 100L, ("orders", "custkey") -> 90L,
      ("orders", "orderkey") -> 1000L, ("lineitem", "orderkey") -> 995L)
    // hand-walk n,c,o,l: est 10 -> 10*100/10=100 -> 100*1000/100=1000
    //   -> 1000*7000/1000=7000; cost 100+1000+7000
    assert(JoinOrder.costOf(Seq("nation", "customer", "orders", "lineitem"), card, d)
      == (8100L, 7000L))
    // l,o,c,n: 7000 -> 7000*1000/1000=7000 -> 7000*100/100=7000 -> *10/10
    assert(JoinOrder.costOf(Seq("lineitem", "orders", "customer", "nation"), card, d)
      == (21000L, 7000L))
    // floor order matters: 7*3/2 = 10 stepwise, not 10.5 rounded
    val c2 = Map("nation" -> 7L, "customer" -> 3L, "orders" -> 1L, "lineitem" -> 1L)
    val d2 = d ++ Map(("nation", "nationkey") -> 2L, ("customer", "nationkey") -> 1L,
      ("customer", "custkey") -> 1L, ("orders", "custkey") -> 1L,
      ("orders", "orderkey") -> 1L, ("lineitem", "orderkey") -> 1L)
    val (cost, _) = JoinOrder.costOf(Seq("nation", "customer", "orders", "lineitem"), c2, d2)
    assert(cost == 10L + 10L + 10L, "est2 = floor(21/2) = 10 then multiplies by 1")
  }

  test("enumerate derives stats from the data and the cheapest order starts small") {
    import spark.implicits._
    val nation = (0L until 5L).map(i => (i, s"N$i")).toDF("n_nationkey", "n_name")
    val customer = (0L until 50L).map(i => (i, i % 5)).toDF("c_custkey", "c_nationkey")
    val orders = (0L until 500L).map(i => (i, i % 50)).toDF("o_orderkey", "o_custkey")
    val lineitem = (0L until 2000L).map(i => (i % 500, i)).toDF("l_orderkey", "l_linenumber")
    val got = JoinOrder.enumerate(spark, Map(
      "nation" -> nation, "customer" -> customer,
      "orders" -> orders, "lineitem" -> lineitem))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == 8)
    // FK chain: every full join has the same final cardinality |lineitem|
    assert(got.values.map(_._2).toSet == Set(2000L))
    // the small-first order n.c.o.l beats the big-first l.o.c.n under C_out
    assert(got("n.c.o.l")._1 < got("l.o.c.n")._1)
    // hand-check n.c.o.l: 5 -> 5*50/5=50 -> 50*500/50=500 -> 500*2000/500=2000
    assert(got("n.c.o.l") == (50L + 500L + 2000L, 2000L))
  }
}
