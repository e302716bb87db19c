package graft.ext

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RobotsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def urls(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "host", "path")
  }

  private def rules(rows: (String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("host", "rule_type", "prefix")
  }

  test("evaluate: longest match wins, ties go to allow, no match allows") {
    val r = rules(
      ("h.io", "disallow", "/private"),
      ("h.io", "allow", "/private/ok"),
      ("h.io", "disallow", "/priv"), // shorter than /private: must lose on /private/*
      ("h.io", "allow", "/tie"),
      ("h.io", "disallow", "/tie")) // exact tie: allow wins
    val got = Robots.evaluate(urls(
      (1L, "h.io", "/private/secret"), // /private (disallow) beats /priv
      (2L, "h.io", "/private/ok/file"), // deeper allow overrides
      (3L, "h.io", "/public/page"), // nothing matches
      (4L, "h.io", "/tie/x")), r) // equal-length allow + disallow
      .collect().map(x => x.getLong(0) -> ((x.getLong(3), x.getString(4)))).toMap
    assert(got(1L) == ((8L, "disallow")))
    assert(got(2L) == ((11L, "allow")))
    assert(got(3L) == ((0L, "allow")))
    assert(got(4L) == ((4L, "allow")))
  }

  test("evaluate: hosts are isolated; a rule never leaks across hosts") {
    val r = rules(("a.io", "disallow", "/x"))
    val got = Robots.evaluate(urls((1L, "a.io", "/x/1"), (2L, "b.io", "/x/1")), r)
      .collect().map(x => x.getLong(0) -> x.getString(4)).toMap
    assert(got(1L) == "disallow" && got(2L) == "allow")
  }

  test("rulesFor: deterministic, three rules per host, allow nested under the first disallow") {
    import spark.implicits._
    val hosts = Seq("alpha.example.com", "beta.testsite.io").toDF("host")
    val r1 = Robots.rulesFor(hosts).collect().toSet
    val r2 = Robots.rulesFor(hosts).collect().toSet
    assert(r1 == r2)
    Seq("alpha.example.com", "beta.testsite.io").foreach { h =>
      val hr = r1.filter(_.host == h)
      assert(hr.size == 3)
      val dis = hr.filter(_.rule_type == "disallow").map(_.prefix)
      val all = hr.filter(_.rule_type == "allow").map(_.prefix)
      assert(all.size == 1 && dis.size == 2)
      assert(all.head.startsWith(dis.minBy(_.length)), "allow override nests under the 1-segment disallow")
    }
  }

  test("end-to-end over the URL fixture: every decision arm occurs and is partition-stable") {
    import spark.implicits._
    val docs = (0L until 300L).toDF("doc_id")
    val u = Url.normalize(Url.attachUrls(docs)).toDF().select("doc_id", "host", "path")
    val r = Robots.rulesFor(u).toDF()
    val out = Robots.evaluate(u, r).collect()
      .map(x => (x.getLong(0), x.getLong(3), x.getString(4)))
    assert(out.length == 300)
    assert(out.exists(_._3 == "disallow") && out.exists(_._3 == "allow"))
    assert(out.exists(o => o._2 == 0L && o._3 == "allow"), "no-match arm")
    assert(out.exists(o => o._2 > 0L && o._3 == "allow"), "allow-override arm")
    val again = Robots.evaluate(u.repartition(13), r).collect()
      .map(x => (x.getLong(0), x.getLong(3), x.getString(4)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }
}
