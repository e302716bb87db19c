package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import DataQuality._

  private def report(rules: Seq[Rule], tables: Map[String, org.apache.spark.sql.DataFrame]) =
    audit(tables, rules).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  private def child = {
    import spark.implicits._
    Seq((1L, Option(10L), 5.0), (2L, Option(10L), -1.0), (3L, None, 2.0),
      (2L, Option(99L), 0.5), (2L, Option(99L), 1.5))
      .toDF("id", "parent_id", "v")
  }

  private def parent = {
    import spark.implicits._
    Seq(10L, 11L).toDF("pid")
  }

  test("not_null counts null rows against the full table") {
    val got = report(Seq(NotNull("c", "parent_id")), Map("c" -> child))
    assert(got("not_null:c.parent_id") == ((1L, 5L, false)))
  }

  test("accepted scopes to non-null values (the dbt convention)") {
    val got = report(Seq(Accepted("c", "v", "v >= 0", "nonneg")), Map("c" -> child))
    assert(got("accepted:c.v:nonneg") == ((1L, 5L, false)))
  }

  test("unique reports excess rows over duplicated keys, ignoring null keys") {
    val got = report(
      Seq(Unique("c", Seq("id")), Unique("c", Seq("id", "parent_id"))),
      Map("c" -> child))
    // id: 1,2,3,2,2 -> key 2 has 3 rows -> 2 excess
    assert(got("unique:c.id") == ((2L, 5L, false)))
    // (id, parent_id) non-null rows: (1,10),(2,10),(2,99),(2,99) -> 1 excess
    assert(got("unique:c.id+parent_id") == ((1L, 4L, false)))
  }

  test("foreign key counts orphan ROWS, not distinct orphan keys") {
    val got = report(
      Seq(ForeignKey("c", "parent_id", "p", "pid")),
      Map("c" -> child, "p" -> parent))
    // parent_id 99 is orphaned and appears on 2 rows; nulls out of scope
    assert(got("fk:c.parent_id->p.pid") == ((2L, 4L, false)))
  }

  test("rules on the same table fuse into one scan; a clean table passes") {
    import spark.implicits._
    val clean = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val rep = audit(
      Map("t" -> clean),
      Seq(NotNull("t", "id"), NotNull("t", "v"), Accepted("t", "v", "v > 0", "pos"),
        Unique("t", Seq("id"))))
    assert(rep.collect().forall(_.getBoolean(3)))
    // the three scan rules share ONE aggregate over one scan of t
    val scans = rep.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Scan ExistingRDD"))
    assert(scans <= 3, s"expected fused scan rules, got $scans scans:\n$scans")
  }

  test("empty table: zero violations, zero totals, passes") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val got = report(
      Seq(NotNull("e", "id"), Unique("e", Seq("id")),
        ForeignKey("e", "id", "p", "pid")),
      Map("e" -> empty, "p" -> parent))
    assert(got.values.toSet == Set((0L, 0L, true)))
  }

  test("unknown table in a rule fails fast") {
    intercept[IllegalArgumentException] {
      audit(Map("a" -> parent), Seq(NotNull("b", "x")))
    }
  }
}
