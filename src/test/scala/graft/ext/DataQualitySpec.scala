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

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("manifest: equals the driver-side chained fold; corruption localizes to one bucket") {
    import spark.implicits._
    val rows = (0L until 40L).map(i => (i, s"document body $i"))
    val df = rows.toDF("doc_id", "text")
    val got = DataQuality.manifest(df, buckets = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // driver reference: same leaves, same pinned fold
    val byBucket = rows.groupBy(_._1 % 8)
    val wantL0 = byBucket.map { case (bkt, g) =>
      val digest = g.sortBy(_._1).map(r => md5hex(r._2))
        .foldLeft("")((a, h) => md5hex(a + h))
      (0L, bkt) -> (g.size.toLong, digest)
    }
    val root = wantL0.toSeq.sortBy(_._1._2).map(_._2._2).foldLeft("")((a, h) => md5hex(a + h))
    assert(got.filterKeys(_._1 == 0L).toMap == wantL0)
    assert(got((1L, -1L)) == (40L, root))
    // partition invariance
    val again = DataQuality.manifest(df.repartition(11), buckets = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(again == got)
    // flip ONE doc: exactly its bucket digest and the root change
    val tampered = rows.map { case (i, t) => (i, if (i == 13L) t + "!" else t) }.toDF("doc_id", "text")
    val t = DataQuality.manifest(tampered, buckets = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    val changed = got.keySet.filter(k => got(k) != t(k))
    assert(changed == Set((0L, 13L % 8), (1L, -1L)), s"changed: $changed")
  }

  test("manifestBuckets sizing rule; localization holds at any sized count") {
    // next power of two >= n / docsPerBucket, floor 1
    assert(DataQuality.manifestBuckets(0L, 10L) == 1)
    assert(DataQuality.manifestBuckets(10L, 10L) == 1)
    assert(DataQuality.manifestBuckets(11L, 10L) == 2)
    assert(DataQuality.manifestBuckets(95L, 10L) == 16)
    assert(DataQuality.manifestBuckets(100000000L) == 128) // 100M docs @ 1M/bucket
    import spark.implicits._
    val rows = (0L until 40L).map(i => (i, s"document body $i"))
    val df = rows.toDF("doc_id", "text")
    // sized from the corpus (40 docs @ 3/bucket -> 16), NOT the default 64:
    // the manifest identity changes with the count, localization does not
    val b = DataQuality.manifestBuckets(40L, 3L)
    assert(b == 16)
    val got = DataQuality.manifest(df, buckets = b).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(got.count(_._1._1 == 0L) == 16 && got.contains((1L, -1L)))
    val tampered = rows.map { case (i, t) => (i, if (i == 29L) t + "!" else t) }.toDF("doc_id", "text")
    val t = DataQuality.manifest(tampered, buckets = b).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    val changed = got.keySet.filter(k => got(k) != t(k))
    assert(changed == Set((0L, 29L % b), (1L, -1L)), s"changed: $changed")
  }

  test("chiSquare: hand-computed 2x2 with a zero cell; nulls excluded everywhere") {
    import spark.implicits._
    // x: 1 p, 1 q; y: 2 p, 0 q  (plus a null-category row that must not count)
    val df = Seq(
      Some("x") -> Some("p"), Some("x") -> Some("q"),
      Some("y") -> Some("p"), Some("y") -> Some("p"),
      None -> Some("p"), Some("x") -> None
    ).toDF("lang", "source")
    val got = DataQuality.chiSquare(df, "lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
      .toMap
    assert(got.size == 4, "full grid incl. the zero cell")
    assert(got(("x", "p")) == (1L, 2L, 3L, 4L, 1.5, (1.0 - 1.5) * (1.0 - 1.5) / 1.5))
    assert(got(("x", "q")) == (1L, 2L, 1L, 4L, 0.5, (1.0 - 0.5) * (1.0 - 0.5) / 0.5))
    assert(got(("y", "p")) == (2L, 2L, 3L, 4L, 1.5, (2.0 - 1.5) * (2.0 - 1.5) / 1.5))
    // the zero cell contributes its whole expected mass
    assert(got(("y", "q")) == (0L, 2L, 1L, 4L, 0.5, (0.0 - 0.5) * (0.0 - 0.5) / 0.5))
    // full-independence corner: uniform table -> all contributions exactly 0
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("lang", "source")
    val z = DataQuality.chiSquare(indep, "lang", "source").collect()
    assert(z.forall(r => r.getDouble(7) == 0.0))
  }
}
