package graft.ext

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def kept(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("pair-drop vs clustered semantics diverge on a similarity chain") {
    // docs 1 and 3 are each near-dups of 5 (jaccard 38/78 ~ 0.487) but share
    // nothing with each other: a 1-5, 3-5 "chain" through 5
    val a = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val b = (1 to 40).map(i => s"beta$i").mkString(" ")
    val d = docs(1L -> a, 3L -> b, 5L -> (a + " " + b))
    val p = CurationPipeline.Params(jaccardThreshold = 0.4)
    // pair-drop removes the larger side of each pair: 5 dies, 1 and 3 stay
    assert(kept(CurationPipeline.curate(d, p, materialize = false)) == Set(1L, 3L))
    // clustering keeps ONE representative of the transitive group {1,3,5}
    assert(kept(CurationPipeline.curateClustered(d, p, materialize = false)) == Set(1L))
  }

  test("exact duplicates collapse to the smallest id in both variants") {
    val t = (1 to 40).map(i => s"word$i").mkString(" ")
    val u = (100 to 140).map(i => s"other$i").mkString(" ")
    val d = docs(2L -> t, 7L -> t, 4L -> u)
    assert(kept(CurationPipeline.curate(d, materialize = false)) == Set(2L, 4L))
    assert(kept(CurationPipeline.curateClustered(d, materialize = false)) == Set(2L, 4L))
  }

  test("quality gate drops short and repetitive docs") {
    val good = (1 to 40).map(i => s"tok$i").mkString(" ")
    val short = "too short"
    val repetitive = Array.fill(60)("same").mkString(" ")
    val d = docs(1L -> good, 2L -> short, 3L -> repetitive)
    assert(kept(CurationPipeline.curate(d, materialize = false)) == Set(1L))
  }
}
