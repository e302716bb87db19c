package graft.ext

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EvaluationSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def scored(rows: (String, Double, Boolean)*): DataFrame = {
    import spark.implicits._
    rows.toDF("source", "score", "label")
  }

  test("groupAuc: perfect separation 1.0, inverted 0.0, hand-computed middle case") {
    val d = scored(
      // g1: all positives above all negatives -> AUC 1
      ("g1", 0.9, true), ("g1", 0.8, true), ("g1", 0.2, false), ("g1", 0.1, false),
      // g2: all positives below all negatives -> AUC 0
      ("g2", 0.1, true), ("g2", 0.2, true), ("g2", 0.8, false), ("g2", 0.9, false),
      // g3: scores 1,2,3,4 labels +,-,+,- -> ranks of pos {1,3}; R+ = 4
      // AUC = (4 - 2*3/2) / (2*2) = 1/4
      ("g3", 1.0, true), ("g3", 2.0, false), ("g3", 3.0, true), ("g3", 4.0, false))
    val out = Evaluation.groupAuc(d).collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("g1") == 1.0)
    assert(out("g2") == 0.0)
    assert(out("g3") == 0.25)
  }

  test("groupAuc: constant score is exactly 0.5 via midranks; one-class groups drop") {
    val d = scored(
      ("c", 5.0, true), ("c", 5.0, true), ("c", 5.0, false), ("c", 5.0, false), ("c", 5.0, false),
      ("onlypos", 1.0, true), ("onlypos", 2.0, true),
      ("onlyneg", 1.0, false))
    val rows = Evaluation.groupAuc(d).collect()
    assert(rows.map(_.getString(0)).toSet == Set("c"), "one-class groups must be dropped")
    assert(rows.head.getDouble(3) == 0.5, "all-tied scores must midrank to exactly 0.5")
  }

  test("groupAuc: partial ties use midranks (hand-computed)") {
    // scores 1, 2, 2, 3 with labels -, +, -, +
    // midranks: 1 -> 1; the two 2s -> 2.5 each; 3 -> 4
    // R+ = 2.5 + 4 = 6.5 ; AUC = (6.5 - 3) / 4 = 0.875
    val d = scored(("t", 1.0, false), ("t", 2.0, true), ("t", 2.0, false), ("t", 3.0, true))
    assert(Evaluation.groupAuc(d).collect().head.getDouble(3) == 0.875)
  }

  test("calibrationBins: bin assignment clamps, counts and means are exact") {
    val d = scored(
      ("s", -12.3, false), // clamps to bin -8
      ("s", -0.5, false),  // bin -1
      ("s", 0.25, true),   // bin 0
      ("s", 0.75, true),   // bin 0
      ("s", 9.9, true))    // clamps to bin 7
    val out = Evaluation.calibrationBins(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(-8L, -1L, 0L, 7L))
    val (n0, p0, acc0, conf0) = out(0L)
    assert(n0 == 2 && p0 == 2 && acc0 == 1.0)
    assert(conf0 == 0.5, "mean of 0.25 and 0.75 in exact micro-units")
    assert(out(-8L)._1 == 1 && out(7L)._1 == 1)
    val gap = Evaluation.calibrationBins(d).collect().find(_.getLong(0) == 0L).get.getDouble(5)
    assert(gap == 0.5, "|acc - conf| = |1.0 - 0.5|")
  }
}
