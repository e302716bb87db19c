package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.core.PipelineConfig
import graft.model.{Baseline, WindowAggregate}

/** Truth table for the alert math — exact port check of
  * /root/reference/src/flinkarima.py:301-360.
  */
class AlertOpSpec extends AnyFunSuite {

  private val cfg = PipelineConfig() // z_thr=3.0, pct_thr=50.0, min_baseline=1.0

  private def baseline(
      cpu: Double,
      std: Double,
      nodeId: String = "n1",
      eventTime: Long = 1000L): Baseline =
    Baseline(nodeId, cpu, cpu, 100, eventTime, cpu, std, Some(cpu), Some(cpu))

  private def agg(cpu: Double, ts: Long = 2000L): WindowAggregate = WindowAggregate("n1", cpu, ts)

  test("no baseline for the key -> no alert (flinkarima.py:313-316)") {
    assert(AlertOp.check(cfg, agg(99.0), None).isEmpty)
  }

  test("within thresholds -> no alert") {
    // baseline 50, std 10: obs 60 -> z=1.0, pct=20% -> quiet
    assert(AlertOp.check(cfg, agg(60.0), Some(baseline(50.0, 10.0))).isEmpty)
  }

  test("z-gate fires and takes priority over pct (flinkarima.py:335-340)") {
    // baseline 50, std 5: obs 80 -> z=6.0, pct=60% -> both exceeded, z reason wins
    val a = AlertOp.check(cfg, agg(80.0), Some(baseline(50.0, 5.0))).get
    assert(a.alertReason.startsWith("z_score="))
    assert(a.zScore == 6.0)
    assert(a.pctDeviation == 60.0)
    assert(a.severity == "high") // |z| >= 2 * 3.0
    assert(a.alertType == "cpu_deviation")
  }

  test("pct-gate fires when z does not (large std)") {
    // baseline 50, std 100: obs 80 -> z=0.3, pct=60%
    val a = AlertOp.check(cfg, agg(80.0), Some(baseline(50.0, 100.0))).get
    assert(a.alertReason.startsWith("pct_deviation="))
    assert(a.severity == "medium")
  }

  test("min_baseline guard zeroes pct (flinkarima.py:324-326)") {
    // baseline 0.5 < 1.0: pct forced 0 -> no pct alert even at huge relative deviation
    val quiet = AlertOp.check(cfg, agg(1.4), Some(baseline(0.5, 0.0)))
    assert(quiet.isEmpty)
    // but z still applies when std > 0: obs 99, std 1 -> z = 98.5
    val a = AlertOp.check(cfg, agg(99.0), Some(baseline(0.5, 1.0))).get
    assert(a.pctDeviation == 0.0)
    assert(a.alertReason.startsWith("z_score="))
  }

  test("std == 0 guard zeroes z (flinkarima.py:327-329)") {
    // std 0: z forced 0; pct = 100% fires instead
    val a = AlertOp.check(cfg, agg(100.0), Some(baseline(50.0, 0.0))).get
    assert(a.zScore == 0.0)
    assert(a.alertReason.startsWith("pct_deviation="))
  }

  test("severity boundary: high iff |z| >= 2 * z_threshold (flinkarima.py:346)") {
    // std 10, baseline 50: obs 110 -> z = 6.0 exactly -> high
    assert(AlertOp.check(cfg, agg(110.0), Some(baseline(50.0, 10.0))).get.severity == "high")
    // obs 109 -> z = 5.9 -> medium
    assert(AlertOp.check(cfg, agg(109.0), Some(baseline(50.0, 10.0))).get.severity == "medium")
  }

  test("negative deviations alert symmetrically (abs gates)") {
    val a = AlertOp.check(cfg, agg(20.0), Some(baseline(50.0, 5.0))).get
    assert(a.zScore == -6.0)
    assert(a.severity == "high")
  }

  test("reason strings carry 2-decimal formatting like the reference (flinkarima.py:337,340)") {
    val a = AlertOp.check(cfg, agg(80.0), Some(baseline(50.0, 5.0))).get
    assert(a.alertReason == "z_score=6.00 exceeds threshold=3.0")
    val p = AlertOp.check(cfg, agg(80.0), Some(baseline(50.0, 100.0))).get
    assert(p.alertReason == "pct_deviation=60.00% exceeds threshold=50.0%")
  }
}
