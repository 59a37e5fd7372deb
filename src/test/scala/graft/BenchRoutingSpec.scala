package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays the documented contention scenarios against the extracted
  * verdict + routing logic (r15 verdict item 5 and the r15 advice on
  * wallRatio): the ratio-only IO-co-tenant run must auto-route away
  * from a quiet pinned record, a genuine regression must NOT be able
  * to dodge a non-quiet record, and a wallRatio that disagrees with a
  * quiet sharedSumRatio must demote to borderline, never bless quiet.
  */
class BenchRoutingSpec extends AnyFunSuite {

  test("quiet run: all signals in band") {
    assert(Bench.signalVerdict(0.33, Some(1.02), Some(1.01), Some(1.03)) == "quiet")
    // no prior signals at all (first record): calibration alone decides
    assert(Bench.signalVerdict(0.30, None, None, None) == "quiet")
  }

  test("calibration discard band forces contended regardless of ratios") {
    assert(Bench.signalVerdict(0.50, Some(1.00), Some(1.00), Some(1.00)) == "contended")
  }

  test("r15 attempt-2 scenario: quiet calibration, IO co-tenant ratios => contended, auto-routed off a quiet record") {
    // calibration 0.33 (in band — the CPU probe can't see IO), shared
    // ratios 1.26-1.32: the exact shape that needed a manual
    // `git checkout -- bench_full.json` in r14 and r15
    val v = Bench.signalVerdict(0.33, Some(1.28), Some(1.26), Some(1.30))
    assert(v == "contended")
    assert(Bench.shouldRouteContended(isContractRun = true, hasPrior = true,
      priorVerdictQuiet = true, calMax = 0.33, verdict = v))
  }

  test("regression-must-not-dodge: ratio-only contended does NOT auto-route off a non-quiet record") {
    val v = Bench.signalVerdict(0.33, Some(1.28), Some(1.26), Some(1.30))
    assert(v == "contended")
    // pinned record is old-format / borderline: the run lands in
    // bench_full.json for manual adjudication — a genuine regression
    // cannot hide behind the router
    assert(!Bench.shouldRouteContended(isContractRun = true, hasPrior = true,
      priorVerdictQuiet = false, calMax = 0.33, verdict = v))
    // but the calibration band still routes even then (host noise the
    // CPU probe always sees)
    assert(Bench.shouldRouteContended(isContractRun = true, hasPrior = true,
      priorVerdictQuiet = false, calMax = 0.45, verdict = "contended"))
  }

  test("wallRatio disagreement demotes to borderline, never quiet and never contended on its own") {
    // sum ratio quiet but wall inflated (suite-growth drift OR an IO
    // burst between queries): manual adjudication, not an auto-bless
    // and not an auto-discard
    assert(Bench.signalVerdict(0.30, Some(1.02), Some(1.02), Some(1.20)) == "borderline")
  }

  test("borderline band between quiet and discard calibration") {
    assert(Bench.signalVerdict(0.385, Some(1.00), Some(1.00), Some(1.00)) == "borderline")
  }

  test("no routing outside contract runs or without a prior record") {
    assert(!Bench.shouldRouteContended(isContractRun = false, hasPrior = true,
      priorVerdictQuiet = true, calMax = 0.50, verdict = "contended"))
    assert(!Bench.shouldRouteContended(isContractRun = true, hasPrior = false,
      priorVerdictQuiet = false, calMax = 0.50, verdict = "contended"))
  }
}
