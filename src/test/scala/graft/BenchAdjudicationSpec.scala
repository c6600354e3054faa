package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins both branches of the bench self-adjudication gate (r15
  * directive #4): the quiet-tail median replaces a contended battery
  * median ONLY when the tail's own calibration shows the tail window
  * was at least as quiet as the battery's — and a substituted row
  * keeps the battery's n_ok/attempted counts so its flaky marker
  * survives the replacement.
  */
class BenchAdjudicationSpec extends AnyFunSuite {

  test("gate: tail at least as quiet as battery -> substitute") {
    assert(BenchAdjudication.gate(calibTail = 0.25, calibBattery = 0.42).substitute)
    assert(BenchAdjudication.gate(calibTail = 0.42, calibBattery = 0.42).substitute)
  }

  test("gate: tail MORE contended than battery -> keep battery medians, flagged") {
    val v = BenchAdjudication.gate(calibTail = 0.61, calibBattery = 0.26)
    assert(!v.substitute)
    assert(v.reason.contains("contended") && v.reason.contains("0.61") &&
      v.reason.contains("0.26"), v.reason)
  }

  test("gate: tail calibration failed (-1) -> no substitution") {
    val v = BenchAdjudication.gate(calibTail = -1.0, calibBattery = 0.26)
    assert(!v.substitute && v.reason.contains("failed"), v.reason)
  }

  test("gate: battery calibration itself failed -> tail still usable") {
    // a battery without a calibration cannot prove the tail was louder;
    // a successful tail calibration is the best evidence available
    assert(BenchAdjudication.gate(calibTail = 0.30, calibBattery = -1.0).substitute)
  }

  test("two-ended gate: quiet at BOTH ends -> substitute (r16 advice)") {
    assert(BenchAdjudication.gate(calibTailBefore = 0.25, calibTailAfter = 0.30,
      calibBattery = 0.42).substitute)
  }

  test("two-ended gate: window turns contended MID-tail -> reject on the after-calibration") {
    // the first calibration only covers the window's start; the post-
    // re-measure one catches a window that got loud while measuring
    val v = BenchAdjudication.gate(calibTailBefore = 0.25, calibTailAfter = 0.61,
      calibBattery = 0.42)
    assert(!v.substitute && v.reason.contains("0.61"), v.reason)
    // ...and symmetric: loud start, quiet end also rejects
    assert(!BenchAdjudication.gate(0.61, 0.25, 0.42).substitute)
  }

  test("two-ended gate: either calibration failing (-1) rejects") {
    assert(!BenchAdjudication.gate(-1.0, 0.25, 0.42).substitute)
    assert(!BenchAdjudication.gate(0.25, -1.0, 0.42).substitute)
  }

  test("substituted row: tail median/sd/min, battery n_ok and attempted") {
    // battery row: 2 of 3 runs survived (flaky), contended median 1.8 s
    val battery = ("q99_example", 1.8, 0.7, 2, 3, 0.9)
    val sub = BenchAdjudication.substitutedRow(battery,
      tailMedian = 0.4, tailSd = 0.02, tailMin = 0.38)
    assert(sub._1 == "q99_example")
    assert(sub._2 == 0.4 && sub._3 == 0.02 && sub._6 == 0.38)
    // the flaky marker (ok < attempted) must survive substitution
    assert(sub._4 == 2 && sub._5 == 3)
  }
}
