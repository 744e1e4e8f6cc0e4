package graft

import org.scalatest.funsuite.AnyFunSuite

/** Threshold logic for Bench's machine-readable contamination flag
  * (round 18, r17 verdict item 4): the flag must reproduce the human
  * adjudication of the r17 records — the loaded driver run rejected,
  * the quiet paired runs accepted.
  */
class BenchContaminationSpec extends AnyFunSuite {

  test("quiet-run signals are clean (r17 paired-run profile)") {
    // judge's quiet pairing: canary_ratio ~1.1, family max ~1.4,
    // loadavg_start ~1.5
    assert(Bench.contaminationOf(1.1, 1.4, "1.52 1.60 1.71").isEmpty)
    // arg-filtered runs emit -1 sentinels — never contaminated by them
    assert(Bench.contaminationOf(-1.0, -1.0, "0.10 0.20 0.30").isEmpty)
  }

  test("the r17 driver record's profile is flagged, with named reasons") {
    // BENCH_r17.json: loadavg_start 3.8, families re-timed 3.8x+
    val reasons = Bench.contaminationOf(1.2, 3.9, "3.80 5.10 6.95")
    assert(reasons.size == 2, reasons)
    assert(reasons.exists(_.startsWith("canary_family_max")), reasons)
    assert(reasons.exists(_.startsWith("loadavg_start")), reasons)
  }

  test("each signal trips independently at its 2.5 threshold") {
    assert(Bench.contaminationOf(2.5, 1.0, "0.5 0.5 0.5") ==
      Seq("canary_ratio 2.50 >= 2.5"))
    assert(Bench.contaminationOf(1.0, 2.5, "0.5 0.5 0.5") ==
      Seq("canary_family_max 2.50 >= 2.5"))
    assert(Bench.contaminationOf(1.0, 1.0, "2.50 0.5 0.5") ==
      Seq("loadavg_start 2.50 >= 2.5"))
    assert(Bench.contaminationOf(2.49, 2.49, "2.49 9.9 9.9").isEmpty)
  }

  test("an unreadable /proc/loadavg never flags (signal absent, not dirty)") {
    assert(Bench.contaminationOf(1.0, 1.0, "unavailable").isEmpty)
    assert(Bench.contaminationOf(1.0, 1.0, "").isEmpty)
  }
}
