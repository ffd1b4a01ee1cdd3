package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's self-defense against host-load poisoning — the rules
  * themselves, not the measurement: the 5× ratio term, the 10 s
  * absolute term that closes the slow-query blind spot the round-13
  * driver run exposed (a 3.7× artifact on a 9.66 s anchor rode ~26
  * phantom seconds into the headline because 5× never tripped), the
  * sub-second jitter exemption, and the min-of-anchors reference merge
  * that stops one poisoned run from inflating the next run's
  * references. */
class BenchRulesSpec extends AnyFunSuite {

  test("ratio term: 5x over a >=1s prior is suspect") {
    assert(Bench.isLoadSuspect(6.0, Some(1.0)))
    assert(!Bench.isLoadSuspect(4.9, Some(1.0)))
  }

  test("absolute term: the round-13 blind spot self-labels") {
    // corpus_curation_report: 36.0 s vs its 9.66 s anchor — 3.7x, under
    // the 5x trip, but 26 phantom seconds; the absolute term catches it
    assert(Bench.isLoadSuspect(36.0, Some(9.66)))
    // and a slow query riding just above its anchor is NOT suspect
    assert(!Bench.isLoadSuspect(15.0, Some(9.66)))
  }

  test("sub-second priors are exempt from the ratio term (scheduler jitter)") {
    assert(!Bench.isLoadSuspect(0.4, Some(0.08))) // 5x of 80ms is noise
    assert(!Bench.isLoadSuspect(0.9, Some(0.1)))  // 9x but still sub-second
    // ...but the absolute term still applies to tiny anchors
    assert(Bench.isLoadSuspect(10.2, Some(0.1)))
  }

  test("failed measurements and missing/invalid priors are never suspect") {
    assert(!Bench.isLoadSuspect(-1.0, Some(1.0)))
    assert(!Bench.isLoadSuspect(100.0, None))
    assert(!Bench.isLoadSuspect(100.0, Some(-1.0)))
    assert(!Bench.isLoadSuspect(100.0, Some(0.0)))
  }

  test("reference merge takes the per-query MIN across sources") {
    // a load-poisoned previous run (q1 inflated) must not displace the
    // committed idle anchor — the exact failure mode the detector exists for
    val poisonedPrev = Map("q1" -> 40.0, "q2" -> 0.5)
    val committedAnchor = Map("q1" -> 2.0, "q3" -> 1.0)
    val merged = Bench.mergePriors(Seq(poisonedPrev, committedAnchor))
    assert(merged == Map("q1" -> 2.0, "q2" -> 0.5, "q3" -> 1.0))
  }

  test("reference merge drops failure sentinels") {
    val merged = Bench.mergePriors(Seq(Map("q1" -> -1.0), Map("q1" -> 3.0)))
    assert(merged == Map("q1" -> 3.0))
    assert(Bench.mergePriors(Seq(Map("q1" -> -1.0))).isEmpty)
  }
}
