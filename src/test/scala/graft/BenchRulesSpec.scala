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
    // 4.9 vs 1.0 slid under the 5x term for rounds 3-15; since round 16
    // the mid-range term (3x AND +2s, priors >= 0.5s) catches it — the
    // pure 5x boundary now only decides the 0.5-1s prior band, pinned
    // by the next vectors (mid-range exempt below 0.5s)
    assert(Bench.isLoadSuspect(4.9, Some(1.0)))
    assert(Bench.isLoadSuspect(1.6, Some(0.3)))  // 5.3x, above the 1s floor
    assert(!Bench.isLoadSuspect(1.4, Some(0.3))) // 4.7x — under 5x, mid-exempt
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

  test("mid-range term: the round-15 escapees self-label") {
    // Round-15 driver artifact carried ~10 phantom seconds on four
    // queries that sat in the 5×/+10 s rules' mid-range blind spot —
    // none flagged, all isolated back to anchor speed on identical code.
    // The 3×-and-+2 s term (priors ≥ 0.5 s) catches the worst of them:
    // cp_diversity rode 4.85 s against a 1.08 s anchor (4.5×, +3.8 s).
    assert(Bench.isLoadSuspect(4.85, Some(1.08)))
    // ...while ordinary scheduler jitter on a fast query must NOT flag
    assert(!Bench.isLoadSuspect(0.66, Some(0.52)))
    // nor a slow query riding mildly above anchor (a15: 4.03 vs 3.15)
    assert(!Bench.isLoadSuspect(4.03, Some(3.15)))
    // sub-0.5 s priors stay exempt from the mid-range term too — 3× of
    // 0.3 s is still scheduler noise even past the +2 s offset
    assert(!Bench.isLoadSuspect(2.2, Some(0.45)))
    // but a ≥0.5 s prior tripled AND +2 s over is load, not jitter
    assert(Bench.isLoadSuspect(3.2, Some(0.9)))
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
