package graft

import org.scalatest.funsuite.AnyFunSuite

/** The batch bench's suspect split — pure classification, no Spark.
  * Pins the two patterns round 13 proved the old single-bucket field
  * could not distinguish: the q_phash_ingest_gate trio (consistent-slow
  * on a quiet canary = a real regression) and the synthetic noisy-host
  * trio (one inflated run = contention).
  */
class BenchSuspectsSpec extends AnyFunSuite {

  test("the r13 q_phash_ingest_gate pattern classifies as regressed") {
    // three mutually consistent runs, 3.1x the prior min, quiet canary
    val v = BenchSuspects.classify(Seq(2.39, 2.74, 2.62), priorMin = 0.78,
      canaryHot = Some(false))
    assert(v == Some("regressed"))
  }

  test("a noisy-host pattern (one inflated run widening the spread) classifies as contended") {
    // min itself got dragged over 3x prior, but median > 3x min says
    // the host was loud during the window — untrustworthy min
    val v = BenchSuspects.classify(Seq(2.5, 9.0, 11.0), priorMin = 0.7,
      canaryHot = Some(false))
    assert(v == Some("contended"))
  }

  test("consistent-slow runs under a HOT canary classify as contended (uniform host load)") {
    val v = BenchSuspects.classify(Seq(2.39, 2.74, 2.62), priorMin = 0.78,
      canaryHot = Some(true))
    assert(v == Some("contended"))
  }

  test("unknown canary history degrades to contended, the conservative pre-r14 behavior") {
    val v = BenchSuspects.classify(Seq(2.39, 2.74, 2.62), priorMin = 0.78,
      canaryHot = None)
    assert(v == Some("contended"))
  }

  test("a min within 3x of the prior record is not a suspect at all") {
    assert(BenchSuspects.classify(Seq(1.5, 1.6, 1.7), priorMin = 0.78,
      canaryHot = Some(false)).isEmpty)
  }

  test("the 0.2 s absolute floor keeps millisecond scan noise off the list") {
    // 5x the prior min but only +0.08 s absolute — noise, not a suspect
    assert(BenchSuspects.classify(Seq(0.10, 0.11, 0.12), priorMin = 0.02,
      canaryHot = Some(false)).isEmpty)
  }

  test("canaryHot applies the same absolute floor as the suspect test") {
    assert(!BenchSuspects.canaryHot(0.45, 0.20), "within jitter of a tiny canary")
    assert(BenchSuspects.canaryHot(1.2, 0.25), "a genuinely loaded host")
    assert(!BenchSuspects.canaryHot(0.30, 0.25), "quiet")
  }

  test("empty run list never classifies") {
    assert(BenchSuspects.classify(Nil, priorMin = 1.0, canaryHot = Some(false)).isEmpty)
  }

  test("two-round drift: monotone 40%+ creep flags, everything else stays quiet") {
    // the r14 watch-list shape: 0.33 -> 0.45 -> 0.54 = +64% over two
    // rounds, each step under the 3x suspect gate
    assert(BenchSuspects.isDrifting(0.54, 0.45, 0.33))
    // non-monotone (recovered mid-way) is not drift
    assert(!BenchSuspects.isDrifting(0.54, 0.30, 0.33))
    // cumulative growth under 40% is normal wobble
    assert(!BenchSuspects.isDrifting(0.42, 0.38, 0.33))
    // under the 0.15 s absolute floor: scan jitter, not drift
    assert(!BenchSuspects.isDrifting(0.10, 0.08, 0.05))
    // a single-round 3x+ jump is a SUSPECT, not drift (no double-report)
    assert(!BenchSuspects.isDrifting(2.0, 0.45, 0.33))
    assert(BenchSuspects.classify(Seq(2.0, 2.1), priorMin = 0.45,
      canaryHot = Some(false)).contains("regressed"))
  }
}
