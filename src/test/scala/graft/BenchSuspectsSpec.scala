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

  test("per-row cliff: the r15 interpreted-stage signature fires, epoch wobble does not") {
    // the semanticDedup cliff shape at sf0.1 scale: same output rows,
    // per-row cost exploded ~150x (ms/row instead of µs/row)
    assert(BenchSuspects.perRowCliff(45.0, 6000, priorMinSec = 0.30, priorRows = 6000))
    // a 40% host-epoch slowdown — far under the 10x per-row gate
    assert(!BenchSuspects.perRowCliff(0.42, 6000, priorMinSec = 0.30, priorRows = 6000))
    // per-row NORMALIZATION: rows grew 10x and wall time with them —
    // per-row cost is flat, a bigger dataset is not a cliff
    assert(!BenchSuspects.perRowCliff(3.0, 60000, priorMinSec = 0.30, priorRows = 6000))
    // conversely a cliff still shows through a row-count change
    assert(BenchSuspects.perRowCliff(90.0, 12000, priorMinSec = 0.30, priorRows = 6000))
    // the 0.5 s absolute floor: a 20x per-row jump on a 10 ms query is
    // scan jitter, not an interpreted stage
    assert(!BenchSuspects.perRowCliff(0.2, 100, priorMinSec = 0.01, priorRows = 100))
    // unknown row counts (failed count, missing prior) never fire
    assert(!BenchSuspects.perRowCliff(45.0, -1, priorMinSec = 0.30, priorRows = 6000))
    assert(!BenchSuspects.perRowCliff(45.0, 6000, priorMinSec = 0.30, priorRows = 0))
  }
}
