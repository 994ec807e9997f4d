package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stream bench's self-adjudication fields — pure JSON assembly,
  * no Spark session needed. Pins the round-12 refresh shape that
  * motivated `suspect_contended`: runs of 18.5 k / 50 k / 123 k msg/s
  * on identical code, where the 18.5 k run is host contention (it is
  * below a third of what the committed record proves the code
  * sustains) and must self-flag instead of being re-litigated by hand.
  */
class StreamBenchSummarySpec extends AnyFunSuite {

  private def r(msgs: Long) =
    StreamBench.Result(msgs, messages = 300000, seconds = 1.0,
      anomalies = 0, topics = 2, bucketed = false)

  test("a run below a third of the committed best self-flags") {
    val s = StreamBench.summaryJson(Seq(r(18469), r(50075), r(123067)),
      priorBest = Some(123067))
    assert(s.contains(""""prior_best":123067"""))
    assert(s.contains(""""suspect_contended":[18469]"""))
    assert(s.contains(""""suspect_all_runs":false"""))
  }

  test("all runs below the bar set suspect_all_runs — a regression candidate") {
    val s = StreamBench.summaryJson(Seq(r(10000), r(12000), r(15000)),
      priorBest = Some(120000))
    assert(s.contains(""""suspect_contended":[10000,12000,15000]"""))
    assert(s.contains(""""suspect_all_runs":true"""))
  }

  test("no prior record: the fields are absent, the summary unchanged") {
    val s = StreamBench.summaryJson(Seq(r(50000), r(60000), r(70000)))
    assert(!s.contains("prior_best"))
    assert(!s.contains("suspect_contended"))
    assert(s.contains(""""contended":false"""))
  }

  test("quiet runs near the committed best produce an empty suspect list") {
    val s = StreamBench.summaryJson(Seq(r(60000), r(65000), r(70000)),
      priorBest = Some(123067))
    assert(s.contains(""""suspect_contended":[]"""))
    assert(s.contains(""""suspect_all_runs":false"""))
  }
}
