package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** S3 adapter coverage. The sandbox has no kafka-clients jar, so the
  * real AdminClient leg can only run where one is provided (it shares
  * KafkaIntegrationSpec's GRAFT_KAFKA_BOOTSTRAP opt-in); what IS pinned
  * here is the contract the sandbox can see: availability detection,
  * fail-fast on a missing client (never a silent empty topic list —
  * that would read as "all topics deleted" to the discovery diff), and
  * that the adapter satisfies Discovery's injection-point type.
  */
class KafkaTopicListerSpec extends AnyFunSuite {

  test("adapter reports unavailable and fails fast without kafka-clients") {
    assume(!KafkaTopicLister.isAvailable, "kafka-clients present — covered by the live test")
    val lister = new KafkaTopicLister("localhost:9092")
    intercept[ClassNotFoundException] { lister() }
  }

  test("adapter is a () => Seq[String] — plugs into Discovery.discoverTopics unchanged") {
    // type-level pin: the adapter must stay assignable to the injection
    // point (compile error here = broken production wiring)
    val injectable: () => Seq[String] = new KafkaTopicLister("localhost:9092")
    assert(injectable != null)
  }

  test("lists topics through a real AdminClient when provided (live opt-in)") {
    val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
    assume(bootstrap.isDefined && KafkaTopicLister.isAvailable,
      "GRAFT_KAFKA_BOOTSTRAP / kafka-clients not present — live AdminClient scan skipped")
    val topics = new KafkaTopicLister(bootstrap.get)()
    assert(topics == topics.sorted, "topic list must come back sorted")
  }
}
