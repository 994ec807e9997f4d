package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Dsl

/** S1-S4 closure: the full message -> anomaly round trip through a REAL
  * Kafka broker, using only Spark APIs (the batch Kafka writer plays
  * producer, so no kafka-clients dependency is needed in test code).
  *
  * The sandbox ships neither a broker nor the spark-sql-kafka connector
  * jar, so the test CANCELS (not passes) unless both are provided:
  *
  * {{{
  *   GRAFT_KAFKA_BOOTSTRAP=localhost:9092 \
  *     sbt -batch "testOnly graft.streaming.KafkaIntegrationSpec"
  * }}}
  *
  * with `spark-sql-kafka-0-10` (and kafka-clients) on the classpath.
  */
class KafkaIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
  private def connectorPresent: Boolean =
    scala.util.Try(Class.forName(
      "org.apache.spark.sql.kafka010.KafkaSourceProvider")).isSuccess

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  test("message -> anomaly round trip through a real broker (S1/S4)") {
    assume(bootstrap.isDefined, "GRAFT_KAFKA_BOOTSTRAP not set — broker integration skipped")
    assume(connectorPresent, "spark-sql-kafka connector not on classpath — integration skipped")
    val bs = bootstrap.get
    val inTopic = s"graft-in-${System.currentTimeMillis()}"

    // produce the generator script with Spark's batch Kafka writer
    val msgs = (0L until 120L by 5).map { s =>
      val one = if (s % 30 == 0 && s > 0) 150.5 else 15.5
      (s"k$s", s"""{"sub":{"one":$one}}""")
    }.toDF("key", "value")
    msgs.selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("topic", inTopic)
      .save()

    // stream it back through the full pipeline into a memory sink
    val dsl = Dsl.parse(Map(inTopic -> Map("sub.one" -> Seq("5m"))))
    val pipeline = new AnomalyPipeline(spark, dsl, cooldownMs = 0L)
    val source = AnomalyPipeline.kafkaSource(spark, bs, Seq(inTopic))
      .withColumn("ts", lit(new Timestamp(t0))) // deterministic event time
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = AnomalyPipeline.run(
      pipeline, source,
      onBatch = (records, _) => emitted += records.count(),
      clock = Some(_ => new Timestamp(t0 + 60000)))
    try {
      q.processAllAvailable()
      // one more batch so the spike is judged against the first's stats
      msgs.limit(6).selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bs).option("topic", inTopic).save()
      q.processAllAvailable()
    } finally q.stop()
    // the second batch is judged against the first's stats, whose 30s
    // spikes give the window variance — it must actually emit
    assert(emitted.sum > 0L, s"no anomalies emitted through the broker: $emitted")
  }

  test("pattern subscription source builds against a real broker (S2)") {
    assume(bootstrap.isDefined, "GRAFT_KAFKA_BOOTSTRAP not set — broker integration skipped")
    assume(connectorPresent, "spark-sql-kafka connector not on classpath — integration skipped")
    val df = AnomalyPipeline.kafkaSourcePattern(
      spark, bootstrap.get, "graft-.*", blacklist = Set("graft-internal"))
    assert(df.isStreaming)
  }
}
