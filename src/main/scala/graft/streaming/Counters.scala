package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Process counters mirroring the reference's stats block
  * (lib/Sarkac.js:29-36,62-68): monotonically increasing counts exposed
  * for observability. Spark accumulators so executor-side stages can
  * contribute.
  */
class Counters(spark: SparkSession) extends Serializable {
  val scanRuns: LongAccumulator = spark.sparkContext.longAccumulator("graft.scanRuns")
  val anomaliesDetected: LongAccumulator = spark.sparkContext.longAccumulator("graft.anomaliesDetected")
  val analysedMessages: LongAccumulator = spark.sparkContext.longAccumulator("graft.analysedMessages")
  val topicUpdates: LongAccumulator = spark.sparkContext.longAccumulator("graft.topicUpdates")
  val fieldUpdates: LongAccumulator = spark.sparkContext.longAccumulator("graft.fieldUpdates")
  val errors: LongAccumulator = spark.sparkContext.longAccumulator("graft.errors")

  def snapshot: Map[String, Long] = Map(
    "scanRuns" -> scanRuns.value,
    "anomaliesDetected" -> anomaliesDetected.value,
    "analysedMessages" -> analysedMessages.value,
    "topicUpdates" -> topicUpdates.value,
    "fieldUpdates" -> fieldUpdates.value,
    "errors" -> errors.value,
  )
}
