package graft.sources

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The co-located-join property of [[CorpusSink.writeBucketed]],
  * proven from the physical plan: two tables bucketed on the same key
  * with the same bucket count must join with ZERO shuffle exchanges —
  * the write-once-join-forever layout a doc-keyed curation estate
  * relies on at 100 TB.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucket tables join with zero exchanges; results match the shuffled join") {
    val docs = (1L to 200L).map(i => (i, s"text $i", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val scores = (1L to 200L).map(i => (i, i * 0.5)).toDF("doc_id", "score")
    CorpusSink.writeBucketed(docs, "bj_docs", buckets = 8)
    CorpusSink.writeBucketed(scores, "bj_scores", buckets = 8)
    try {
      // force the sort-merge path: broadcast would hide the property
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bj_docs").join(spark.table("bj_scores"), "doc_id")
      val plan = joined.queryExecution.executedPlan
      val expanded = plan +: plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
      val exchanges = expanded.flatMap(_.collect { case e: ShuffleExchangeExec => e })
      assert(exchanges.isEmpty,
        s"bucketed join must plan zero exchanges, found ${exchanges.size}:\n$plan")
      // and the join is still CORRECT vs the plain shuffled join
      val expect = docs.join(scores, "doc_id").agg(sum(col("score"))).head.getDouble(0)
      val got = joined.agg(sum(col("score"))).head.getDouble(0)
      assert(got == expect)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bj_docs")
      spark.sql("DROP TABLE IF EXISTS bj_scores")
    }
  }
}
