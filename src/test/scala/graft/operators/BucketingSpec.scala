package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Co-located joins via bucketing — the pre-partitioning strategy
  * SCALE.md prescribes for repeated large-large joins at 100 TB: both
  * sides bucketed on the join key means the sort-merge join needs NO
  * shuffle exchange at query time.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans without a shuffle exchange") {
    val dir = Files.createTempDirectory("graft_bucketing").toFile
    dir.deleteOnExit()
    val warehouse = dir.getAbsolutePath
    // isolated session: this spec disables broadcast joins, which must
    // not leak into other suites sharing the JVM-wide session
    val spark = this.spark.newSession()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast

    try {
      val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      val o = Tables.orders(spark, "/root/testdata/sf0.001")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$warehouse/li_b").saveAsTable("li_b")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$warehouse/o_b").saveAsTable("o_b")

      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join should not shuffle, found: ${exchanges.map(_.nodeName)}")

      // and it computes the same thing as the unbucketed join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
