package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextScoreFunctions

/** The incremental keep list: (a) the narrow assembly over the two
  * snapshot states equals the same verdict computed straight from
  * text (curate + the incremental cluster relation + the shared
  * near-dup rule); (b) once the states and estate artifacts exist,
  * the assembly's physical plan contains NO scan of the documents
  * table — the "nightly pass never re-parses history" claim as a
  * plan assertion; (c) the stored bucket stream replays the
  * HashedBucketSum fold bit-identically, the contract the DSIR
  * re-weighting of history rides on.
  */
class IncrementalCurateSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("assembly over snapshot states == direct text computation") {
    val viaState = IncrementalCurate.assemble(spark, sf)
      .collect().map(_.toString).toSet
    val direct = Curate.resolveNearDups(
      Curate.curate(spark, sf),
      Dedup.componentsIncremental(spark, sf)
        .select(col("doc_id"), col("cluster_root")),
      graft.queries.Tables.documents(spark, sf)
        .select(col("doc_id"), col("n_chars")))
      .collect().map(_.toString).toSet
    assert(viaState == direct,
      s"state-replay and direct verdicts diverged:\nonly-state=${viaState -- direct}\n" +
        s"only-direct=${direct -- viaState}")
  }

  test("the nightly pass reads no text: no documents scan in the plan") {
    // warm every artifact (states, eval grams, history contam, the
    // estate component memos and snapshot tables)
    IncrementalCurate.assemble(spark, sf).count()
    val plan = IncrementalCurate.assemble(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"incremental assembly must not scan the documents table:\n$plan")
  }

  test("incremental dataset card == batch dataset card") {
    val inc = IncrementalCurate.datasetCardIncremental(spark, sf)
      .collect().map(_.toString).toSet
    val batch = DatasetCard.datasetCard(spark, sf)
      .collect().map(_.toString).toSet
    assert(inc == batch, s"cards diverged:\ninc=$inc\nbatch=$batch")
  }

  test("the incremental card reads no text: no documents scan in the plan") {
    IncrementalCurate.datasetCardIncremental(spark, sf).count() // warm states
    val plan = IncrementalCurate.datasetCardIncremental(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"incremental card must not scan the documents table:\n$plan")
  }

  test("bucket stream replays the hashed fold bit-identically") {
    val lookup = (0 until Importance.Buckets).map(b => 1.0 / (b + 3)).toArray
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g h i j k l m n o p",
      "x",
      "",
    ).toDF("text").select(split(col("text"), " ").as("tk"), typedLit(lookup).as("w"))
    val got = df.select(
      TextScoreFunctions.hashedBucketSum(col("tk"), col("w"), Importance.Buckets).as("direct"),
      TextScoreFunctions.bucketLookupSum(
        TextScoreFunctions.hashedBuckets(col("tk"), Importance.Buckets), col("w")).as("replayed"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"fold diverged: direct=${r.getDouble(0)} replayed=${r.getDouble(1)}")
    }
    // a lookup shorter than the bucket domain nulls both forms alike
    val shortW = Array(0.5)
    val nulls = df.limit(1).select(
      TextScoreFunctions.hashedBucketSum(col("tk"), typedLit(shortW), Importance.Buckets).as("d"),
      TextScoreFunctions.bucketLookupSum(
        TextScoreFunctions.hashedBuckets(col("tk"), Importance.Buckets), typedLit(shortW)).as("r"))
      .collect().head
    assert(nulls.isNullAt(0) == nulls.isNullAt(1),
      "out-of-bounds bucket must null both folds alike")
  }
}
