package graft.functions

import graft.SparkSpec

/** SQL-surface registration of the native expressions (the
  * SparkSessionExtensions route; here wired at runtime via
  * GraftFunctions.register on the shared test session).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("graft_* functions usable from spark.sql after registration") {
    GraftFunctions.register(spark)
    // codegen dot product
    val dot = spark.sql(
      "SELECT graft_dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(dot == 32.0)
    // simhash of identical token-hash arrays matches the Scala API
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val arr = Seq((1L, Seq(7L, 8L, 9L))).toDF("id", "hs")
    val viaScala = arr.select(SketchFunctions.simhash32(col("hs"))).head().getLong(0)
    val viaSql = spark.sql("SELECT graft_simhash32(array(7L, 8L, 9L)) AS s").head().getLong(0)
    assert(viaSql == viaScala)
    // rolling n-gram hash agrees with the Scala API too
    val viaScala2 = arr.select(
      SketchFunctions.ngramPolyHash(col("hs"), 2, 1000003L, 2147483647L)).head().getSeq[Long](0)
    val viaSql2 = spark.sql(
      "SELECT graft_ngram_poly_hash(array(7L, 8L, 9L), 2, 1000003L, 2147483647L) AS g")
      .head().getSeq[Long](0)
    assert(viaSql2 == viaScala2)
    // the KMV aggregate works from SQL (analyzer wraps the registered
    // AggregateFunction like a built-in aggregate)
    val kmv = spark.sql(
      "SELECT graft_kmv_sketch(v, 2) AS s FROM VALUES (9L), (1L), (5L), (1L) AS t(v)")
      .head().getSeq[Long](0)
    assert(kmv == Seq(1L, 5L))
    // the HLL register aggregate works from SQL; hand-computed registers
    // for m=4 (maxRank = 60-2+1 = 59): hv=0 -> reg0 rank59; hv=5 ->
    // reg1 w=1 rank58; hv=21 -> reg1 w=5 rank56 (max keeps 58);
    // hv=7 -> reg3 w=1 rank58; reg2 never hit -> 0
    val hll = spark.sql(
      "SELECT graft_hll_sketch(v, 4) AS s FROM VALUES (0L), (5L), (21L), (7L) AS t(v)")
      .head().getSeq[Int](0)
    assert(hll == Seq(59, 58, 0, 58))
    // the hashed bucket sum works from SQL and equals the Scala form
    val lk = (0 until 8).map(i => i * 0.5).toArray
    val viaScala3 = Seq((Seq("a", "b"), lk.toSeq)).toDF("tk", "lk")
      .select(TextScoreFunctions.hashedBucketSum(col("tk"), col("lk"), 8))
      .head().getDouble(0)
    val viaSql3 = spark.sql(
      s"SELECT graft_hashed_bucket_sum(array('a', 'b'), array(${lk.mkString("D,")}D), 8) AS s")
      .head().getDouble(0)
    assert(viaSql3 == viaScala3)
    // the SQL registry exposes the fold to user-supplied lookups: a
    // lookup shorter than `buckets` (or a null bucket) must yield NULL
    // (element_at semantics), never an out-of-bounds UnsafeArrayData
    // read — 'a' and 'b' hash to buckets 1 and 6 under buckets=8
    // (md5 first-8-hex 0x0cc175b9 % 8 = 1, 0x92eb5ffe % 8 = 6), so a
    // 1-element lookup misses and a null at index 1 is touched
    assert(spark.sql(
      "SELECT graft_hashed_bucket_sum(array('a', 'b'), array(1.0D), 8) AS s")
      .head().isNullAt(0), "short lookup must null the fold")
    assert(spark.sql(
      "SELECT graft_hashed_bucket_sum(array('a', 'b'), " +
        "array(0.0D, CAST(NULL AS DOUBLE), 2D, 3D, 4D, 5D, 6D, 7D), 8) AS s")
      .head().isNullAt(0), "null bucket must null the fold")
    // registration is idempotent
    GraftFunctions.register(spark)
  }
}
