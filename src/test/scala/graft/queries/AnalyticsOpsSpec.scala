package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics specs for the funnel / cohort / cube analytics operators
  * on hand-built event fixtures (the oracle gate checks real data; these
  * pin the tricky orderings the gate corpus may not contain).
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, String, Long, String)]): String = {
    // (event_id, event_type, ts_us, user) -> events.parquet fixture
    val dir = java.nio.file.Files.createTempDirectory("ev").toString
    rows.map { case (id, tpe, tsUs, user) =>
      (id, new Timestamp(tsUs / 1000), user.hashCode.toLong, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel: steps are strictly sequential per user") {
    val M = 60000000L // one minute in micros
    val dir = writeEvents(Seq(
      // full conversion in order
      (1L, "view", 1 * M, "a"), (2L, "click", 2 * M, "a"), (3L, "purchase", 3 * M, "a"),
      // click BEFORE first view: drops at step 2
      (4L, "click", 1 * M, "b"), (5L, "view", 2 * M, "b"), (6L, "purchase", 3 * M, "b"),
      // view only
      (7L, "view", 1 * M, "c"),
      // purchase before click: drops at step 3
      (8L, "view", 1 * M, "d"), (9L, "purchase", 2 * M, "d"), (10L, "click", 3 * M, "d"),
    ))
    val out = TemporalQueries.funnel(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    // step 2 = {a, d} (b's click precedes its first view); step 3 = {a}
    // (d's purchase precedes its click)
    assert(out == Map(1 -> 4L, 2 -> 2L, 3 -> 1L))
  }

  test("cohort: offsets count whole weeks from each user's first day") {
    val D = 86400000000L
    val dir = writeEvents(Seq(
      (1L, "view", 0 * D, "a"), (2L, "view", 6 * D, "a"), (3L, "view", 7 * D, "a"),
      (4L, "view", 3 * D, "b"), (5L, "view", 11 * D, "b"),
    ))
    val out = TemporalQueries.cohort(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a: cohort day 0 -> offsets 0 (days 0,6) and 1 (day 7)
    // b: cohort day 3 -> offsets 0 (day 3) and 1 (day 11)
    assert(out == Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (3L, 0L) -> 1L, (3L, 1L) -> 1L))
  }

  test("cube: every grouping combination present and consistent") {
    val sf = "/root/testdata/sf0.001"
    val rows = WindowQueries.cubeActivity(spark, sf).collect()
    val byKey = rows.map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val grand = byKey(("<all>", -1L))
    val typeTotals = byKey.collect { case ((t, -1L), n) if t != "<all>" => n }.sum
    val dayTotals = byKey.collect { case ((t, d), n) if t == "<all>" && d != -1L => n }.sum
    val cellTotals = byKey.collect { case ((t, d), n) if t != "<all>" && d != -1L => n }.sum
    assert(Seq(typeTotals, dayTotals, cellTotals).forall(_ == grand),
      "cube margins disagree with the grand total")
  }
}

/** Edge semantics for the histogram and embedding-centroid operators. */
class ProfileOpsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: boundary values open a new bucket, outliers clamp to the top") {
    val dir = java.nio.file.Files.createTempDirectory("hist").toString
    Seq(
      (1L, new Timestamp(0L), 1L, "t", 0.0, "{}"),
      (2L, new Timestamp(0L), 1L, "t", 24.999, "{}"),
      (3L, new Timestamp(0L), 1L, "t", 25.0, "{}"),
      (4L, new Timestamp(0L), 1L, "t", 9999.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticQueries.histogram(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 2L, 1L -> 1L, AnalyticQueries.HistMaxBucket -> 1L))
  }

  test("embed centroid: element-wise mean per label on hand-checked vectors") {
    val dir = java.nio.file.Files.createTempDirectory("cent").toString
    Seq(
      (1L, Array(1.0f, 2.0f), 0),
      (2L, Array(3.0f, 6.0f), 0),
      (3L, Array(10.0f, 20.0f), 1),
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.pipeline.Similarity.embedCentroid(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      (0, 0L) -> ((2L, 2.0)), (0, 1L) -> ((2L, 4.0)),
      (1, 0L) -> ((1L, 10.0)), (1, 1L) -> ((1L, 20.0))))
  }
}

/** The salted join must be provably identical to the plain join. */
class SaltedJoinSpec extends SparkSpec {

  test("replicated-dimension salted join equals the unsalted join") {
    val sf = "/root/testdata/sf0.001"
    val salted = RelationalQueries.saltedJoin(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val li = Tables.lineitem(spark, sf)
    val sup = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_nationkey"))
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"),
        round(graft.functions.Exact.exactSum(col("l_quantity")), 6).as("q"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, q)) =>
      assert(plain(k)._1 == n, s"count diverged for nation $k")
      assert(math.abs(plain(k)._2 - q) < 1e-6, s"sum diverged for nation $k")
    }
  }
}

/** The custom bitmap aggregate: partial/merge correctness across
  * partitions, null tolerance, loud out-of-domain failure.
  */
class BitmapDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap distinct merges partials exactly across many partitions") {
    val df = spark.range(0, 10000).repartition(32)
      .select((col("id") % 97).as("k"), (col("id") % 500).as("user"))
    val out = df.groupBy(col("k"))
      .agg(graft.functions.BitmapAggregates.bitmapDistinct(col("user"), 1 << 20).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = df.groupBy(col("k")).agg(countDistinct(col("user")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == expected)
  }

  test("nulls are ignored; out-of-domain keys fail loudly") {
    val withNull = Seq(Some(1L), None, Some(1L), Some(3L)).toDF("u")
    val n = withNull.agg(
      graft.functions.BitmapAggregates.bitmapDistinct(col("u"), 10).as("n"))
      .head.getLong(0)
    assert(n == 2L)
    val bad = Seq(5L, 99L).toDF("u")
    val e = intercept[Exception] {
      bad.agg(graft.functions.BitmapAggregates.bitmapDistinct(col("u"), 10)).collect()
    }
    assert(e.getMessage != null)
  }
}

/** The binned range join must equal the naive inequality join. */
class RangeJoinSpec extends SparkSpec {

  test("bin-decomposed interval join equals the nested-loop reference") {
    val sf = "/root/testdata/sf0.001"
    val got = TemporalQueries.rangeJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf)
    val probes = ev.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val ivals = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("iu"), unix_micros(col("ts")).as("lo"))
      .withColumn("hi", col("lo") + TemporalQueries.RangeBinUs)
    val naive = probes.join(ivals,
        probes("user_id") === col("iu") &&
          col("ts_us") >= col("lo") && col("ts_us") < col("hi"))
      .groupBy(col("user_id")).agg(countDistinct(col("event_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive, "binned decomposition diverged from the inequality join")
    assert(got.nonEmpty)
  }
}
