package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.SchemaFlatten

/** Additional analytic coverage: top-k frequent terms, distinct
  * aggregation (absent from the reference), bit-exact correlation from
  * co-moment sums, and normalization-based dedup.
  */
object AnalyticQueries {

  private val D = DecimalType(18, 6)

  // ---- q_top_terms ---------------------------------------------------

  /** Top-20 most frequent tokens across the corpus — the canonical
    * explode -> count -> top-k shuffle, with deterministic ordering.
    *
    * Scale: `orderBy(...).limit(20)` plans `TakeOrderedAndProject`
    * (per-partition top-k, then a 20-row merge on the driver) — no
    * single-partition shuffle even with billions of distinct terms,
    * unlike a `row_number` over an unpartitioned window which would
    * move the whole vocabulary to one executor. The rank is then
    * derived from the 20 surviving rows (already on the driver — that
    * IS the TakeOrdered merge), so no WindowExec appears in the plan.
    */
  def topTerms(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val counts = docs
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
    val top = counts.orderBy(col("n").desc, col("term").asc).limit(20).collect()
    top.map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (term, n) => (-n, term) }
      .zipWithIndex
      .map { case ((term, n), i) => (i + 1, term, n) }
      .toSeq.toDF("rk", "term", "n")
  }

  val topTermsSql: String =
    """
    SELECT rk, term, n FROM (
      SELECT term, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rk
      FROM (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
      ) t
      GROUP BY term
    ) WHERE rk <= 20"""

  // ---- q_top_terms_grouped -------------------------------------------

  /** Per-group ranks kept by the grouped top-k. */
  val TopPerSource = 5

  /** Top-5 terms per source via a PARTITIONED window — the grouped
    * counterpart to [[topTerms]]'s global TakeOrdered. Here the window
    * is keyed by `source`, so ranking parallelizes across groups; at
    * extreme per-group vocabularies the same two-phase trick as the KMV
    * sketch (per-salt partial top-k, then merge) applies, but a
    * partitioned window is the right default shape.
    */
  def topTermsGrouped(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val counts = docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rk",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("source")).orderBy(col("n").desc, col("term").asc)))
      .filter(col("rk") <= TopPerSource)
      .select(col("source"), col("rk"), col("term"), col("n"))
  }

  val topTermsGroupedSql: String =
    s"""
    SELECT source, rk, term, n FROM (
      SELECT source, term, count(*) AS n,
             row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, term ASC) AS rk
      FROM (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents) t
      GROUP BY source, term
    ) WHERE rk <= $TopPerSource"""

  // ---- q_distinct_users ----------------------------------------------

  /** Distinct aggregation (the reference had none): exact distinct
    * users and days-active per event type.
    */
  def distinctUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.groupBy(col("event_type").as("topic"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(date_trunc("DAY", col("ts"))).as("n_active_days"),
        count(lit(1)).as("n_events"),
      )
  }

  val distinctUsersSql: String =
    """
    SELECT event_type AS topic,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT date_trunc('day', ts)) AS n_active_days,
           count(*) AS n_events
    FROM events GROUP BY 1"""

  // ---- q_corr --------------------------------------------------------

  /** Pearson correlation of (value, props.k) per topic, computed
    * explicitly from exact decimal co-moment sums so both engines
    * produce the identical double (built-in corr() implementations
    * differ numerically between engines).
    */
  def corr(spark: SparkSession, sfDir: String): DataFrame = {
    // round 16: the per-call JSON parse of every props payload is gone —
    // both tracked fields already sit, parsed once per snapshot, in the
    // memoized extraction spine (eventSamplesMat). corr joins the two
    // path legs by event identity; a spread of the raw scan was tried
    // first and REVERTED (the parse projection collapses below the
    // repartition, so the parse stayed single-task).
    val s = graft.queries.CoreQueries.eventSamplesMat(spark, sfDir)
    val xs = s.filter(col("path") === "value")
      .select(col("event_id"), col("topic"), col("value").cast(D).as("x"))
    val ys = s.filter(col("path") === "props.k")
      .select(col("event_id"), col("value").cast(D).as("y"))
    val base = xs.join(ys, "event_id")
    base.groupBy(col("topic"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast(D).cast("double").as("sx"),
        sum(col("y")).cast(D).cast("double").as("sy"),
        sum(col("x") * col("x")).cast(D).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast(D).cast("double").as("syy"),
        sum(col("x") * col("y")).cast(D).cast("double").as("sxy"),
      )
      .withColumn("corr_xy",
        round(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))),
          6))
      .select(col("topic"), col("n"), round(col("sxy"), 6).as("sxy"), col("corr_xy"))
  }

  val corrSql: String =
    """
    WITH b AS (
      SELECT event_type AS topic,
             CAST(value AS DECIMAL(18,6)) AS x,
             CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) AS DECIMAL(18,6)) AS y
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
        AND CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL
    ),
    a AS (
      SELECT topic, count(*) AS n,
             CAST(CAST(sum(x) AS DECIMAL(18,6)) AS DOUBLE) AS sx,
             CAST(CAST(sum(y) AS DECIMAL(18,6)) AS DOUBLE) AS sy,
             CAST(CAST(sum(x * x) AS DECIMAL(18,6)) AS DOUBLE) AS sxx,
             CAST(CAST(sum(y * y) AS DECIMAL(18,6)) AS DOUBLE) AS syy,
             CAST(CAST(sum(x * y) AS DECIMAL(18,6)) AS DOUBLE) AS sxy
      FROM b GROUP BY 1
    )
    SELECT topic, n, round(sxy, 6) AS sxy,
           round((n * sxy - sx * sy) /
                 sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_xy
    FROM a"""

  // ---- q_histogram ---------------------------------------------------

  /** Histogram bucket width and cap (values land in [0, 500]). */
  val HistWidth = 25.0
  val HistMaxBucket = 19L

  /** Fixed-width value histograms per event type — the distribution
    * profile behind monitoring dashboards and drift detection. Bucket
    * index is `floor(value / width)` clamped to a top bucket: one
    * double division + floor, identical IEEE arithmetic in both
    * engines.
    *
    * Scale: a single hash aggregation on (type, bucket) with map-side
    * partials — cardinality types × 20, no window, no sort until the
    * tiny result.
    */
  def histogram(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.filter(col("event_type").isNotNull && col("value").isNotNull)
      .groupBy(
        col("event_type"),
        least(floor(col("value") / lit(HistWidth)).cast("long"), lit(HistMaxBucket))
          .as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_lo", col("bucket") * lit(HistWidth))
  }

  val histogramSql: String =
    s"""
    SELECT event_type,
           least(CAST(floor(value / $HistWidth) AS BIGINT), $HistMaxBucket) AS bucket,
           count(*) AS n,
           least(CAST(floor(value / $HistWidth) AS BIGINT), $HistMaxBucket) * $HistWidth AS bucket_lo
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
    GROUP BY 1, 2"""

  // ---- q_bitmap_distinct ---------------------------------------------

  /** Dense-domain bound for the bitmap aggregate (user ids are small
    * sequential integers in this corpus; 2^20 bits = 128 KiB/group
    * worst case).
    */
  val BitmapMaxKey: Int = 1 << 20

  /** Exact distinct users per event type via the custom native
    * aggregate [[graft.functions.BitmapDistinct]] — one pass, partial
    * bitmaps OR-merged, no two-shuffle `count(DISTINCT)` expand. The
    * oracle IS `count(DISTINCT user_id)`: hash equality proves the
    * custom aggregate exact.
    */
  def bitmapDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        graft.functions.BitmapAggregates.bitmapDistinct(col("user_id"), BitmapMaxKey)
          .as("n_users"),
        count(lit(1)).as("n_events"))

  val bitmapDistinctSql: String =
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events WHERE event_type IS NOT NULL GROUP BY 1"""

  // ---- q_dedup_normalized --------------------------------------------

  /** Normalization-based exact dedup: lowercase + whitespace collapse
    * before hashing, catching case/spacing-only duplicates.
    */
  def dedupNormalized(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs.groupBy(graft.pipeline.Dedup.normTextMd5(col("text")).as("norm_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
  }

  val dedupNormalizedSql: String =
    s"""
    SELECT ${graft.pipeline.Dedup.normTextMd5Sql.format("text")} AS norm_md5,
           min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM documents GROUP BY 1"""
}
