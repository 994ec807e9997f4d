package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.core.Mat.MatOps

/** Temporal operators over the events stream: as-of join (DuckDB's
  * native ASOF JOIN is the oracle), gap-based sessionization, and
  * activity pivoting.
  */
object TemporalQueries {

  // ---- q_asof_join ---------------------------------------------------

  /** For every non-error event, the value of the same user's most
    * recent error event at or before it. Oracle: DuckDB's native
    * ASOF JOIN — our composed window-pass implementation must agree
    * with the real operator row for row.
    */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val left = ev.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val right = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("err_ts_us"), col("value").as("err_value"))
    AsOfJoin.asOf(left, right, "user_id", "ts_us", "err_ts_us", "err_value")
      .select(col("user_id"), col("event_id"), col("ts_us"), col("asof_err_value"))
  }

  val asofJoinSql: String =
    """
    SELECT l.user_id, l.event_id, epoch_us(l.ts) AS ts_us,
           r.value AS asof_err_value
    FROM (SELECT * FROM events WHERE event_type <> 'error') l
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id AND l.ts >= r.ts"""

  // ---- q_sessionize --------------------------------------------------

  /** Gap-based sessionization: a new session starts when a user is idle
    * > 30 minutes; emits per-session aggregates. Pure window functions —
    * identical semantics in both engines.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val withGap = ev
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
    val withSession = withGap
      .withColumn("session_no", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withSession
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        graft.functions.Exact.exactSum(col("value")).as("sum_value"),
      )
      .select(col("user_id"), col("session_no"), col("n_events"), col("start_us"), col("end_us"),
        round(col("sum_value"), 6).as("sum_value"))
  }

  val sessionizeSql: String =
    """
    WITH g AS (
      SELECT user_id, event_id, ts, value,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
      FROM events
    ),
    s AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
      FROM g
    ),
    n AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM s
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no, count(*) AS n_events,
           min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
           round(CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE), 6) AS sum_value
    FROM n GROUP BY user_id, session_no"""

  // ---- q_pivot_activity ----------------------------------------------

  /** Per-user activity pivot: one column per event type (explicit value
    * list so the schema is static — the scalable form of pivot).
    */
  def pivotActivity(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id"), col("click").as("n_click"), col("error").as("n_error"),
        col("purchase").as("n_purchase"), col("signup").as("n_signup"), col("view").as("n_view"))
  }

  val pivotActivitySql: String =
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS n_click,
           count(*) FILTER (WHERE event_type = 'error') AS n_error,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           count(*) FILTER (WHERE event_type = 'view') AS n_view
    FROM events GROUP BY user_id"""

  // ---- q_rolling_avg -------------------------------------------------

  /** Trailing row-frame window: per user, the mean of the last 5 event
    * values (current row inclusive) in time order — the rolling-feature
    * shape behind behavioral features and rate limiters. Sums run in
    * exact decimals over the frame, so the mean is engine-exact.
    *
    * Scale: the window is partitioned BY USER — thousands of
    * independent partitions, never a global sort; frame evaluation is
    * incremental within each partition.
    */
  def rollingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-4, Window.currentRow)
    ev.select(
      col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
      count(lit(1)).over(w).as("n_window"),
      (sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))).over(w)
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)).cast("double")
        / count(lit(1)).over(w)).as("rolling_mean"))
  }

  val rollingAvgSql: String =
    """
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           count(*) OVER w AS n_window,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DECIMAL(18,6)) AS DOUBLE)
             / count(*) OVER w AS rolling_mean
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"""

  // ---- q_range_join --------------------------------------------------

  /** Time-bin width for the interval-join decomposition (1 hour in
    * micros).
    */
  val RangeBinUs = 3600000000L

  /** Interval (range) join, decomposed for scale: count each user's
    * non-error events that fall INSIDE one of that user's error-bounded
    * intervals [error_ts, error_ts + 1h]. A naive inequality join is a
    * nested loop; the scalable form bins time — intervals explode to
    * the hour-bins they cover (≤ 2 here), events map to their single
    * bin, candidates come from an EQUI join on (user, bin), and the
    * exact inequality filters candidates. Same answer, shuffle-join
    * plan (the standard interval-join decomposition; DuckDB's native
    * inequality join is the oracle).
    */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("lo"))
      .withColumn("hi", col("lo") + RangeBinUs)
      .withColumn("bin", explode(sequence(
        expr(s"lo div $RangeBinUs"), expr(s"hi div $RangeBinUs"))))
    val probes = ev.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("bin", expr(s"ts_us div $RangeBinUs"))
    probes.join(intervals, Seq("user_id", "bin")) // equi join on (user, bin)
      .filter(col("ts_us") >= col("lo") && col("ts_us") < col("hi")) // exact range
      .groupBy(col("user_id"))
      .agg(countDistinct(col("event_id")).as("n_in_error_hour"))
  }

  val rangeJoinSql: String =
    s"""
    SELECT e.user_id, count(DISTINCT e.event_id) AS n_in_error_hour
    FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type <> 'error') e
    JOIN (SELECT user_id, epoch_us(ts) AS lo, epoch_us(ts) + $RangeBinUs AS hi
          FROM events WHERE event_type = 'error') i
      ON e.user_id = i.user_id AND e.ts_us >= i.lo AND e.ts_us < i.hi
    GROUP BY 1"""

  // ---- q_attribution -------------------------------------------------

  /** q_attribution: row-level trigger→action attribution — every
    * (click, same-user purchase within 5 minutes after) pair. This is
    * [[graft.streaming.StreamingJoins.attributedActions]] executed in
    * BATCH mode (`withWatermark` is a no-op on batch DataFrames), so
    * the exact transform the live stream runs is oracle-gated here:
    * stream == batch is pinned by StreamingJoinsSpec, batch == DuckDB
    * by this oracle — no second join implementation to drift.
    *
    * Scale: user_id-keyed equi join with the time bound as a
    * post-filter; a pathological hot user is handled by the binned
    * decomposition `q_range_join` demonstrates (same answer, bounded
    * candidates). Timestamps exit as epoch micros (BIGINT — the
    * cross-engine-stable encoding, the `q_extract_long` discipline).
    */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    graft.streaming.StreamingJoins.attributedActions(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
      .select(col("trigger_id"), col("user_id"),
        unix_micros(col("trigger_ts")).as("trigger_us"),
        col("action_id"), unix_micros(col("action_ts")).as("action_us"),
        col("value"))
  }

  val attributionSql: String =
    """
    SELECT t.event_id AS trigger_id, t.user_id,
           epoch_us(t.ts) AS trigger_us,
           a.event_id AS action_id, epoch_us(a.ts) AS action_us, a.value
    FROM events t JOIN events a
      ON t.user_id = a.user_id
     AND a.ts >= t.ts AND a.ts <= t.ts + INTERVAL 5 MINUTE
    WHERE t.event_type = 'click' AND a.event_type = 'purchase'"""

  // ---- q_unpivot -----------------------------------------------------

  /** Melt (unpivot) of the wide activity matrix back to long form —
    * the schema-normalization inverse of [[pivotActivity]], including
    * explicit zero rows (a user × type grid). Uses the native
    * `Dataset.unpivot` (Spark's UNPIVOT/MELT relational operator).
    *
    * Scale: unpivot is a narrow per-row expand (rows × 5, no shuffle
    * beyond the pivot's own aggregation); the oracle mirrors it as the
    * user × type grid with a left join.
    */
  def unpivotActivity(spark: SparkSession, sfDir: String): DataFrame = {
    val wide = pivotActivity(spark, sfDir)
    wide.unpivot(
        Array(col("user_id")),
        Array(col("n_click"), col("n_error"), col("n_purchase"),
          col("n_signup"), col("n_view")),
        "event_type", "n")
      .withColumn("event_type", expr("substring(event_type, 3)"))
  }

  val unpivotActivitySql: String =
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    t(event_type) AS (VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')),
    c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2)
    SELECT u.user_id, t.event_type, COALESCE(c.n, 0) AS n
    FROM u CROSS JOIN t
    LEFT JOIN c ON u.user_id IS NOT DISTINCT FROM c.user_id
               AND t.event_type = c.event_type"""

  // ---- q_funnel ------------------------------------------------------

  /** The ordered conversion funnel. */
  val FunnelSteps = Seq("view", "click", "purchase")

  /** Sequential conversion funnel view → click → purchase: a user
    * converts at step k only with an event of type k strictly after
    * their step-(k−1) conversion time. Emits one row per step with the
    * surviving user count.
    *
    * Scale: one conditional aggregation per step, all shuffling on
    * `user_id` — after the first exchange every later groupBy/join
    * reuses the hash partitioning (Catalyst elides the extra
    * exchanges), so depth-k funnels cost one shuffle plus k co-located
    * passes, never k shuffles. Timestamps compare as integer
    * epoch-micros.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    // step 1: earliest qualifying event per user; steps 2..k: earliest
    // event of the step type strictly after the previous step's time.
    // ONE lazy plan: each step's reached set is a subplan of the next,
    // and the three count legs union into a single job — the shared
    // step subplans are canonically identical, so exchange reuse
    // builds each exactly once (the round-16 pagerank discipline; the
    // old per-step persist + count() paid 2k driver barriers and
    // pinned layouts AQE could not size). Still O(k) joins, not O(k²).
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    var reached = ev.filter(col("event_type") === FunnelSteps.head)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("step_ts"))
    val legs = Seq.newBuilder[DataFrame]
    def legOf(i: Int, step: String, r: DataFrame): DataFrame =
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step"), lit(step).as("event_type"), col("n_users"))
    legs += legOf(1, FunnelSteps.head, reached)
    FunnelSteps.zipWithIndex.drop(1).foreach { case (step, i) =>
      reached = ev.filter(col("event_type") === step)
        .join(reached.select(col("user_id"), col("step_ts").as("prev_ts")), "user_id")
        .filter(col("ts_us") > col("prev_ts"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("step_ts"))
      legs += legOf(i + 1, step, reached)
    }
    legs.result().reduce(_ unionByName _)
  }

  val funnelSql: String =
    """
    WITH s1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t GROUP BY 1
    )
    SELECT 1 AS step, 'view' AS event_type, (SELECT count(*) FROM s1) AS n_users
    UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
    UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)"""

  // ---- q_cohort ------------------------------------------------------

  /** Cohort retention: users grouped by first-seen epoch-day, activity
    * counted per whole-week offset from that cohort day — the classic
    * retention triangle. All calendar math is integer epoch arithmetic
    * (day = micros div 86 400 000 000), so the result is engine-exact
    * with no timezone/date-function parity risk.
    *
    * Scale: first-seen is one user-keyed aggregation; the activity join
    * is user-keyed equi (co-partitioned with it); the final
    * (cohort, offset) aggregation is tiny. Nothing broadcasts the big
    * side, nothing windows.
    */
  def cohort(spark: SparkSession, sfDir: String): DataFrame = {
    val DayUs = 86400000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("day"))
    val firstSeen = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(firstSeen, "user_id")
      .groupBy(col("cohort_day"),
        expr("(day - cohort_day) div 7").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val cohortSql: String =
    """
    WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
    f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
    SELECT cohort_day, (d.day - cohort_day) // 7 AS week_offset,
           count(DISTINCT d.user_id) AS n_users
    FROM d JOIN f ON d.user_id = f.user_id
    GROUP BY 1, 2"""

  // ---- q_transitions -------------------------------------------------

  /** First-order Markov transition matrix of event types: for each
    * (prev → next) pair observed in a user's ordered event sequence,
    * the count and the conditional probability P(next | prev).
    *
    * Scale: one window pass partitioned by user_id (millions of small
    * partitions — the healthy kind), then a hash agg down to
    * |event_types|² rows; the normalizing window over `prev` runs on
    * that tiny aggregate, not on the raw events. The probability is a
    * single BIGINT/BIGINT quotient — bit-identical across engines with
    * no rounding.
    */
  def transitions(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val seq = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val pairs = ev
      .withColumn("prev", lag(col("event_type"), 1).over(seq))
      .filter(col("prev").isNotNull)
    val counts = pairs.groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy(col("prev"))
    counts
      .withColumn("n_prev", sum(col("n")).over(byPrev))
      .select(col("prev"), col("next"), col("n"), col("n_prev"),
        (col("n").cast("double") / col("n_prev").cast("double")).as("p"))
  }

  val transitionsSql: String =
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    c AS (
      SELECT prev, event_type AS next, count(*) AS n
      FROM ordered WHERE prev IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev, next, n,
           CAST(sum(n) OVER (PARTITION BY prev) AS BIGINT) AS n_prev,
           CAST(n AS DOUBLE) / CAST(CAST(sum(n) OVER (PARTITION BY prev) AS BIGINT) AS DOUBLE) AS p
    FROM c"""

  // ---- q_autocorr ----------------------------------------------------

  /** Lag-k autocorrelation (k = 1..3) of the metric value per topic,
    * over the (ts, event_id)-ordered sequence — the signal a seasonal
    * anomaly baseline is calibrated against.
    *
    * Exactness: values are carried as integer centi-units
    * (`round(value·100)` — the data is 2-decimal), so every sufficient
    * statistic (n, Σx, Σy, Σx², Σy², Σxy) is an order-independent
    * BIGINT sum; Pearson's r is then ONE double expression over those
    * exact integers, mirrored shape-for-shape in the oracle —
    * bit-identical with no rounding. Envelope: centi-values ≤ 5.7e4,
    * so Σx² fits BIGINT to ~2.9e9 rows per topic; beyond that, carry
    * the sums as DECIMAL(38,0).
    *
    * Scale: one window pass per topic computes all three lags, one
    * hash agg reduces to |topics|·3 rows. The per-topic ordered window
    * is the inherent cost of lag features; at 100 TB the same pass
    * runs per (topic, day) with boundary rows exchanged, as the
    * sessionize operator documents.
    */
  def autocorr(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("topic"),
        round(col("value") * lit(100)).cast("long").as("x"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val seq = Window.partitionBy(col("topic")).orderBy(col("ts_us"), col("event_id"))
    val lagged = ev
      .withColumn("xl", array((1 to 3).map(k =>
        struct(lit(k).as("k"), lag(col("x"), k).over(seq).as("y"))): _*))
      .select(col("topic"), col("x"), explode(col("xl")).as("ky"))
      .filter(col("ky.y").isNotNull)
      .select(col("topic"), col("ky.k").as("k"), col("x"), col("ky.y").as("y"))
    val sums = lagged.groupBy(col("topic"), col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    def d(c: String): Column = col(c).cast("double")
    val varx = d("n") * d("sxx") - d("sx") * d("sx")
    val vary = d("n") * d("syy") - d("sy") * d("sy")
    sums.select(col("topic"), col("k"), col("n"),
      when(varx > 0 && vary > 0,
        (d("n") * d("sxy") - d("sx") * d("sy")) / sqrt(varx * vary))
        .as("r"))
  }

  val autocorrSql: String =
    """
    WITH base AS (
      SELECT event_type AS topic, CAST(round(value * 100) AS BIGINT) AS x,
             epoch_us(ts) AS ts_us, event_id
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    lagged AS (
      SELECT topic, k.k, x,
             CASE k.k WHEN 1 THEN lag(x, 1) OVER w WHEN 2 THEN lag(x, 2) OVER w
                      ELSE lag(x, 3) OVER w END AS y
      FROM base CROSS JOIN (VALUES (1), (2), (3)) AS k(k)
      WINDOW w AS (PARTITION BY topic, k.k ORDER BY ts_us, event_id)
    ),
    sums AS (
      SELECT topic, k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM lagged WHERE y IS NOT NULL GROUP BY 1, 2
    )
    SELECT topic, CAST(k AS INTEGER) AS k, n,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                 AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           END AS r
    FROM sums"""

  // ---- q_resample ----------------------------------------------------

  /** Resample bucket width in microseconds (15 minutes). */
  val ResampleUs = 900000000L

  /** Time-series resampling with gap fill: per topic, the 15-minute
    * mean-value series over the topic's full span, with empty buckets
    * materialized (`is_gap`) and their mean carried forward from the
    * last observed bucket — the regular grid a forecasting or drift
    * model trains on (ragged event streams are not a time series).
    *
    * Scale: the aggregation is one hash agg to |topics|·|buckets|
    * rows; the dense grid is exploded from per-topic (min, max) spans
    * — O(span/width) rows per topic, never a row per event — and the
    * carry-forward window runs over that small grid, partitioned by
    * topic. At 100 TB the agg dominates and is shuffle-minimal; the
    * grid stays tiny (a year of 15-min buckets is 35k rows per topic).
    */
  def resample(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Exact.exactSum
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("topic"),
        expr(s"unix_micros(ts) div $ResampleUs").as("bucket"), col("value"))
    // mean = decimal-exact sum / count, UNROUNDED: both operands are
    // bit-identical across engines so the raw quotient already is, and
    // round(…,6) would reintroduce the decimal-half tie-break trap.
    // persist: the small (topic, bucket) agg feeds both the grid span
    // and the join — without it the events scan+agg runs twice.
    val agg = ev.groupBy(col("topic"), col("bucket"))
      .agg(count(lit(1)).as("n"), (exactSum(col("value")) / count(lit(1))).as("mean"))
      .mat
    val grid = agg.groupBy(col("topic"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("topic"), explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val carry = Window.partitionBy(col("topic")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("topic", "bucket"), "left")
      .select(col("topic"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("mean"), ignoreNulls = true).over(carry).as("mean_filled"),
        col("n").isNull.as("is_gap"))
  }

  val resampleSql: String =
    s"""
    WITH ev AS (
      SELECT event_type AS topic, epoch_us(ts) // $ResampleUs AS bucket, value
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    agg AS (
      SELECT topic, bucket, count(*) AS n,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) / count(*) AS mean
      FROM ev GROUP BY 1, 2
    ),
    grid AS (
      SELECT topic, unnest(generate_series(min(bucket), max(bucket))) AS bucket
      FROM agg GROUP BY topic
    )
    SELECT g.topic, g.bucket,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n,
           last_value(a.mean IGNORE NULLS) OVER (PARTITION BY g.topic ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mean_filled,
           a.n IS NULL AS is_gap
    FROM grid g LEFT JOIN agg a ON g.topic = a.topic AND g.bucket = a.bucket"""
}
