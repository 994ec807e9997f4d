package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

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
}
