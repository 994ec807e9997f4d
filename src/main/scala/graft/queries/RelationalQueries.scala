package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational coverage over the TPC-H-ish star schema: scan + pushdown,
  * hash aggregation, broadcast joins, window-function top-k. These also
  * serve as the bench headliners (Bench.scala) since they scale with sf.
  *
  * Money arithmetic is done in DECIMAL(18,6) so sums are exact and
  * hash-comparable against the DuckDB oracle (see graft.functions.Exact);
  * final columns are cast to DOUBLE.
  */
object RelationalQueries {

  private val D = DecimalType(18, 6)
  private def dec(c: Column): Column = c.cast(D)
  // Trim the sum back to DECIMAL(18,6) before the double cast so both
  // engines produce the identical correctly-rounded double (see
  // graft.functions.Exact.toDouble).
  private def sumD(c: Column): Column = sum(c).cast(D).cast("double")

  // ---- q1_agg: pricing summary (TPC-H Q1 shape) ----------------------

  def q1Agg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val discPrice = (dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount"))).cast(D)
    // to_timestamp resolves under the session timezone (UTC) — a
    // java.sql.Timestamp literal would parse in the JVM default tz
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumD(dec(col("l_quantity"))).as("sum_qty"),
        sumD(dec(col("l_extendedprice"))).as("sum_base_price"),
        sumD(discPrice).as("sum_disc_price"),
        sumD(discPrice * dec(lit(1.0) + col("l_tax"))).as("sum_charge"),
        (sumD(dec(col("l_quantity"))) / count(lit(1))).as("avg_qty"),
        (sumD(dec(col("l_extendedprice"))) / count(lit(1))).as("avg_price"),
        (sumD(dec(col("l_discount"))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )
  }

  val q1AggSql: String =
    """
    SELECT l_returnflag, l_linestatus,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_qty,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_base_price,
      CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6)) * CAST(1.0 + l_tax AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_charge,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) / count(*) AS avg_qty,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) / count(*) AS avg_price,
      CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) / count(*) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus"""

  // ---- q_join_revenue: revenue per nation (broadcast dims) -----------

  def joinRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val sup = Tables.supplier(spark, sfDir)
    val nat = Tables.nation(spark, sfDir)
    val discPrice = (dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount"))).cast(D)
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sumD(discPrice).as("revenue"),
        count(lit(1)).as("n_items"),
      )
  }

  val joinRevenueSql: String =
    """
    SELECT n_name,
      CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS revenue,
      count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name"""

  // ---- q_topk_orders: window-function top-k per group ----------------

  def topkOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
  }

  val topkOrdersSql: String =
    """
    SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders
    ) WHERE rk <= 3"""

  // ---- q_salted_agg: skew-safe two-phase aggregation -----------------

  /** Skew mitigation demonstrated end-to-end: aggregate per
    * (key, salt) first — spreading a hot key over 16 reducers — then
    * merge the partials. Because the engine's sums are exact decimals
    * (associative), the salted result is IDENTICAL to a plain groupBy,
    * and the oracle is the plain GROUP BY. This is the manual form of
    * what AQE's skew-join handling does for joins.
    */
  def saltedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val salted = li
      .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
      .groupBy(col("l_suppkey"), col("salt"))
      .agg(
        count(lit(1)).as("p_cnt"),
        sum(dec(col("l_quantity"))).as("p_qty"),
      )
    salted
      .groupBy(col("l_suppkey"))
      .agg(
        sum(col("p_cnt")).as("n_items"),
        sum(col("p_qty")).cast(D).cast("double").as("sum_qty"),
      )
  }

  val saltedAggSql: String =
    """
    SELECT l_suppkey, count(*) AS n_items,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_suppkey"""

  // ---- q_salted_join: skew-safe replicated-dimension join ------------

  /** Salt fan-out for the skewed join. */
  val JoinSalt = 8

  /** Skew-safe JOIN demonstrated end-to-end (the join-side counterpart
    * of [[saltedAgg]]): the fact side salts each row by a hash residue
    * and the dimension side is REPLICATED once per salt value, so a hot
    * supplier key spreads over [[JoinSalt]] reducers instead of one.
    * The join result is provably identical to the unsalted join (each
    * fact row matches exactly the one replica carrying its salt), so
    * the oracle is the plain join + aggregate. This is the manual form
    * of AQE's skew-join splitting, usable when AQE cannot see the skew
    * (first shuffle, or stateful streaming joins).
    */
  def saltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("salt", pmod(col("l_orderkey"), lit(JoinSalt.toLong)))
    val sup = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
      .withColumn("salt", explode(sequence(lit(0L), lit(JoinSalt - 1L))))
    li.join(sup, li("l_suppkey") === sup("s_suppkey") && li("salt") === sup("salt"))
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec(col("l_quantity"))).cast(D).cast("double").as("sum_qty"))
  }

  val saltedJoinSql: String =
    """
    SELECT s_nationkey, count(*) AS n_items,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1"""

  // ---- q_semi_anti: semi/anti join (F2-style gating) -----------------

  /** Customers with at least one urgent order (semi) counted per market
    * segment alongside customers with none (anti).
    */
  def semiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val withUrgent = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_urgent"))
    val withoutUrgent = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without_urgent"))
    withUrgent.join(withoutUrgent, Seq("c_mktsegment"), "full_outer")
      .select(
        col("c_mktsegment"),
        coalesce(col("n_with_urgent"), lit(0L)).as("n_with_urgent"),
        coalesce(col("n_without_urgent"), lit(0L)).as("n_without_urgent"),
      )
  }

  val semiAntiSql: String =
    """
    WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
    w AS (
      SELECT c_mktsegment, count(*) AS n_with_urgent FROM customer
      WHERE EXISTS (SELECT 1 FROM urgent WHERE o_custkey = c_custkey) GROUP BY 1
    ),
    wo AS (
      SELECT c_mktsegment, count(*) AS n_without_urgent FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM urgent WHERE o_custkey = c_custkey) GROUP BY 1
    )
    SELECT COALESCE(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
           COALESCE(n_with_urgent, 0) AS n_with_urgent,
           COALESCE(n_without_urgent, 0) AS n_without_urgent
    FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment"""
}
