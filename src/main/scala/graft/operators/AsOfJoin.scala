package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right-side
  * value (by event time) with the same key at or before the left row's
  * time — the temporal lookup the reference's stats-cache read
  * approximates (lib/dsl/DSLHandler.js:180-189 reads "stats as of the
  * last scan").
  *
  * Spark's Scala API has no native as-of join, so this composes one:
  * union both sides tagged, one window pass per key ordered by
  * (time, side) carrying the last right value forward, then keep left
  * rows. One shuffle on the key — same cost class as a sort-merge
  * join, no range explosion; scales to arbitrarily large sides.
  */
object AsOfJoin {

  /** `leftTsUs`/`rightTsUs` are epoch-micros BIGINT columns. Returns
    * all left columns plus `asof_<rightValue>` (null when no right row
    * at or before the left time exists). Right rows order BEFORE left
    * rows at equal timestamps, so an exactly-simultaneous right row is
    * visible ("at or before").
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTsUs: String,
      rightTsUs: String,
      rightValue: String,
  ): DataFrame = {
    val payload = left.columns.filterNot(_ == key).toSeq
    // the right value travels inside a struct: the struct is non-null
    // for every right row even when the VALUE is null, so the carry
    // matches the latest right ROW (a null value from the matched row
    // stays null — same as a real ASOF join) instead of skipping back
    // to an older non-null value
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTsUs))
      .withColumn("__rrow",
        lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v", right.schema(rightValue).dataType)))))
    val r = right.select(
      Seq(col(key), lit(0).as("__side"), col(rightTsUs).as("__ts"),
        struct(col(rightValue).as("v")).as("__rrow")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key)) ++ payload.map(col) :+
        col("__asof.v").as(s"asof_$rightValue"): _*)
  }
}
