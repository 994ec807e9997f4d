package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.SketchQueries

/** Streaming form of the per-crawl profile state
  * ([[graft.queries.IncrementalProfile]]): keyed state per column
  * holding exactly the batch state row — row/value counts, extrema,
  * and the KMV sketch (k smallest distinct hashes, merged via the
  * shared [[KmvState.merge]]). Every profile metric is mergeable, so
  * the state after any prefix of triggers equals the batch state over
  * the concatenated input (ProfileStateSpec asserts this against
  * [[graft.queries.IncrementalProfile.stateOf]]) — which means the
  * crawl's profile state is COMPLETE the moment its stream closes:
  * the nightly estate profile and the cross-crawl drift gate
  * ([[graft.queries.IncrementalProfile.driftOf]] accepts the streamed
  * relation directly) run with zero additional passes. State is O(k)
  * per column forever; a mid-crawl trigger's emission is the live
  * "is this crawl's extractor already drifting?" probe.
  *
  * String extrema compare by UTF-8 bytes ([[utf8Lt]]) — the exact
  * order the batch min/max applies to UTF8String, so stream and batch
  * agree on any text, supplementary-plane characters included. The
  * hash reprs themselves are the batch rules verbatim —
  * [[observations]] is one shared derivation, so stream and batch
  * cannot drift.
  */
object ProfileState {

  /** One column observation of one row: `hv` is the md5-derived
    * 60-bit hash of the batch repr (None = the value was null), `num`
    * / `str` carry the extremum payload for numeric / string columns.
    */
  final case class Obs(col_name: String, hv: Option[Long], num: Option[Double], str: Option[String])

  /** Held (and emitted) state — the batch profile-state row. */
  final case class ColState(
      col_name: String, n_rows: Long, cnt: Long,
      min_num: Option[Double], max_num: Option[Double],
      min_str: Option[String], max_str: Option[String],
      top: Seq[Long])

  /** Per-event observations — the SAME column reprs the batch state
    * hashes ([[graft.queries.IncrementalProfile.stateOf]]), shared by
    * the streaming fold. Works on a static or streaming events frame.
    */
  def observations(ev0: DataFrame): Dataset[Obs] = {
    val spark = ev0.sparkSession
    import spark.implicits._
    val ev = ev0.withColumn("ts_us", expr("unix_micros(ts)"))
    def hvOf(s: Column): Column =
      conv(substring(md5(s), 1, 15), 16, 10).cast("long")
    def numericObs(c: String, repr: Column, numv: Column) = struct(
      lit(c).as("col_name"), hvOf(repr).as("hv"),
      numv.cast("double").as("num"), lit(null).cast("string").as("str"))
    def stringObs(c: String) = struct(
      lit(c).as("col_name"), hvOf(col(c)).as("hv"),
      lit(null).cast("double").as("num"), col(c).as("str"))
    val obs = array(
      numericObs("event_id", col("event_id").cast("string"), col("event_id")),
      numericObs("user_id", col("user_id").cast("string"), col("user_id")),
      numericObs("ts_us", col("ts_us").cast("string"), col("ts_us")),
      numericObs("value",
        (col("value").cast("decimal(18,6)") * lit(1000000)).cast("long").cast("string"),
        col("value")),
      stringObs("event_type"),
      stringObs("props"))
    ev.select(explode(obs).as("o")).select(col("o.*")).as[Obs]
  }

  private def minOpt[T](a: Option[T], b: Option[T])(lt: (T, T) => Boolean): Option[T] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(if (lt(x, y)) x else y)
      case _ => a.orElse(b)
    }

  /** Compare strings by their UTF-8 BYTE sequences (unsigned) — the
    * order Spark's batch min/max applies to UTF8String. Java's
    * `compareTo` is UTF-16 code-unit order, which diverges for
    * supplementary-plane characters vs BMP chars in [U+E000, U+FFFF]
    * (surrogates sort below them in UTF-16, their UTF-8 bytes above) —
    * so a corpus holding both an emoji and a private-use char got
    * different extrema from stream and batch.
    */
  private[streaming] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  def update(k: Int)(
      colName: String, rows: Iterator[Obs], state: GroupState[ColState],
  ): Iterator[ColState] = {
    val prev = state.getOption.getOrElse(
      ColState(colName, 0L, 0L, None, None, None, None, Nil))
    var nRows = prev.n_rows
    var cnt = prev.cnt
    var minNum = prev.min_num; var maxNum = prev.max_num
    var minStr = prev.min_str; var maxStr = prev.max_str
    val hvs = scala.collection.mutable.ArrayBuffer.empty[Long]
    rows.foreach { o =>
      nRows += 1L
      o.hv.foreach { h => cnt += 1L; hvs += h }
      minNum = minOpt(minNum, o.num)(_ < _)
      maxNum = minOpt(maxNum, o.num)(_ > _)
      minStr = minOpt(minStr, o.str)(utf8Lt)
      maxStr = minOpt(maxStr, o.str)((a, b) => utf8Lt(b, a))
    }
    val next = ColState(colName, nRows, cnt, minNum, maxNum, minStr, maxStr,
      KmvState.merge(prev.top, hvs.iterator, k))
    state.update(next)
    Iterator.single(next)
  }

  /** Apply over a (possibly streaming) observation Dataset. */
  def apply(
      ds: Dataset[Obs],
      k: Int = SketchQueries.KmvK,
      outputMode: OutputMode = OutputMode.Update(),
  ): Dataset[ColState] = {
    implicit val keyEnc = Encoders.STRING
    implicit val obsEnc = Encoders.product[Obs]
    implicit val stEnc = Encoders.product[ColState]
    ds.groupByKey(_.col_name)
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout)(update(k))
  }
}
