package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}

/** Anomaly re-emit cooldown: once an anomaly is emitted for a
  * (topic, path, window_sec) key, further anomalies for that key are
  * suppressed until `cooldownMs` has elapsed since the *last emitted*
  * one (reference: lib/dsl/DSLHandler.js:13,200-210 — a 2-minute TTL
  * memory cache).
  *
  * The "last emitted" anchor makes this inherently sequential per key:
  * emit decisions depend on prior emit decisions, not just the previous
  * row (a `lag` window function would re-arm the cooldown on suppressed
  * rows, which is wrong). Batch implementation: per-key sorted scan via
  * `flatMapGroups`. Keys are (topic, path, window) — low cardinality —
  * and the rows per key are *anomalies*, already a rare subset, so the
  * per-group scan is tiny even at 100 TB input; the heavy lifting
  * happened upstream in the aggregation/join.
  */
object Cooldown {

  /** Filter `anomalies` (must contain topic, path, window_sec, produced)
    * down to emitted ones under the cooldown rule. Deterministic
    * tie-break: rows sorted by (produced, value).
    */
  def applyBatch(anomalies: DataFrame, cooldownMs: Long = graft.core.Dsl.CooldownMs): DataFrame = {
    val schema = anomalies.schema
    val tsIdx = schema.fieldIndex("produced")
    val valIdx =
      if (schema.fieldNames.contains("value")) Some(schema.fieldIndex("value")) else None
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    // event-time in MICROSECONDS to match the oracle and CooldownState
    // (timestamps are micro-precise; millisecond truncation would emit
    // where the oracle suppresses on sub-ms differences)
    def micros(r: Row): Long = {
      val t = r.getTimestamp(tsIdx)
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    }
    anomalies
      .groupByKey(r => (r.getString(schema.fieldIndex("topic")),
                        r.getString(schema.fieldIndex("path")),
                        r.getLong(schema.fieldIndex("window_sec"))))(
        Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.scalaLong))
      .flatMapGroups { (_, rows) =>
        val sorted = rows.toArray.sortBy { r =>
          (micros(r), valIdx.filterNot(r.isNullAt).map(r.getDouble).getOrElse(0.0))
        }
        var lastEmit = Long.MinValue
        sorted.iterator.filter { r =>
          val t = micros(r)
          if (lastEmit == Long.MinValue || t - lastEmit >= cooldownMs * 1000L) { lastEmit = t; true }
          else false
        }
      }
  }
}
