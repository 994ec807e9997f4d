package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Privacy operators for a training-data pipeline: pseudonymization of
  * stable identifiers and pattern-based redaction of payload text —
  * the scrub step that runs before any corpus leaves the ingestion
  * boundary.
  *
  * Scale: both are narrow per-row projections (hash + regex inside
  * whole-stage codegen, no UDFs, no shuffle) — they stream through
  * 100 TB at scan speed and co-locate with whatever follows.
  */
object Privacy {

  /** Email-shaped tokens — redacted first so their digits are not
    * double-counted by the numeric pass.
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** Digit runs: numeric identifiers, phone fragments, zip codes. */
  val NumPattern = "[0-9]+"

  // ---- q_anonymize ---------------------------------------------------

  /** Anonymize the event stream: replace the stable `user_id` with a
    * one-way md5 pseudonym (joinable across events, not reversible to
    * the id space) and redact email-shaped then numeric spans from the
    * free-form `props` payload, reporting per-row redaction counts so
    * the pipeline can monitor scrub rates.
    */
  def anonymize(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        md5(col("user_id").cast("string")).as("user_key"),
        col("event_type"),
        regexp_count(col("props"), lit(EmailPattern)).as("n_email_redactions"),
        regexp_count(regexp_replace(col("props"), EmailPattern, "<EMAIL>"), lit(NumPattern))
          .as("n_num_redactions"),
        regexp_replace(regexp_replace(col("props"), EmailPattern, "<EMAIL>"),
          NumPattern, "<NUM>").as("props_redacted"),
      )

  val anonymizeSql: String = {
    // DuckDB plain string literals keep backslashes verbatim, so the
    // Java-regex pattern text embeds unchanged (RE2 reads \. the same)
    val email = EmailPattern
    s"""
    SELECT event_id,
           md5(CAST(user_id AS VARCHAR)) AS user_key,
           event_type,
           len(regexp_extract_all(props, '$email')) AS n_email_redactions,
           len(regexp_extract_all(regexp_replace(props, '$email', '<EMAIL>', 'g'), '$NumPattern'))
             AS n_num_redactions,
           regexp_replace(regexp_replace(props, '$email', '<EMAIL>', 'g'),
                          '$NumPattern', '<NUM>', 'g') AS props_redacted
    FROM events"""
  }
}
