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

  // ---- q_pii_scan ----------------------------------------------------

  /** Phone-shaped tokens: `+1-555-123-4567` / `555 123 4567` styles. */
  val PhonePattern = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** Dotted-quad IPv4 addresses. */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Long digit runs — account numbers, SSN-like ids. */
  val LongNumPattern = "[0-9]{6,}"

  /** PII audit of the document corpus: per source, total match counts
    * for each pattern class (email, phone, IPv4, long numeric id) and
    * how many documents are clean — the release-gate report a corpus
    * must pass before training export. The gate corpus is synthetic
    * word-salad, so it certifies the all-clean case end-to-end;
    * PrivacyOpsSpec plants real-shaped PII and pins detection,
    * precedence, and redaction.
    *
    * Scale: narrow per-row regex counts inside whole-stage codegen
    * (same family as [[anonymize]]), then one hash agg to |sources|
    * rows. Patterns avoid lookaround so Java regex (Spark) and RE2
    * (DuckDB) match identically.
    */
  def piiScan(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val perDoc = docs.select(
      col("source"),
      regexp_count(col("text"), lit(EmailPattern)).as("e"),
      regexp_count(col("text"), lit(PhonePattern)).as("p"),
      regexp_count(col("text"), lit(Ipv4Pattern)).as("i"),
      regexp_count(col("text"), lit(LongNumPattern)).as("l"),
    )
    perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("e")).as("n_email"),
      sum(col("p")).as("n_phone"),
      sum(col("i")).as("n_ipv4"),
      sum(col("l")).as("n_longnum"),
      sum(when(col("e") + col("p") + col("i") + col("l") === 0, 1L).otherwise(0L))
        .as("n_clean"),
    )
  }

  val piiScanSql: String =
    s"""
    WITH d AS (
      SELECT source,
             len(regexp_extract_all(text, '$EmailPattern')) AS e,
             len(regexp_extract_all(text, '$PhonePattern')) AS p,
             len(regexp_extract_all(text, '$Ipv4Pattern')) AS i,
             len(regexp_extract_all(text, '$LongNumPattern')) AS l
      FROM documents
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(e) AS BIGINT) AS n_email,
           CAST(sum(p) AS BIGINT) AS n_phone,
           CAST(sum(i) AS BIGINT) AS n_ipv4,
           CAST(sum(l) AS BIGINT) AS n_longnum,
           CAST(sum(CASE WHEN e + p + i + l = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
    FROM d GROUP BY 1"""

  // ---- q_k_anonymity -------------------------------------------------

  /** Anonymity threshold: a quasi-identifier combination shared by
    * fewer than K documents is re-identification-risky (standard
    * k-anonymity, k = 5).
    */
  val AnonK = 5L

  /** Length-bucket width for the quasi-identifier (exact lengths are
    * near-unique and would make every doc its own group; the bucket is
    * what an adversary observes from a release that truncates/pads).
    */
  val AnonLenBucket = 100L

  /** q_k_anonymity: the release-readiness audit — group the corpus by
    * its quasi-identifier tuple (lang, source, bucketed length) and
    * flag every group smaller than [[AnonK]]: documents in those
    * groups are re-identifiable from metadata alone even after
    * [[anonymize]] scrubbed the payload. The output is the audit
    * table a privacy review signs off on: every QI group, its size,
    * and the at-risk verdict.
    *
    * Scale: one hash aggregation to the QI-group relation (map-side
    * partials; output is |langs|×|sources|×|buckets| rows, corpus-size
    * independent). No second corpus pass — the risky-doc total is
    * derivable from this table.
    */
  def kAnonymity(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source"),
        expr(s"n_chars div $AnonLenBucket").as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("lang"), col("source"), col("len_bucket"), col("n_docs"),
        (col("n_docs") < AnonK).as("at_risk"))

  val kAnonymitySql: String =
    s"""
    SELECT lang, source, n_chars // $AnonLenBucket AS len_bucket,
           count(*) AS n_docs,
           count(*) < $AnonK AS at_risk
    FROM documents GROUP BY 1, 2, 3"""
}
