package graft.pipeline

import java.sql.Timestamp

import graft.SparkSpec

/** Semantics specs for the privacy operators on planted real-shaped
  * PII: the gate corpus is synthetic word-salad (certifying the
  * all-clean path cross-engine), so detection, pattern precedence, and
  * redaction are pinned here on fixtures that actually contain emails,
  * phones, IPv4s, and long numeric ids.
  */
class PrivacyOpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def writeEvents(rows: Seq[(Long, Long, String)]): String = {
    // (event_id, user_id, props)
    val dir = java.nio.file.Files.createTempDirectory("anon").toString
    rows.map { case (id, uid, props) =>
      (id, new Timestamp(id * 1000), uid, "click", 1.0, props)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ---- q_pii_scan ----------------------------------------------------

  test("piiScan: detects each planted PII class and counts clean docs") {
    val dir = writeDocs(Seq(
      (1L, "contact me@example.com for details", "a"),
      (2L, "call +1-555-123-4567 after hours", "a"),
      (3L, "server at 10.0.0.1 timed out", "b"),
      (4L, "account 123456789 was flagged", "b"),
      (5L, "perfectly clean text here", "b")))
    val out = Privacy.piiScan(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"),
          r.getAs[Long]("n_ipv4"), r.getAs[Long]("n_longnum"), r.getAs[Long]("n_clean")))
      .toMap
    assert(out("a") == ((2L, 1L, 1L, 0L, 0L, 0L)))
    assert(out("b") == ((3L, 0L, 0L, 1L, 1L, 1L)))
  }

  test("piiScan: phone needs separators; bare digit runs count as longnum only") {
    // "5551234567" must not match the phone pattern (no separators) but
    // is >= 6 digits, so it lands in n_longnum; "12345" matches nothing
    val dir = writeDocs(Seq(
      (1L, "id 5551234567 ok", "s"),
      (2L, "short 12345 run", "s")))
    val r = Privacy.piiScan(spark, dir).collect().head
    assert(r.getAs[Long]("n_phone") == 0L)
    assert(r.getAs[Long]("n_longnum") == 1L)
    assert(r.getAs[Long]("n_clean") == 1L)
  }

  // ---- q_anonymize ---------------------------------------------------

  test("anonymize: email precedence keeps its digits out of the numeric pass") {
    // user123@ex.com is redacted as ONE email first, so "123" inside it
    // is never seen by the numeric pass; only the standalone 9 remains
    val dir = writeEvents(Seq((1L, 42L, "user123@ex.com sent 9")))
    val r = Privacy.anonymize(spark, dir).collect().head
    assert(r.getAs[Int]("n_email_redactions") == 1)
    assert(r.getAs[Int]("n_num_redactions") == 1)
    assert(r.getAs[String]("props_redacted") == "<EMAIL> sent <NUM>")
  }

  test("anonymize: user_key is a stable one-way pseudonym, joinable across events") {
    val dir = writeEvents(Seq((1L, 7L, "x"), (2L, 7L, "y"), (3L, 8L, "z")))
    val keys = Privacy.anonymize(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("user_key")).toMap
    assert(keys(1L) == keys(2L))     // same user -> same pseudonym
    assert(keys(1L) != keys(3L))     // different user -> different pseudonym
    // one-way: the key is a fixed-width hex digest, not the raw id (a
    // digest may of course CONTAIN the digit 7 by coincidence)
    assert(keys(1L) != "7" && keys(1L).matches("[0-9a-f]{32}"))
  }

  // ---- q_k_anonymity -------------------------------------------------

  test("kAnonymity: small QI groups flag at_risk, large groups pass; length buckets group correctly") {
    // 5 docs sharing (en, big, bucket 0) -> safe; 1 doc alone in
    // (en, small, bucket 1) -> at risk
    val safe = (1L to 5L).map(i => (i, "x " * 10, "big"))       // n_chars 20 -> bucket 0
    val risky = Seq((9L, "y " * 60, "small"))                    // n_chars 120 -> bucket 1
    val dir = writeDocs(safe ++ risky)
    val rows = Privacy.kAnonymity(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("len_bucket")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Boolean]("at_risk"))).toMap
    assert(rows(("big", 0L)) == (5L, false), s"safe group wrong: $rows")
    assert(rows(("small", 1L)) == (1L, true), s"risky group wrong: $rows")
    assert(rows.size == 2)
  }
}
