package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analogs of the batch dedup family — the shapes a
  * continuously-ingesting corpus pipeline runs between Kafka and the
  * store:
  *
  *  - [[dedupStream]]: exact in-stream dedup with WATERMARK-BOUNDED
  *    state (`dropDuplicatesWithinWatermark`) — the streaming form of
  *    q_dedup_exact. Plain `dropDuplicates` on a stream keeps every key
  *    forever (state grows with the corpus — a 100 TB non-starter);
  *    bounding retention to the watermark horizon keeps state
  *    proportional to the dup-arrival window instead, which is the only
  *    viable shape at scale and matches how real ingestion dedups
  *    (late exact dups past the horizon are caught by the batch
  *    incremental pass, q_dedup_incremental).
  *
  *  - [[newContentStream]]: stream-vs-corpus membership — the streaming
  *    form of q_dedup_incremental: a LEFT ANTI join of the stream's
  *    content hashes against a static corpus fingerprint relation.
  *    Stream-static joins need no state at all (the static side is
  *    re-planned per micro-batch, broadcast when small, shuffled equi
  *    when not); at 100 TB the corpus side is the same
  *    bucketed-by-hash fingerprint table the batch path uses.
  */
object StreamingDedup {

  /** Exact streaming dedup on content hash, state bounded by the event-
    * time watermark on `tsCol`.
    */
  def dedupStream(input: DataFrame, tsCol: String, textCol: String,
      watermark: String = "10 minutes"): DataFrame =
    input
      .withColumn("content_md5", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_md5")

  /** Rows of the stream whose content hash is NOT in the corpus
    * fingerprint relation (columns must include `content_md5`).
    */
  def newContentStream(input: DataFrame, textCol: String, corpus: DataFrame): DataFrame =
    input
      .withColumn("content_md5", md5(col(textCol)))
      .join(corpus.select(col("content_md5")), Seq("content_md5"), "left_anti")
}
