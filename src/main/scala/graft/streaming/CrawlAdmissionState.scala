package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the crawl-level go/no-go
  * ([[IngestGate.crawlAdmissionOf]]): fold the per-document admission
  * verdicts AS THEY ARRIVE into running counts and emit the running
  * crawl verdict every trigger. The operational point is EARLY ABORT:
  * a busted crawl (extractor regression → garbage burst; re-crawl of
  * known content → dup burst) identifies itself after a fraction of
  * its documents, and stopping ingest then saves the rest of a
  * 100 TB pass — the batch `q_crawl_admission` row is what the
  * completed crawl records; this is the same verdict observed live.
  *
  * State is one counts row per crawl (O(1) forever); rates and the
  * verdict re-derive per emission from the SAME thresholds, and
  * CrawlAdmissionStateSpec pins the final emission equal to the batch
  * fold over the concatenated input. `min_arrivals` guards the abort
  * signal against deciding on a handful of early documents (the
  * running verdict reports `decided = false` until the sample is
  * meaningful — thresholds on 3 documents are noise, not signal).
  */
object CrawlAdmissionState {

  /** One per-document admission verdict, keyed by its crawl. */
  final case class CrawlVerdict(crawl: String, verdict: String)

  /** Held counts (and the emitted running record). */
  final case class Counts(
      crawl: String, n_arriving: Long, n_admit: Long, n_dup: Long,
      n_garbage: Long, n_image_dup: Long, n_audio_dup: Long, n_semantic_dup: Long)

  /** Emitted per trigger: the running rates + verdict. */
  final case class RunningVerdict(
      crawl: String, n_arriving: Long, n_admit: Long, n_dup: Long,
      n_garbage: Long, n_image_dup: Long, n_audio_dup: Long, n_semantic_dup: Long,
      dup_rate: Double, garbage_rate: Double,
      decided: Boolean, admit_crawl: Boolean)

  private val DupSet =
    Set("text_exact_dup", "text_near_dup", "image_dup", "audio_dup", "semantic_dup")

  /** Classification shared with the batch fold's column expressions:
    * dup = a copy of the estate; garbage = any other text_ failure.
    */
  private[streaming] def fold(c: Counts, verdict: String): Counts = c.copy(
    n_arriving = c.n_arriving + 1L,
    n_admit = c.n_admit + (if (verdict == "admit") 1L else 0L),
    n_dup = c.n_dup + (if (DupSet(verdict)) 1L else 0L),
    n_garbage = c.n_garbage +
      (if (verdict.startsWith("text_") && !DupSet(verdict)) 1L else 0L),
    n_image_dup = c.n_image_dup + (if (verdict == "image_dup") 1L else 0L),
    n_audio_dup = c.n_audio_dup + (if (verdict == "audio_dup") 1L else 0L),
    n_semantic_dup = c.n_semantic_dup + (if (verdict == "semantic_dup") 1L else 0L))

  /** The batch fold's exact rate + threshold arithmetic. */
  private[streaming] def running(c: Counts, minArrivals: Long): RunningVerdict = {
    // Spark's round(col, 6) is BigDecimal HALF_UP — mirror it exactly
    def rate(n: Long): Double =
      if (c.n_arriving == 0L) 0.0
      else BigDecimal(n.toDouble / c.n_arriving.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dr = rate(c.n_dup); val gr = rate(c.n_garbage)
    RunningVerdict(c.crawl, c.n_arriving, c.n_admit, c.n_dup, c.n_garbage,
      c.n_image_dup, c.n_audio_dup, c.n_semantic_dup, dr, gr,
      decided = c.n_arriving >= minArrivals,
      admit_crawl = dr <= IngestGate.CrawlDupRateMax &&
        gr <= IngestGate.CrawlGarbageRateMax)
  }

  def update(minArrivals: Long)(
      crawl: String, rows: Iterator[CrawlVerdict], state: GroupState[Counts],
  ): Iterator[RunningVerdict] = {
    var c = state.getOption.getOrElse(Counts(crawl, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    rows.foreach(r => c = fold(c, r.verdict))
    state.update(c)
    Iterator.single(running(c, minArrivals))
  }

  /** Apply over a (possibly streaming) verdict Dataset. */
  def apply(
      ds: Dataset[CrawlVerdict],
      minArrivals: Long = 100L,
      outputMode: OutputMode = OutputMode.Update(),
  ): Dataset[RunningVerdict] = {
    implicit val keyEnc = Encoders.STRING
    implicit val vEnc = Encoders.product[CrawlVerdict]
    implicit val cEnc = Encoders.product[Counts]
    implicit val rEnc = Encoders.product[RunningVerdict]
    ds.groupByKey(_.crawl)
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout)(update(minArrivals))
  }
}
