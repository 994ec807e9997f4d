package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-duplicate detection — the streaming twin
  * of the oracle-gated batch pair join (`q_dedup_minhash`,
  * [[graft.pipeline.Dedup.minhashLsh]]), in the same batch-parity
  * discipline as [[KmvState]]/[[HllState]]/[[DriftState]]: state after
  * any prefix of triggers yields exactly the candidate pairs the batch
  * query finds on the concatenated input (LshStateSpec asserts set
  * equality).
  *
  * Shape: the narrow signature/band projection
  * ([[graft.pipeline.Dedup.bandedSignatures]] — pure codegen, no
  * shuffle) applies to the stream unchanged; state is keyed by
  * (band, band-hash) and holds the bucket's members (doc_id + 16-long
  * signature). A newly arriving document emits a verified candidate
  * pair against every held member with estimated Jaccard ≥ the
  * threshold, then joins the bucket — so pairs stream out the moment
  * the second copy arrives, no rescan of history.
  *
  * Scale: per-key state is [[MaxBucketMembers]] × (8 + 16·8) bytes,
  * bounded; a bucket hotter than the cap is an exact-duplicate cluster
  * (hundreds of documents agreeing on 4 signature positions), which is
  * the exact-dedup pass's job — the cap keeps LSH state from absorbing
  * it, and overflow is counted in the emitted `dropped` flag rows
  * rather than silently ignored. A pair sharing several bands emits
  * once per shared band (bucket states are independent by design — no
  * cross-key coordination in a streaming shuffle); consumers take
  * DISTINCT, exactly as the batch query does internally.
  */
object LshState {

  /** Candidate-pair threshold — the batch query's 0.5. */
  val Threshold = 0.5

  /** Per-bucket member cap (state bound; see scaladoc). */
  val MaxBucketMembers = 256

  /** One banded signature row (the [[graft.pipeline.Dedup.bandedSignatures]]
    * output shape).
    */
  final case class BandRow(band: Int, bh: String, docId: Long, sig: Seq[Long])

  /** One held bucket member. */
  final case class Member(docId: Long, sig: Seq[Long])

  /** Bucket state: members in arrival order, plus the overflow count. */
  final case class Bucket(members: Seq[Member], dropped: Long)

  /** Emitted candidate near-dup pair (doc_a < doc_b), estimate already
    * verified ≥ [[Threshold]].
    */
  final case class CandidatePair(doc_a: Long, doc_b: Long, est_jaccard: Double)

  /** Matching-position estimate — the batch expression's arithmetic
    * (k/16 is an exact double, the batch round-to-6 is a no-op on it).
    */
  def estOf(a: Seq[Long], b: Seq[Long]): Double =
    a.iterator.zip(b.iterator).count { case (x, y) => x == y } / 16.0

  def update(threshold: Double, cap: Int)(
      key: (Int, String), rows: Iterator[BandRow], state: GroupState[Bucket],
  ): Iterator[CandidatePair] = {
    val held = state.getOption.getOrElse(Bucket(Vector.empty, 0L))
    var members = held.members.toVector
    var dropped = held.dropped
    val out = Vector.newBuilder[CandidatePair]
    rows.foreach { r =>
      if (!members.exists(_.docId == r.docId)) {
        members.foreach { m =>
          val est = estOf(m.sig, r.sig)
          if (est >= threshold) {
            val (a, b) = if (m.docId < r.docId) (m.docId, r.docId) else (r.docId, m.docId)
            out += CandidatePair(a, b, est)
          }
        }
        if (members.size < cap) members :+= Member(r.docId, r.sig)
        else dropped += 1L
      }
    }
    state.update(Bucket(members, dropped))
    out.result().iterator
  }

  /** Apply over a (possibly streaming) banded-signature Dataset. */
  def apply(
      ds: Dataset[BandRow],
      threshold: Double = Threshold,
      cap: Int = MaxBucketMembers,
      outputMode: OutputMode = OutputMode.Update(),
  ): Dataset[CandidatePair] = {
    implicit val keyEnc = Encoders.product[(Int, String)]
    implicit val pairEnc = Encoders.product[CandidatePair]
    implicit val bucketEnc = Encoders.product[Bucket]
    ds.groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout)(
        update(threshold, cap))
  }

  /** Banded signature stream of a (doc_id, text) DataFrame. */
  def bandStream(docs: DataFrame): Dataset[BandRow] = {
    implicit val enc = Encoders.product[BandRow]
    graft.pipeline.Dedup.bandedSignatures(docs)
      .select(col("band"), col("bh"), col("doc_id").as("docId"), col("sig"))
      .as[BandRow]
  }

  /** Stream-static fuzzy contamination guard —
    * [[graft.pipeline.Sampling.decontaminateFuzzy]]'s verdict applied
    * at INGEST: each in-flight document joins the static eval band
    * index, candidates verify by signature agreement, and a flagged
    * doc emits the trigger it arrives (so contaminated training data
    * never lands in the corpus at all, instead of being cleaned later).
    *
    * STATELESS: the eval set is benchmark-sized, so its band and
    * signature relation is one small broadcast; the stream side is the
    * same narrow banded projection as [[bandStream]] — no streaming
    * state, no watermark, no shuffle of the stream. A doc matching an
    * eval doc in several bands emits once per band (consumers take
    * DISTINCT, as with the candidate feed); same 8-gram shingles and
    * threshold as the batch pass, so the flagged set is identical
    * (LshStateSpec pins parity).
    */
  def contaminationStream(
      docs: DataFrame, evalDocs: DataFrame, threshold: Double = Threshold,
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    val n = graft.pipeline.Sampling.DecontamN
    val evalB = broadcast(
      graft.pipeline.Dedup.bandedSignatures(evalDocs, n)
        .select(col("doc_id").as("eval_doc"), col("sig").as("sig_e"),
          col("band"), col("bh")))
    graft.pipeline.Dedup.bandedSignatures(docs, n)
      .join(evalB, Seq("band", "bh"))
      .filter(col("doc_id") =!= col("eval_doc"))
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig"), col("sig_e"), (x, y) => x === y), b => b))
          .cast("double") / lit(16.0), 6))
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_id"), col("eval_doc"), col("est_jaccard"))
  }
}
