package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipeline.Audio

/** Streaming audio landmark matching — the AUDIO twin of
  * [[PhashState]] and the streaming form of the oracle-gated batch
  * pair query (`q_audio_dup_pairs`,
  * [[graft.pipeline.Audio.audioDupPairs]]): tracks stream in, each
  * one's 7 (slot, landmark) rows key the same inverted-index buckets
  * as the batch join, and a near-dup pair (strict-majority aligned
  * agreement, verified by bit arithmetic on the two packed
  * fingerprints held in state) emits the moment the LATER copy
  * arrives — audio dedup at ingest with the batch semantics
  * (AudioStateSpec pins streamed == batch over trigger splits).
  *
  * Scale: per-bucket state is ≤ [[MaxBucketMembers]] × 16 bytes,
  * bounded forever; overflow is counted, never silent. A pair
  * agreeing in several buckets emits once per bucket (bucket states
  * are independent); consumers take DISTINCT, exactly as the batch
  * query's candidate relation does.
  *
  * CAP-SEMANTICS BOUNDARY (deliberate, like [[PhashState]]): streamed
  * == batch holds exactly while no bucket saturates. At saturation the
  * two diverge by construction — the batch pipeline drops a hot
  * (slot, lmv) bucket ENTIRELY once it exceeds
  * [[graft.pipeline.Audio.AudioBucketCap]] DISTINCT fingerprints
  * (retroactively: no pair from that bucket survives), which an
  * append-mode stream cannot mirror because its pre-saturation pairs
  * are already emitted. And the stream's cap counts arrival-ordered
  * MEMBERS (assets), not distinct fingerprints, so an
  * identical-fingerprint cluster larger than the cap consumes the
  * bucket and later distinct fingerprints go unmatched there (the
  * `dropped` counter says so — a bucket with `dropped > 0` is exactly
  * a bucket whose verdicts the nightly batch authority should
  * re-adjudicate; `q_keep_list_estate` is that re-adjudication). The
  * caps exist to bound state and candidate volume, not to agree at
  * saturation: on any corpus where no bucket exceeds the cap — every
  * gate corpus, by design — AudioStateSpec's streamed == batch pin is
  * exact.
  */
object AudioState {

  /** Per-bucket member cap (state bound). */
  val MaxBucketMembers = 256

  /** One landmark posting row of an arriving track. */
  final case class LandmarkRow(slot: Int, lmv: Long, assetId: Long, fp: Long)

  /** One held bucket member. */
  final case class Member(assetId: Long, fp: Long)

  /** Bucket state: members in arrival order, plus the overflow count. */
  final case class Bucket(members: Seq[Member], dropped: Long)

  /** Emitted near-dup pair (a < b) with its aligned agreement. */
  final case class AudioPair(a: Long, b: Long, n_agree: Long)

  /** Aligned-landmark agreement of two packed fingerprints — the
    * batch verifier's bit arithmetic, shared.
    */
  private[graft] def agreement(x: Long, y: Long): Long = {
    var w = 0; var n = 0L
    while (w < Audio.Landmarks) {
      if (((x >> (9 * w)) & 511L) == ((y >> (9 * w)) & 511L)) n += 1L
      w += 1
    }
    n
  }

  def update(cap: Int)(
      key: (Int, Long), rows: Iterator[LandmarkRow], state: GroupState[Bucket],
  ): Iterator[AudioPair] = {
    val held = state.getOption.getOrElse(Bucket(Vector.empty, 0L))
    var members = held.members.toVector
    var dropped = held.dropped
    val out = Vector.newBuilder[AudioPair]
    rows.foreach { r =>
      if (!members.exists(_.assetId == r.assetId)) {
        members.foreach { m =>
          val n = agreement(m.fp, r.fp)
          if (n >= Audio.MinLandmarkAgree) {
            val (a, b) =
              if (m.assetId < r.assetId) (m.assetId, r.assetId) else (r.assetId, m.assetId)
            out += AudioPair(a, b, n)
          }
        }
        if (members.length < cap) members :+= Member(r.assetId, r.fp)
        else dropped += 1L
      }
    }
    state.update(Bucket(members, dropped))
    out.result().iterator
  }

  /** The (slot, landmark) posting rows of any (doc_id, text) relation
    * — narrow ops only, stream-safe; one shared derivation with the
    * batch pipeline's landmark rules.
    */
  def landmarkRows(docs: DataFrame): Dataset[LandmarkRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    Audio.postingRows(docs)
      .select(col("slot"), col("lmv"), col("asset_id").as("assetId"), col("fp"))
      .as[LandmarkRow]
  }

  /** Apply over a (possibly streaming) posting Dataset. */
  def apply(
      ds: Dataset[LandmarkRow],
      cap: Int = MaxBucketMembers,
      outputMode: OutputMode = OutputMode.Append(),
  ): Dataset[AudioPair] = {
    implicit val keyEnc = Encoders.product[(Int, Long)]
    implicit val rowEnc = Encoders.product[LandmarkRow]
    implicit val bEnc = Encoders.product[Bucket]
    implicit val pEnc = Encoders.product[AudioPair]
    ds.groupByKey(r => (r.slot, r.lmv))
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout)(update(cap))
  }
}
