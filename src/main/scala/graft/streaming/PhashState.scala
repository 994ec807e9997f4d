package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipeline.Multimodal

/** Streaming perceptual-hash near-duplicate detection — the IMAGE
  * twin of [[LshState]] and the streaming form of the oracle-gated
  * batch pair join (`q_phash_pairs`,
  * [[graft.pipeline.Multimodal.phashPairs]]): assets stream in, each
  * one's 32-bit aHash rides the same pigeonhole bands as the batch
  * join (11+11+10 bits — two codes within Hamming [[radius]] agree on
  * ≥ 1 band), and a near-dup pair emits the moment the LATER copy
  * arrives — no rescan of history, so an image-dedup gate runs at
  * ingest with the batch semantics (PhashStateSpec pins streamed ==
  * batch over any trigger split).
  *
  * Scale: per-key state is ≤ [[MaxBucketMembers]] × 16 bytes, bounded
  * forever; a bucket hotter than the cap is an exact-duplicate image
  * cluster (byte-identical payloads hash identically), which exact
  * dedup should absorb first — overflow is counted in `dropped`, not
  * silently ignored. A pair agreeing in several bands emits once per
  * band (bucket states are independent; consumers take DISTINCT,
  * exactly as the batch query does internally).
  *
  * CAP-SEMANTICS BOUNDARY (deliberate — the [[AudioState]] note,
  * stated once per family): streamed == batch holds exactly while no
  * bucket saturates. At saturation the batch pipeline drops a hot
  * (band, bv) bucket ENTIRELY (retroactively — it counts DISTINCT
  * representative codes), which an append-mode stream cannot mirror
  * (its pre-saturation pairs are emitted), and the stream's cap counts
  * arrival-ordered members. A bucket with `dropped > 0` is a bucket
  * whose verdicts the nightly batch authority re-adjudicates
  * (`q_keep_list_estate`); on any corpus where no bucket exceeds the
  * cap — every gate corpus, by design — the streamed == batch pin is
  * exact.
  */
object PhashState {

  /** Per-bucket member cap (state bound; see scaladoc). */
  val MaxBucketMembers = 256

  /** One banded code row ([[Multimodal.phashBandRows]]'s shape). */
  final case class BandRow(band: Int, bv: Long, assetId: Long, phash: Long)

  /** One held bucket member. */
  final case class Member(assetId: Long, phash: Long)

  /** Bucket state: members in arrival order, plus the overflow count. */
  final case class Bucket(members: Seq[Member], dropped: Long)

  /** Emitted near-dup pair (asset_a < asset_b), Hamming-verified. */
  final case class NearDupPair(asset_a: Long, asset_b: Long, hamming: Int)

  def update(radius: Int, cap: Int)(
      key: (Int, Long), rows: Iterator[BandRow], state: GroupState[Bucket],
  ): Iterator[NearDupPair] = {
    val held = state.getOption.getOrElse(Bucket(Vector.empty, 0L))
    var members = held.members.toVector
    var dropped = held.dropped
    val out = Vector.newBuilder[NearDupPair]
    rows.foreach { r =>
      if (!members.exists(_.assetId == r.assetId)) {
        members.foreach { m =>
          val h = java.lang.Long.bitCount(m.phash ^ r.phash)
          if (h <= radius) {
            val (a, b) =
              if (m.assetId < r.assetId) (m.assetId, r.assetId) else (r.assetId, m.assetId)
            out += NearDupPair(a, b, h)
          }
        }
        if (members.size < cap) members :+= Member(r.assetId, r.phash)
        else dropped += 1L
      }
    }
    state.update(Bucket(members, dropped))
    out.result().iterator
  }

  /** Apply over a (possibly streaming) banded-code Dataset. */
  def apply(
      ds: Dataset[BandRow],
      radius: Int = Multimodal.PhashRadius,
      cap: Int = MaxBucketMembers,
      outputMode: OutputMode = OutputMode.Update(),
  ): Dataset[NearDupPair] = {
    implicit val keyEnc = Encoders.product[(Int, Long)]
    implicit val pairEnc = Encoders.product[NearDupPair]
    implicit val bucketEnc = Encoders.product[Bucket]
    ds.groupByKey(r => (r.band, r.bv))
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout)(
        update(radius, cap))
  }

  /** Banded code stream of a (doc_id, text) DataFrame — the same
    * narrow code + band projection as the batch join (codegen, no
    * shuffle below the state operator).
    */
  def bandStream(docs: DataFrame): Dataset[BandRow] = {
    implicit val enc = Encoders.product[BandRow]
    Multimodal.phashBandRows(Multimodal.phashCodesOf(docs))
      .select(col("band"), col("bv"), col("asset_id").as("assetId"), col("phash"))
      .as[BandRow]
  }
}
