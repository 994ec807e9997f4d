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
  * State is GROUPED BY DISTINCT CODE (the batch side's
  * representative-collapse, round 13 — the [[AudioState]] structure,
  * stated once per family): a bucket holds one [[Group]] per distinct
  * code, so the bucket cap counts DISTINCT codes exactly like the
  * batch [[Multimodal.PhashBucketCap]]. A byte-identical image burst
  * (blank thumbnails, default avatars) of ANY size occupies one group
  * slot and can never consume the bucket; later distinct codes still
  * match. Member ids are held for the member-level pair expansion,
  * bounded at [[MaxGroupMembers]] with overflow counted per group — a
  * group with `droppedMembers > 0` is what the nightly batch
  * authority (`q_keep_list_estate`) re-adjudicates.
  *
  * Scale: per-bucket state is ≤ cap groups × [[MaxGroupMembers]] ids,
  * bounded forever; overflow is counted, never silent. A pair
  * agreeing in several bands emits once per band (bucket states are
  * independent; consumers take DISTINCT, exactly as the batch query
  * does internally).
  *
  * The one remaining append-mode boundary (structural): the batch cap
  * drops a saturated bucket RETROACTIVELY, which an append-mode
  * stream cannot mirror — its pre-saturation pairs are emitted. The
  * `dropped` counter marks those buckets for the batch authority.
  */
object PhashState {

  /** Max DISTINCT codes per bucket (the batch cap's unit). */
  val MaxBucketMembers = 256

  /** Max held member ids per code group (overflow counted). */
  val MaxGroupMembers = 256

  /** One banded code row ([[Multimodal.phashBandRows]]'s shape). */
  final case class BandRow(band: Int, bv: Long, assetId: Long, phash: Long)

  /** One distinct-code group: held member ids (arrival order) plus
    * the count of members dropped past [[MaxGroupMembers]].
    */
  final case class Group(phash: Long, members: Seq[Long], droppedMembers: Long)

  /** Bucket state: one group per distinct code (arrival order), plus
    * the count of ARRIVALS whose (new) code found no group slot past
    * the cap (one over-cap code arriving k times counts k — the
    * bounded saturation signal; a distinct count would need an
    * unbounded dropped-code set).
    */
  final case class Bucket(groups: Seq[Group], dropped: Long)

  /** Emitted near-dup pair (asset_a < asset_b), Hamming-verified. */
  final case class NearDupPair(asset_a: Long, asset_b: Long, hamming: Int)

  def update(radius: Int, cap: Int, memberCap: Int = MaxGroupMembers)(
      key: (Int, Long), rows: Iterator[BandRow], state: GroupState[Bucket],
  ): Iterator[NearDupPair] = {
    val held = state.getOption.getOrElse(Bucket(Vector.empty, 0L))
    var groups = held.groups.toVector
    var dropped = held.dropped
    val out = Vector.newBuilder[NearDupPair]
    rows.foreach { r =>
      if (!groups.exists(_.members.contains(r.assetId))) {
        groups.foreach { g =>
          val h = java.lang.Long.bitCount(g.phash ^ r.phash)
          if (h <= radius) g.members.foreach { m =>
            val (a, b) = if (m < r.assetId) (m, r.assetId) else (r.assetId, m)
            out += NearDupPair(a, b, h)
          }
        }
        val gi = groups.indexWhere(_.phash == r.phash)
        if (gi >= 0) {
          val g = groups(gi)
          groups =
            if (g.members.length < memberCap)
              groups.updated(gi, g.copy(members = g.members :+ r.assetId))
            else groups.updated(gi, g.copy(droppedMembers = g.droppedMembers + 1L))
        }
        else if (groups.length < cap) groups :+= Group(r.phash, Vector(r.assetId), 0L)
        else dropped += 1L
      }
    }
    state.update(Bucket(groups, dropped))
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
