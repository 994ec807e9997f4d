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
  * agreement, verified by bit arithmetic on the packed fingerprints
  * held in state) emits the moment the LATER copy arrives — audio
  * dedup at ingest with the batch semantics (AudioStateSpec pins
  * streamed == batch over trigger splits).
  *
  * State is GROUPED BY DISTINCT FINGERPRINT (the batch pipeline's
  * representative-collapse, round 13): a bucket holds one [[Group]]
  * per distinct fp — its member ids plus an overflow count — so the
  * bucket cap counts DISTINCT fingerprints exactly like the batch
  * [[graft.pipeline.Audio.AudioBucketCap]]. An identical-fingerprint
  * burst of ANY size occupies one group slot and can never consume
  * the bucket: later distinct fingerprints still match (AudioStateSpec
  * pins the saturating-burst case streamed == batch). Member ids are
  * held because the emitted pairs are member-level, like the batch
  * query's expansion; [[MaxGroupMembers]] bounds that list, with
  * overflow counted per group — a group with `droppedMembers > 0` is
  * exactly what the nightly batch authority (`q_keep_list_estate`)
  * re-adjudicates.
  *
  * Scale: per-bucket state is ≤ cap groups × [[MaxGroupMembers]] ids,
  * bounded forever; overflow is counted, never silent. A pair agreeing
  * in several buckets emits once per bucket (bucket states are
  * independent); consumers take DISTINCT, exactly as the batch query's
  * candidate relation does.
  *
  * The one remaining append-mode boundary (structural, shared with
  * every streaming twin in this repo): the batch cap drops a saturated
  * bucket RETROACTIVELY — no pair from it survives — which an
  * append-mode stream cannot mirror because its pre-saturation pairs
  * are already emitted. The `dropped` counter marks exactly those
  * buckets for the batch authority.
  */
object AudioState {

  /** Max DISTINCT fingerprints per bucket (the batch cap's unit). */
  val MaxBucketMembers = 256

  /** Max held member ids per fingerprint group (state bound for the
    * member-level pair expansion; overflow counted per group).
    */
  val MaxGroupMembers = 256

  /** One landmark posting row of an arriving track. */
  final case class LandmarkRow(slot: Int, lmv: Long, assetId: Long, fp: Long)

  /** One distinct-fingerprint group: held member ids (arrival order)
    * plus the count of members dropped past [[MaxGroupMembers]].
    */
  final case class Group(fp: Long, members: Seq[Long], droppedMembers: Long)

  /** Bucket state: one group per distinct fingerprint (arrival order),
    * plus the count of ARRIVALS whose (new) fingerprint found no group
    * slot past the cap. Note the unit: a single over-cap fingerprint
    * arriving k times counts k — an arrival count is the bounded,
    * saturation-proportional signal (a distinct count would need an
    * unbounded dropped-fp set); read it as "assets this bucket could
    * not group", not "distinct fingerprints lost".
    */
  final case class Bucket(groups: Seq[Group], dropped: Long)

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

  def update(cap: Int, memberCap: Int = MaxGroupMembers)(
      key: (Int, Long), rows: Iterator[LandmarkRow], state: GroupState[Bucket],
  ): Iterator[AudioPair] = {
    val held = state.getOption.getOrElse(Bucket(Vector.empty, 0L))
    var groups = held.groups.toVector
    var dropped = held.dropped
    val out = Vector.newBuilder[AudioPair]
    rows.foreach { r =>
      if (!groups.exists(_.members.contains(r.assetId))) {
        // member-level pairs against every held member of every
        // agreeing group — identical fp at 7, near-miss verified
        groups.foreach { g =>
          val n = agreement(g.fp, r.fp)
          if (n >= Audio.MinLandmarkAgree) g.members.foreach { m =>
            val (a, b) = if (m < r.assetId) (m, r.assetId) else (r.assetId, m)
            out += AudioPair(a, b, n)
          }
        }
        val gi = groups.indexWhere(_.fp == r.fp)
        if (gi >= 0) {
          val g = groups(gi)
          groups =
            if (g.members.length < memberCap)
              groups.updated(gi, g.copy(members = g.members :+ r.assetId))
            else groups.updated(gi, g.copy(droppedMembers = g.droppedMembers + 1L))
        }
        else if (groups.length < cap) groups :+= Group(r.fp, Vector(r.assetId), 0L)
        else dropped += 1L
      }
    }
    state.update(Bucket(groups, dropped))
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
