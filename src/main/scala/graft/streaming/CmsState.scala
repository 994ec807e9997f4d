package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.SketchQueries

/** Streaming Count-Min sketch — the heavy-hitter counterpart of
  * [[KmvState]]/[[HllState]], completing the mergeable-sketch trio:
  * keyed per topic, the state is the fixed depth×width counter grid,
  * and folding a trigger's observations into it IS the sketch merge
  * (cell-wise addition is associative/commutative), so the state after
  * any prefix of triggers equals the batch grid over the concatenated
  * input — CmsStateSpec pins that against the same Column-expression
  * machinery the oracle-gated `q_cms_topk` uses.
  *
  * Emission contract (update mode): every key observed in a trigger
  * re-emits its refreshed point estimate (min over its depth cells —
  * always ≥ the true count, the classic CMS one-sided error). State is
  * O(depth·width) per topic FOREVER, independent of key cardinality —
  * that is the entire point of sketching the stream instead of
  * counting it.
  */
object CmsState {

  /** One observation: a key occurrence on a topic. */
  final case class Obs(topic: String, key: Long)

  /** Held state: the flattened depth×width grid + total observations. */
  final case class Grid(topic: String, seen: Long, cells: Seq[Long])

  /** Emitted per trigger per observed key. */
  final case class PointEst(topic: String, key: Long, estimate: Long, n_seen: Long)

  def update(depth: Int, width: Int)(
      topic: String, rows: Iterator[Obs], state: GroupState[Grid],
  ): Iterator[PointEst] = {
    val cells = state.getOption.map(_.cells.toArray)
      .getOrElse(new Array[Long](depth * width))
    var n = state.getOption.map(_.seen).getOrElse(0L)
    // one digest per trigger-group, and each key's depth coordinates
    // computed ONCE (cached for repeats within the trigger and reused
    // by the emission loop) — per-observation digest instantiation
    // would dominate the fold at streaming rates
    val digest = java.security.MessageDigest.getInstance("MD5")
    val coords = scala.collection.mutable.LinkedHashMap.empty[Long, Array[Int]]
    rows.foreach { o =>
      n += 1L
      val cs = coords.getOrElseUpdate(o.key,
        SketchQueries.cmsCellsJvm(digest, o.key, depth, width))
      var r = 0
      while (r < depth) { cells(r * width + cs(r)) += 1L; r += 1 }
    }
    state.update(Grid(topic, n, cells.toSeq))
    val total = n
    coords.iterator.map { case (k, cs) =>
      var est = Long.MaxValue
      var r = 0
      while (r < depth) { est = math.min(est, cells(r * width + cs(r))); r += 1 }
      PointEst(topic, k, est, total)
    }
  }

  /** Apply over a (possibly streaming) typed Dataset of observations. */
  def apply(
      ds: Dataset[Obs],
      depth: Int = SketchQueries.CmsDepth,
      width: Int = SketchQueries.CmsWidth,
      outputMode: OutputMode = OutputMode.Update(),
  ): Dataset[PointEst] = {
    implicit val keyEnc = Encoders.STRING
    implicit val gridEnc = Encoders.product[Grid]
    implicit val estEnc = Encoders.product[PointEst]
    ds.groupByKey(_.topic)
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout)(update(depth, width))
  }
}
