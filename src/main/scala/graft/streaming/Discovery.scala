package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StructType}

import graft.core.{Dsl, FieldConfig, TopicConfig}
import graft.functions.SchemaFlatten

/** Topic + field (schema) discovery, re-expressed from the reference's
  * Discovery loop (lib/discovery/Discovery.js):
  *
  *  - topic discovery = set difference between the current topic list
  *    and the known set, with blacklist subtraction (SO1/SO2,
  *    Discovery.js:94-139); change detection via a hash of the sorted
  *    list (ST3, Discovery.js:34-36).
  *  - field discovery = sample one message per topic per interval
  *    (ST4, Discovery.js:153-160), infer the JSON schema, flatten to
  *    numeric leaf paths (P2/P3, FieldIdentifier.js), and rebuild the
  *    DSL with static-config-wins merge (ST6, DSLHandler.js:316-343).
  *
  * The Kafka AdminClient topic scan (S3) is injected as a `() =>
  * Seq[String]` so the loop is testable without a broker; in production
  * pass [[KafkaTopicLister]], the AdminClient-backed implementation.
  */
class Discovery(
    spark: SparkSession,
    staticDsl: Dsl,
    blacklist: Set[String] = Set.empty,
    defaultWindows: Seq[String] = Dsl.DefaultFieldWindows,
    beforeDiscoveryFieldConfig: (String, String) => Option[Seq[String]] = (_, _) => None,
    counters: Option[Counters] = None,
    maxTopicsPerScan: Int = Discovery.DefaultMaxTopicsPerScan,
) {

  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger(classOf[Discovery])

  private val knownTopics = new AtomicReference[Set[String]](Set.empty)
  private val schemaHashes = new AtomicReference[Map[String, Int]](Map.empty)
  // accumulated DISCOVERED config, kept separate from the static DSL so
  // a re-discovery REPLACES a topic's earlier discovered fields (the
  // reference rebuilds discovered entries on every schema change,
  // DSLHandler.js:316-343; only explicit static config wins the merge)
  private val discoveredAccum = new AtomicReference[Map[String, TopicConfig]](Map.empty)
  private val currentDsl = new AtomicReference[Dsl](staticDsl)

  def dsl: Dsl = currentDsl.get()
  def topics: Set[String] = knownTopics.get()

  /** Discovered fields per topic (reference:
    * lib/discovery/Discovery.js:184-186 `getDiscoveredFields`).
    */
  def discoveredFields: Map[String, Seq[String]] =
    discoveredAccum.get().map { case (t, tc) => t -> tc.fields.map(_.path) }

  /** Per-topic schema hashes (reference:
    * lib/discovery/Discovery.js:180-182 `getHashes`).
    */
  def hashes: Map[String, Int] = schemaHashes.get()

  final case class TopicDiff(created: Set[String], deleted: Set[String])

  /** One topic-discovery scan: blacklist subtraction + set diff against
    * the known set. Returns the diff (both directions, Discovery.js:116-134).
    */
  def discoverTopics(listTopics: () => Seq[String]): TopicDiff = {
    val current = listTopics().toSet -- blacklist
    val known = knownTopics.get()
    val diff = TopicDiff(created = current -- known, deleted = known -- current)
    knownTopics.set(current)
    counters.foreach(_.topicUpdates.add(diff.created.size.toLong + diff.deleted.size.toLong))
    diff
  }

  /** Order-insensitive hash of a name list (the reference's sorted
    * murmur3, Discovery.js:34-36; engine-defined value, only compared).
    */
  def listHash(names: Seq[String]): Int = names.sorted.mkString("\u0000").hashCode

  /** One field-discovery pass over a batch of normalized messages
    * (topic, value: json string): sample the FIRST message per topic
    * (ST4), infer numeric leaf paths, and if a topic's schema hash
    * changed, rebuild the DSL (static config wins). Returns the topics
    * whose schema changed.
    */
  def discoverFields(batch: DataFrame): Set[String] = {
    import spark.implicits._
    // first message per topic — dropDuplicates on topic is the
    // distributed form of the reference's per-topic sampling gate.
    // The collect is bounded by TOPIC cardinality, not batch size, and
    // additionally hard-capped at maxTopicsPerScan. UNKNOWN topics are
    // taken ahead of the cap via an anti join against the known set —
    // a bare limit would drain the same deterministic topic subset
    // every scan and starve the rest forever; with the split, each
    // scan admits up to cap NEW topics, so discovery provably advances
    // (known topics are re-sampled separately, also capped, for
    // schema-change detection).
    val deduped = batch
      .filter(col("topic").isNotNull && col("value").isNotNull)
      .dropDuplicates("topic")
      .select(col("topic"), col("value"))
    val known = schemaHashes.get().keySet
    val (freshSide, revisitSide) =
      if (known.isEmpty) (deduped, None)
      else {
        val knownDf = broadcast(known.toSeq.toDF("topic"))
        (deduped.join(knownDf, Seq("topic"), "left_anti"),
          Some(deduped.join(knownDf, Seq("topic"), "left_semi")))
      }
    val fresh = freshSide.limit(maxTopicsPerScan + 1).as[(String, String)].collect()
    if (fresh.length > maxTopicsPerScan)
      log.warn(s"field discovery scan saw more than $maxTopicsPerScan new topics; " +
        "the overflow is admitted by later scans (raise maxTopicsPerScan to widen)")
    val revisit = revisitSide
      .map(_.limit(maxTopicsPerScan).as[(String, String)].collect())
      .getOrElse(Array.empty[(String, String)])
    val samples = fresh.take(maxTopicsPerScan) ++ revisit

    val changed = samples.flatMap { case (topic, json) =>
      val paths = numericPathsOf(json)
      val h = listHash(paths)
      val prev = schemaHashes.get()
      if (prev.get(topic).contains(h)) None
      else {
        // record the hash even when no numeric path was found: the topic
        // becomes 'known' (leaves the capped fresh lane — otherwise a
        // population of path-less topics larger than maxTopicsPerScan
        // could be re-drawn forever and starve genuinely new topics) and
        // the revisit lane still catches a later schema change, which
        // lands here with a different hash
        schemaHashes.set(prev + (topic -> h))
        if (paths.isEmpty) None else Some(topic -> paths)
      }
    }.toMap

    if (changed.nonEmpty) {
      val fresh = changed.toSeq.sortBy(_._1).flatMap { case (topic, paths) =>
        val fields = paths.flatMap { p =>
          val windows = beforeDiscoveryFieldConfig(topic, p).getOrElse(defaultWindows)
          val secs = windows.flatMap(graft.core.Durations.parseSeconds).distinct
          // a field with zero valid windows is dropped (same rule as
          // Dsl.parse) — otherwise retentionSeconds on an empty window
          // list would throw downstream
          if (secs.isEmpty) None else Some(FieldConfig(p, secs))
        }
        if (fields.isEmpty) None else Some(topic -> TopicConfig(topic, fields))
      }.toMap
      val accum = discoveredAccum.get() ++ fresh // replace per topic
      discoveredAccum.set(accum)
      currentDsl.set(staticDsl.mergeDiscovered(Dsl(accum.toSeq.sortBy(_._1).map(_._2))))
    }
    counters.foreach(_.fieldUpdates.add(changed.size.toLong))
    changed.keySet
  }

  /** Schema inference for one JSON payload (the per-topic sample).
    * Exposed for callers that want the full Spark schema; the discovery
    * loop itself uses [[numericPathsOf]], which needs no Spark job.
    */
  def inferSchema(json: String): StructType = {
    import spark.implicits._
    spark.read.json(Seq(json).toDS()).schema
  }

  /** Numeric leaf dot paths straight from one JSON sample via a
    * driver-side Jackson walk — the in-process analog of the
    * reference's recursive object walk (lib/discovery/
    * FieldIdentifier.js:9-57). Replaces a per-topic `spark.read.json`
    * job: at the reference's "every topic on the cluster" cardinality
    * that was O(topics) driver jobs per discovery scan. Semantics match
    * [[numericPaths]] over an inferred schema: numbers are leaves,
    * objects recurse to dot paths, arrays/strings/booleans/nulls are
    * skipped; paths come back sorted (Spark's inference also
    * canonicalizes field order) and malformed JSON yields no paths
    * (the reference's malformed guard).
    */
  def numericPathsOf(json: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    def walk(prefix: String, n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
      if (n.isNumber) Seq(prefix)
      else if (n.isObject)
        n.properties().asScala.toSeq.flatMap { e =>
          walk(if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}", e.getValue)
        }
      else Nil
    try walk("", Discovery.Mapper.readTree(json)).sorted
    catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Numeric leaf dot paths of a schema (P2/P3): nested structs flatten
    * to dot paths; binary skipped; arrays surfaced as their own leaf.
    */
  def numericPaths(schema: StructType): Seq[String] =
    SchemaFlatten.leaves(schema)
      .filter(_.dataType.isInstanceOf[NumericType])
      .map(_.path)
}

object Discovery {
  /** Driver-memory guard: at most this many (topic, sample) rows are
    * collected per field-discovery scan; overflow topics are picked up
    * by later scans. 10k samples ≈ a few MB — far below driver limits —
    * while still converging a large cluster in a handful of scans.
    */
  val DefaultMaxTopicsPerScan: Int = 10000

  /** Shared Jackson mapper for [[Discovery.numericPathsOf]] (Jackson
    * ships with Spark; thread-safe after construction).
    */
  private[streaming] val Mapper = new com.fasterxml.jackson.databind.ObjectMapper()
}
