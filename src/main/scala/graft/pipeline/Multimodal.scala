package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables
import graft.core.Mat.MatOps

/** Multimodal column plumbing: media (image/audio/video) rides through
  * the pipeline as an opaque `BINARY` column plus typed metadata; decode
  * / feature-extraction run as partition-iterator transforms (the Scala
  * analog of `mapInPandas`: one batch per partition, vectorizable,
  * nothing row-at-a-time on the driver).
  *
  * The actual codec is NOT available in this environment, so
  * [[FakeCodec]] is a clearly-marked deterministic stand-in: it derives
  * "decoded" properties purely from the bytes (length, first/last
  * bytes, rolling checksum). The Spark-side plumbing — schema,
  * partitioning, batch iteration, feature schema — is real and is what
  * a production codec would plug into.
  *
  * Scale notes: media blobs are large; the media relation is carried
  * (id, meta, bytes) with features projected into a narrow relation as
  * early as possible so downstream shuffles never move the blobs.
  * Partitioning by id keeps decode embarrassingly parallel.
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  final case class MediaAsset(
      asset_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long,
  )

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: Long,
      head_byte: Int,
      frame_count: Int,
      mean_luma: Double,
  )

  /** Deterministic stand-in for the media codec (no image/audio libs in
    * this container). A real implementation would replace ONLY this
    * object; everything else is production plumbing.
    */
  object FakeCodec {
    /** "Decode" = derive stable pseudo-features from raw bytes. */
    def decode(a: MediaAsset): MediaFeatures = {
      val bytes = a.payload
      var checksum = 0L
      var lumaSum = 0L
      var i = 0
      while (i < bytes.length) {
        checksum = (checksum * 131 + (bytes(i) & 0xff)) % 1000000007L
        lumaSum += (bytes(i) & 0xff)
        i += 1
      }
      val frames =
        if (a.media_type == "video") math.max(1, (a.duration_ms / 40L).toInt) // ~25fps
        else 1
      MediaFeatures(
        asset_id = a.asset_id,
        media_type = a.media_type,
        n_bytes = bytes.length.toLong,
        checksum = checksum,
        head_byte = if (bytes.nonEmpty) bytes(0) & 0xff else -1,
        frame_count = frames,
        mean_luma = if (bytes.isEmpty) 0.0 else lumaSum.toDouble / bytes.length,
      )
    }

    /** Frame sampling: pick every `stride`-th frame index. */
    def sampleFrames(frameCount: Int, stride: Int): Seq[Int] =
      0 until frameCount by stride

    /** Resize metadata: fit (w, h) inside (maxW, maxH) preserving
      * aspect ratio with integer math (floor), never upscaling. A real
      * codec would resize the payload; the metadata contract is what
      * the pipeline schema carries.
      */
    def resizeDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
      if (w <= 0 || h <= 0) (0, 0)
      else if (w <= maxW && h <= maxH) (w, h)
      else {
        // scale = min(maxW/w, maxH/h) in exact rational math
        val byW = (w.toLong * maxH, h.toLong * maxW) // compare w/h vs maxW/maxH
        if (byW._1 <= byW._2) (((w.toLong * maxH) / h).toInt, maxH)
        else (maxW, ((h.toLong * maxW) / w).toInt)
      }
    }
  }

  /** Decode stage: partition-iterator transform over the media relation
    * (mapPartitions — the batch shape a vectorized codec needs).
    */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(FakeCodec.decode))
  }

  /** Build a synthetic media relation from the documents table (text
    * bytes as the opaque payload) — exercises the exact schema and
    * partition flow real media would use.
    */
  def syntheticAssets(spark: SparkSession, sfDir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 25L).as("duration_ms"),
      )
      .as[MediaAsset]
  }

  /** q_multimodal: full plumbing end-to-end — synthesize assets, decode
    * via the partition-iterator stage, return the narrow feature
    * relation. Oracle recomputes the same checksum/luma from the text
    * bytes in SQL.
    */
  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = extractFeatures(syntheticAssets(spark, sfDir))
    feats.toDF().select(
      col("asset_id"), col("media_type"), col("n_bytes"), col("checksum"),
      col("head_byte"), col("frame_count"), round(col("mean_luma"), 6).as("mean_luma"))
  }

  /** q_multimodal_frames: frame-sampling stage — every video asset
    * exploded into its sampled frame indices (stride 10) plus the
    * resize-metadata transform (fit into 320x240). Pure integer math,
    * mirrored in SQL.
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val assets = syntheticAssets(spark, sfDir).toDF()
      .filter(col("media_type") === "video")
      .withColumn("frame_count",
        greatest(lit(1L), expr("duration_ms DIV 40")).cast("int"))
    assets
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("frame_count") - 1, lit(10))))
      .withColumn("resized_w",
        when(col("width") <= 320 && col("height") <= 240, col("width"))
          .when(col("width").cast("long") * 240 <= col("height").cast("long") * 320,
            (col("width").cast("long") * 240 / col("height")).cast("int"))
          .otherwise(lit(320)))
      .withColumn("resized_h",
        when(col("width") <= 320 && col("height") <= 240, col("height"))
          .when(col("width").cast("long") * 240 <= col("height").cast("long") * 320, lit(240))
          .otherwise((col("height").cast("long") * 320 / col("width")).cast("int")))
      .select(col("asset_id"), col("frame_idx"), col("frame_count"),
        col("width"), col("height"), col("resized_w"), col("resized_h"))
  }

  val frameSampleSql: String =
    """
    WITH v AS (
      SELECT doc_id AS asset_id,
             CAST(n_chars % 640 AS INT) AS width,
             CAST(n_chars % 480 AS INT) AS height,
             CAST(greatest(1, (n_chars * 25) // 40) AS INT) AS frame_count
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT asset_id, unnest(generate_series(0, frame_count - 1, 10)) AS frame_idx,
           frame_count, width, height,
           CASE WHEN width <= 320 AND height <= 240 THEN width
                WHEN width * 240 <= height * 320 THEN CAST((width * 240) // height AS INT)
                ELSE 320 END AS resized_w,
           CASE WHEN width <= 320 AND height <= 240 THEN height
                WHEN width * 240 <= height * 320 THEN 240
                ELSE CAST((height * 320) // width AS INT) END AS resized_h
    FROM v"""

  // ---- q_phash_pairs -------------------------------------------------

  /** Max Hamming distance for perceptual near-duplicates. */
  val PhashRadius = 2

  /** 32-bit perceptual hash (aHash) per asset: sample 32 evenly spaced
    * "pixels" from the payload (deterministic stand-in for a decoded
    * thumbnail — a real codec swaps ONLY the pixel extraction), set bit
    * j when pixel j is above the mean (`pix·32 > sum` keeps it in
    * integer math). Identical structure to production image aHash:
    * downsample → threshold against mean → bit string. Code width is a
    * scale lever: a narrower code saturates with corpus growth (pair
    * volume grows quadratically in the per-code collision rate);
    * production systems use 64-bit pHash — same plan, wider bands.
    */
  def phashCodes(spark: SparkSession, sfDir: String): DataFrame =
    phashCodesOf(Tables.documents(spark, sfDir))

  /** The code computation over any (doc_id, text) relation — narrow
    * ops only, so it applies to a STREAMING DataFrame unchanged
    * ([[graft.streaming.PhashState]] consumes it at ingest).
    */
  def phashCodesOf(docs: DataFrame): DataFrame =
    docs
      .filter(length(col("text")) > 0)
      .withColumn("pix",
        expr("transform(sequence(0, 31), j -> ascii(substr(text, 1 + (j * (length(text) - 1)) div 32, 1)))"))
      .withColumn("psum", expr("aggregate(pix, 0, (a, x) -> a + x)"))
      .withColumn("phash",
        expr("""aggregate(sequence(0, 31), CAST(0 AS BIGINT),
                 (acc, j) -> acc + CASE WHEN element_at(pix, j + 1) * 32 > psum
                                        THEN shiftleft(CAST(1 AS BIGINT), j)
                                        ELSE CAST(0 AS BIGINT) END)"""))
      .select(col("doc_id").as("asset_id"), col("phash"))

  /** q_phash_pairs: perceptual-hash near-duplicate pairs at Hamming
    * radius ≤ 2 — image dedup without decoding twice.
    *
    * Scale: pigeonhole banding like the SimHash path — the 32-bit code
    * splits into 3 bands (11+11+10 bits); two codes within Hamming 2
    * agree exactly on ≥ 1 band, so candidates come from an equi
    * self-join on (band, band_value), refined by `bit_count(xor)`.
    * Never an all-pairs join; the oracle uses the all-pairs form as
    * the semantic definition (same output set). Band values inherit
    * aHash's skew (structurally similar payloads share band values —
    * those buckets are where the near-dups live), so candidate volume
    * is output-driven; widening the code is the pressure valve.
    */
  /** The pigeonhole band explode of a code relation (11+11+10 bits) —
    * narrow, shared by the batch pair join and the streaming twin.
    */
  def phashBandRows(codes: DataFrame): DataFrame =
    codes.select(
      col("asset_id"), col("phash"),
      explode(array(
        struct(lit(0).as("band"), (col("phash") % 2048).as("bv")),
        struct(lit(1).as("band"), (shiftright(col("phash"), 11) % 2048).as("bv")),
        struct(lit(2).as("band"), (shiftright(col("phash"), 22) % 1024).as("bv")),
      )).as("bd"))
      .select(col("asset_id"), col("phash"), col("bd.band").as("band"), col("bd.bv").as("bv"))

  /** The phash PAIR GRAPH, materialized once per (application,
    * dataset) — the image-side `clusterPairs` discipline: the pair
    * query and the cluster resolver both consume it, and an image
    * dedup pass computes its pair graph once. [[resetPhashMemo]] is
    * the test seam.
    */
  def phashPairs(spark: SparkSession, sfDir: String): DataFrame =
    phashPairsMemo.getOrElseUpdate(
      s"${spark.sparkContext.applicationId}|$sfDir", {
        // the .mat on codes: without a boundary, CollapseProject
        // inlines the pixel transform + sum into the fold lambda and
        // the pushed-down null filters, re-evaluating the whole
        // quadratic expression on BOTH join sides (measured 60 s at
        // sf0.1 vs 2 s with the boundary)
        val codes = phashCodes(spark, sfDir).mat
        val bands = phashBandRows(codes)
        bands.as("a")
          .join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
              col("a.asset_id") < col("b.asset_id"))
          .select(
            col("a.asset_id").as("asset_a"),
            col("b.asset_id").as("asset_b"),
            bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).cast("int").as("hamming"))
          .distinct()
          .filter(col("hamming") <= PhashRadius)
          .localCheckpoint(eager = true)
      })

  private val phashPairsMemo =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Test seam: drop the materialized phash pair graphs. */
  private[pipeline] def resetPhashMemo(): Unit = phashPairsMemo.clear()

  val phashPairsSql: String =
    s"""
    WITH px AS (
      SELECT doc_id AS asset_id,
             [unicode(substr(text, 1 + ((j * (length(text) - 1)) // 32), 1))
              for j in generate_series(0, 31)] AS pix
      FROM documents WHERE length(text) > 0
    ),
    code AS (
      SELECT asset_id,
             CAST(list_sum([CASE WHEN pix[j + 1] * 32 > list_sum(pix) THEN 1::BIGINT << j ELSE 0 END
                            for j in generate_series(0, 31)]) AS BIGINT) AS phash
      FROM px
    )
    SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM code a JOIN code b ON a.asset_id < b.asset_id
    WHERE bit_count(xor(a.phash, b.phash)) <= $PhashRadius"""

  // ---- q_phash_clusters ------------------------------------------------

  /** q_phash_clusters: near-duplicate IMAGE clusters — connected
    * components over the [[phashPairs]] Hamming-radius graph, labeling
    * each asset with its canonical keeper (smallest asset_id in the
    * component) and the cluster size. The same completion step the
    * text side runs after pair generation (`q_dedup_components`),
    * reusing [[graft.pipeline.Dedup.componentsOfPairs]] verbatim: the
    * resolver is modality-agnostic — any bounded pair relation
    * (shingle Jaccard, MinHash bands, SimHash, perceptual hashes)
    * clusters with the identical min-label propagation, so a pipeline
    * dedups text and images with ONE resolver implementation.
    *
    * Scale: the pair source is the banded (pigeonhole) join — bounded
    * candidates, never all-pairs — and the propagation is the capped
    * one-join-one-agg-per-round loop with per-round checkpoints.
    */
  def phashClusters(spark: SparkSession, sfDir: String): DataFrame =
    graft.pipeline.Dedup.componentsOfPairs(
      phashPairs(spark, sfDir)
        .select(col("asset_a").as("doc_a"), col("asset_b").as("doc_b")))
      .select(col("doc_id").as("asset_id"), col("cluster_root"), col("cluster_size"))

  val phashClustersSql: String =
    s"""
    WITH RECURSIVE pp AS (SELECT asset_a, asset_b FROM ($phashPairsSql)),
    edges AS (
      SELECT asset_a AS a, asset_b AS b FROM pp
      UNION SELECT asset_b, asset_a FROM pp
    ),
    reach(node, lab) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node AS asset_id, min(lab) AS cluster_root FROM reach GROUP BY 1)
    SELECT c.asset_id, c.cluster_root, s.cluster_size
    FROM comp c JOIN (
      SELECT cluster_root, count(*) AS cluster_size FROM comp GROUP BY 1
    ) s ON c.cluster_root = s.cluster_root"""

  /** DuckDB mirror: same rolling checksum over the UTF-8 bytes via a
    * left fold (documents are ASCII so code units == bytes).
    */
  val multimodalFeaturesSql: String =
    """
    WITH t AS (
      SELECT doc_id AS asset_id,
             ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
             text, n_chars,
             [unicode(substr(text, i, 1)) for i in generate_series(1, length(text))] AS chars
      FROM documents
    ),
    f AS (
      SELECT asset_id, media_type,
             CAST(length(text) AS BIGINT) AS n_bytes,
             CAST(list_reduce(list_prepend(0::BIGINT, [CAST(c AS BIGINT) for c in chars]),
                  (acc, x) -> (acc * 131 + x) % 1000000007) AS BIGINT) AS checksum,
             CASE WHEN length(text) > 0 THEN unicode(substr(text, 1, 1)) ELSE -1 END AS head_byte,
             CASE WHEN asset_id % 3 = 2 THEN greatest(1, CAST((n_chars * 25) // 40 AS INT)) ELSE 1 END AS frame_count,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(list_sum([CAST(c AS BIGINT) for c in chars]) AS DOUBLE) / length(text)
             END AS mean_luma
      FROM t
    )
    SELECT asset_id, media_type, n_bytes, checksum, head_byte, frame_count,
           round(mean_luma, 6) AS mean_luma
    FROM f"""
}
