package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the near-duplicate pair graph.
  * PageRank on the dup graph is the template-hub detector: a
  * boilerplate page duplicated (with variations) across many documents
  * becomes a high-rank hub of the pair graph, which ranking by plain
  * degree misses when the copies also link each other.
  *
  * All arithmetic is INTEGER (rank carried in micro-units, floor
  * division): no floating point exists anywhere in the iteration, so
  * the result is bit-exact reproducible on any engine/partitioning —
  * the oracle unrolls the same five iterations in SQL.
  */
object GraphOps {

  /** Fixed iteration count (deterministic, no convergence test). */
  val PrIterations = 5

  /** One unit of rank in micro-units. */
  val PrUnit = 1000000L

  /** q_pagerank: five integer PageRank iterations (damping 0.85 as the
    * exact rational 850/1000) over the undirected near-dup graph from
    * the CAPPED pair join ([[Dedup.clusterPairs]] — the same
    * scale rationale as [[Dedup.components]]: one hot stop-shingle
    * makes the uncapped pair join quadratic before any rank is
    * computed, and boilerplate-only edges are exactly the hub edges
    * this detector should not be fed twice).
    *
    * Scale: per iteration — one equi join rank⋈edges on the node key,
    * one hash aggregation of 8-byte contributions; the edge relation
    * is persisted once and each round's rank relation is
    * localCheckpointed (same discipline as [[Dedup.components]]) so
    * the plan does not grow with iterations. Degrees and ranks are
    * narrow; nothing wide ever shuffles. A fixed iteration count keeps
    * wall-clock bounded and the result engine-exact.
    */
  def pagerank(spark: SparkSession, sfDir: String): DataFrame =
    pagerankOnPairs(
      Dedup.clusterPairs(spark, sfDir).select(col("doc_a"), col("doc_b")))

  /** The iteration core over an undirected pair relation (doc_a, doc_b)
    * — exposed so specs can feed hand-built graphs with hand-computed
    * expected micro-ranks.
    */
  def pagerankOnPairs(pairs: DataFrame): DataFrame = {
    val raw = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
    // every loop-invariant relation is built ONCE — but by EXCHANGE
    // REUSE, not by persist/checkpoint barriers (round-16 measurement:
    // the old persist + two eager checkpoints + unpersist cost 3 extra
    // job submissions and pinned 32-partition layouts that AQE could
    // not coalesce; 26 stages for a 5-iteration loop). The edges and
    // nodes subplans below are canonically identical in every
    // iteration, so physical planning dedups their shuffles
    // (ReusedExchange / AQE stage reuse): the edge relation is built
    // and shuffled exactly once per action, each iteration's rank join
    // shuffles only the narrow rank relation, and the whole loop is
    // ONE compiled plan — zero driver barriers, AQE free to right-size
    // every stage.
    val deg = raw.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edges = raw.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
    val nodes = edges.select(col("src").as("node")).distinct()
    var rank = nodes.withColumn("rank_micro", lit(PrUnit))
    for (i <- 1 to PrIterations) {
      val contrib = edges
        .join(rank, edges("src") === rank("node"))
        .select(col("dst"), expr("rank_micro div deg").as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      rank = nodes.join(sums, nodes("node") === sums("dst"), "left")
        .select(col("node"),
          expr("CAST(150000 + (850 * coalesce(s, CAST(0 AS BIGINT))) div 1000 AS BIGINT)")
            .as("rank_micro"))
      // plan-depth bound for LONG loops: at the fixed 5 iterations the
      // chain fits one compiled plan (15 reusable shuffles, constant
      // depth); past ~6 rounds an eager checkpoint resumes chunking so
      // planning time stays bounded (the scale requirement).
      if (i % 6 == 0) rank = rank.localCheckpoint(eager = true)
    }
    rank.select(
      col("node").as("doc_id"),
      col("rank_micro"),
      (col("rank_micro").cast("double") / lit(1000000.0)).as("rank"))
  }

  val pagerankSql: String = {
    def iter(i: Int): String =
      s"""r$i AS (
      SELECT n.node,
             CAST(150000 + (850 * COALESCE(s.s, 0)) // 1000 AS BIGINT) AS rank_micro
      FROM nodes n LEFT JOIN (
        SELECT e.dst, CAST(sum(r.rank_micro // d.deg) AS BIGINT) AS s
        FROM edges e JOIN deg d ON e.src = d.src JOIN r${i - 1} r ON e.src = r.node
        GROUP BY 1
      ) s ON n.node = s.dst
    )"""
    s"""
    WITH ${Dedup.shinglePairCtesSql(maxFreq = Some(Dedup.ClusterShingleFreqCap))},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    r0 AS (SELECT node, CAST(${PrUnit} AS BIGINT) AS rank_micro FROM nodes),
    ${(1 to PrIterations).map(iter).mkString(",\n    ")}
    SELECT node AS doc_id, rank_micro,
           CAST(rank_micro AS DOUBLE) / 1000000.0 AS rank
    FROM r$PrIterations"""
  }
}
