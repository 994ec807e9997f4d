package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** MLlib-based anomaly scoring: fit KMeans over the embeddings and
  * score each vector by its distance to the nearest centroid — points
  * far from every cluster are model-based anomalies (the
  * "Structured Streaming + MLlib anomaly detection" leg of the
  * BASELINE.json approach; complements the z-score statistical path).
  *
  * The iterative fit is not SQL-expressible, so this query is
  * registered WITHOUT an oracle (driver records the weaker rows-only
  * check). Seed fixed for determinism within an engine.
  *
  * Scale notes: KMeans fit is Spark-parallel (one pass per iteration,
  * tree-aggregated); scoring is a per-row map against broadcast
  * centroids. At 100 TB you fit on a sample and score the full stream —
  * the scoring stage here is exactly that shape.
  */
object MlAnomaly {

  /** (vec_id, cluster, round(dist, 3), label) with the top-N most
    * distant vectors flagged.
    */
  def kmeansAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans().setK(8).setSeed(42L).setMaxIter(20).setFeaturesCol("features")
      .fit(emb)
    val centers = model.clusterCenters
    val distUdf = udf { (v: Vector, cluster: Int) =>
      math.sqrt(centers(cluster).toArray.zip(v.toArray)
        .map { case (c, x) => (c - x) * (c - x) }.sum)
    }
    val scored = model.transform(emb)
      .withColumn("dist", distUdf(col("features"), col("prediction")))
    scored.select(
      col("vec_id"), col("label"),
      col("prediction").as("cluster"),
      round(col("dist"), 3).as("dist"),
    )
  }
}
