package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.vec

/** IVF-style ANN (SURVEY §4 "ANN index"): the Spark-native answer to
  * pgvector's IVFFlat (`lists=100`, `probes=100`,
  * `pgvector_store.py:87-95,125,459-461`).
  *
  * Build: MLlib k-means (seeded) over the corpus -> `cluster_id` column.
  * At scale the indexed table is written partitioned/bucketed by
  * `cluster_id`, so a probe-pruned query scans only `nprobe/lists` of the
  * data — Catalyst partition pruning does the skipping; no custom physical
  * operator needed.
  *
  * Query: score the (tiny) centroid set driver-side, take the `nprobe`
  * nearest lists, then exact brute-force top-k inside
  * `cluster_id IN (probed)`. Exact search ([[KnnSearch.topK]]) remains the
  * oracle path; recall is tunable via nprobe exactly like IVFFlat.
  */
object IvfIndex {

  case class Model(centroids: Array[Array[Float]]) {
    def nearestClusters(query: Array[Float], nprobe: Int): Seq[Int] =
      centroids.zipWithIndex
        .map { case (c, i) => (cosine(c, query), i) }
        .sortBy { case (s, i) => (-s, i) }
        .take(nprobe).map(_._2).toSeq
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0) 0 else dot / d
  }

  /** Assign every row a cluster_id; returns (indexed corpus, model).
    * Deterministic: fixed seed, fixed maxIter. */
  def build(corpus: DataFrame, vecCol: String, lists: Int, seed: Long = 42L,
            maxIter: Int = 10): (DataFrame, Model) = {
    val featured = corpus.withColumn("__features", array_to_vector(col(vecCol)))
    // 10 Lloyd iterations: an IVF coarse quantizer only needs balanced-ish
    // lists, not converged centroids (recall comes from nprobe, and probing
    // all lists is exact regardless of clustering quality — v8's gate).
    val km = new KMeans()
      .setK(lists).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__features").setPredictionCol("cluster_id")
    val model = km.fit(featured)
    val indexed = model.transform(featured).drop("__features")
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    (indexed, Model(centroids))
  }

  /** Probe-pruned KNN: exact top-k within the nprobe nearest lists. */
  def query(indexed: DataFrame, model: Model, vecCol: String, idCol: String,
            queryVec: Array[Float], k: Int, nprobe: Int,
            where: Column = lit(true)): DataFrame = {
    val probed = model.nearestClusters(queryVec, nprobe)
    KnnSearch.topK(
      indexed.filter(col("cluster_id").isin(probed: _*)),
      vecCol, idCol, queryVec, k, where)
  }
}
