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

  /** Zero-Lloyd seeded coarse quantizer: the `lists` lowest-id vectors ARE
    * the centroids (the [[Clustering.fit]] seed / v12 sampled-codebook
    * convention). An IVF coarse quantizer needs only SOME deterministic
    * partition of the space (recall comes from nprobe; full probe is exact
    * regardless — the v8 bridge), and skipping Lloyd buys full
    * engine-agnostic replayability: seeds, the squared-L2 argmin
    * assignment (ties to the lower index — [[Clustering.assign]]'s
    * codegen'd broadcast-codebook kernel), and the probe choice are all
    * expressible in plain SQL, which is what gives the probe-pruned query
    * its oracle row (v7). The trained-KMeans build ([[build]]) remains the
    * quality path, gated by IvfIndexSpec + the v19 recall curve.
    * Driver state: `lists` × dim doubles (codebook-sized, rule 17). */
  def buildSeeded(corpus: DataFrame, vecCol: String, idCol: String,
                  lists: Int): (DataFrame, Clustering.Model) = {
    val seeds = corpus.orderBy(col(idCol)).limit(lists)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val model = Clustering.Model(seeds)
    (Clustering.assign(corpus, vecCol, model).drop("dist"), model)
  }

  /** The `nprobe` centroids nearest to `query` under the SAME metric and
    * fold order the assignment uses (squared L2, left-to-right double
    * accumulation, ties to the lower index) — bit-identical to the
    * oracle's `list_sum(list_transform(...))` over the codebook CTE. */
  def probeSeeded(model: Clustering.Model, query: Array[Float],
                  nprobe: Int): Seq[Long] =
    model.centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0; var j = 0
      val n = math.min(c.length, query.length)
      while (j < n) { val t = query(j).toDouble - c(j); d += t * t; j += 1 }
      (d, i)
    }.sortBy { case (d, i) => (d, i) }.take(nprobe).map(_._2.toLong).toSeq
}
