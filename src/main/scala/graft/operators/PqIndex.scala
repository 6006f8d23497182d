package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory side of the standard ANN toolbox
  * ([[IvfIndex]] is the pruning side; IVF-PQ composes them): vectors are
  * split into `m` subspaces, each subvector replaced by the id of its
  * nearest codebook centroid, so a d-dim float vector compresses to `m`
  * small ints (64 dims → 8 bytes at m=8/k≤256, a 32× shrink). Queries score
  * candidates with ADC (asymmetric distance computation): one dot-product
  * table of `m·k` entries per query, then each candidate costs `m` table
  * lookups instead of `d` multiplies.
  *
  * Scale design: the encoded table is `m` ints per row (often cached fully
  * in memory where the float corpus never could be); the LUT is
  * query-sized and broadcast; scoring is a stateless map over candidates
  * (here via codegen'd collection expressions) and composes with IVF
  * pruning and the exact-rerank two-phase exactly like FDE (v9/v11).
  *
  * Two codebook modes:
  *  - [[trainedModel]]: per-subspace MLlib k-means (seeded) — the quality
  *    path, Lloyd-refined centroids (recall spec-gated, PqIndexSpec).
  *  - [[sampledModel]]: codebook = the subvectors of the first `k` corpus
  *    rows by id — k-means-without-iterations (sampling init only). Fully
  *    deterministic arithmetic, so a DuckDB oracle can replay encode + ADC
  *    bit-for-bit (v12) — the gate that proves the PIPELINE's math; Lloyd
  *    iterations only move the centroids, never the plan.
  */
object PqIndex {

  /** codebooks(i)(c) = centroid c of subspace i, each of length d/m. */
  case class Model(codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def dsub: Int = codebooks.head.head.length

    /** Flattened ADC lookup table for a query: entry i*k + c holds
      * dot(query_sub_i, codebooks(i)(c)), accumulated in double
      * left-to-right (the same op order the oracle's list_sum uses). */
    def lut(query: Array[Float]): Array[Double] = {
      val out = new Array[Double](m * k)
      var i = 0
      while (i < m) {
        var c = 0
        while (c < k) {
          var s = 0.0; var j = 0
          val cent = codebooks(i)(c)
          while (j < dsub) { s += query(i * dsub + j).toDouble * cent(j).toDouble; j += 1 }
          out(i * k + c) = s
          c += 1
        }
        i += 1
      }
      out
    }

    /** Nested double literal of the codebooks (array<array<array<double>>>)
      * for expression-side encode. */
    private[operators] def codebookLit: Column =
      typedLit(codebooks.map(_.map(_.map(_.toDouble).toSeq).toSeq).toSeq)
  }

  /** Codebook from the subvectors of the `k` corpus rows with the smallest
    * ids (deterministic sampling init; ids collected are request-sized). */
  def sampledModel(corpus: DataFrame, vecCol: String, idCol: String,
                   m: Int, k: Int): Model = {
    val rows = corpus.orderBy(col(idCol)).limit(k)
      .select(vecCol).collect()
      .map(_.getSeq[Float](0).toArray)
    require(rows.length == k, s"corpus has fewer than $k rows")
    val d = rows.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    Model(Array.tabulate(m, k)((i, c) => rows(c).slice(i * dsub, i * dsub + dsub)))
  }

  /** Per-subspace seeded k-means codebooks (the quality path). */
  def trainedModel(corpus: DataFrame, vecCol: String, m: Int, k: Int,
                   seed: Long = 42L, maxIter: Int = 10): Model = {
    val d = corpus.select(size(col(vecCol))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    val codebooks = (0 until m).map { i =>
      val sub = corpus.select(
        array_to_vector(slice(col(vecCol), i * dsub + 1, dsub)).as("__features"))
      val km = new KMeans().setK(k).setSeed(seed + i).setMaxIter(maxIter)
        .setFeaturesCol("__features").setPredictionCol("__c")
      km.fit(sub).clusterCenters.map(_.toArray.map(_.toFloat))
    }.toArray
    Model(codebooks)
  }

  /** Adds `pq_code` (array<int>, length m): per subspace, the index of the
    * L2-nearest centroid, first-index tiebreak, distances folded
    * left-to-right in double — engine-replayable (the oracle mirrors the
    * same arithmetic in SQL). Runs as the codegen'd
    * [[graft.functions.VectorExpressions.PqEncode]] kernel (r17
    * optimization round): the previous collection-expression formulation
    * was value-identical but interpreted, and the HOF interpreter
    * re-evaluated the sub-vector slice per centroid — m·k = 128 re-slices
    * of the row's vector where the kernel does one compiled scan. */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("pq_code",
      graft.functions.vec.pq_encode(col(vecCol),
        model.codebooks.map(_.map(_.map(_.toDouble)))))

  /** ADC score of a `pq_code` column against a query LUT: m lookups into
    * the table, summed left-to-right from 0.0. Codegen'd kernel
    * ([[graft.functions.VectorExpressions.PqAdcScore]]); the LUT ships as
    * a referenced object, not a plan literal. */
  def adcScore(codeCol: Column, lutFlat: Array[Double], k: Int): Column =
    graft.functions.vec.pq_adc_score(codeCol, lutFlat, k)

  /** Approximate top-n by ADC dot-product (ties → smaller id first). The
    * two-phase pattern reranks these candidates with exact scores. */
  def topN(encoded: DataFrame, model: Model, idCol: String,
           query: Array[Float], n: Int): DataFrame =
    encoded
      .withColumn("adc_score", adcScore(col("pq_code"), model.lut(query), model.k))
      .orderBy(col("adc_score").desc, col(idCol))
      .limit(n)
}
