package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance diversification (Carbonell & Goldstein 1998):
  * re-rank a retrieved candidate slice so results trade pure relevance for
  * coverage — the standard answer to "the top-k is ten near-copies of the
  * same chunk", which is exactly what a corpus WITH near-duplicates (see
  * [[Dedup]], [[Clustering]]) serves back. Greedy selection: each step picks
  *   argmax over remaining of  λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s)
  * with ties to the lowest id; the first pick has no selected set, so its
  * penalty is 0 and it is the pure-relevance winner.
  *
  * Scale shape: the DISTRIBUTED work is the retrieval arm that produced the
  * candidates ([[KnnSearch.topK]] and friends — corpus-sized, pushed-down,
  * heap-limited). Diversification itself runs driver-side over the
  * pre-limited candidate slice: request-sized by construction (the same
  * budget class as [[PqIndex.Model.lut]] or [[IvfIndex.Model.nearestClusters]]),
  * O(k·|cand|·dim) with k and |cand| both user-request constants. A greedy
  * argmax with a data-dependent selected set is inherently sequential — k
  * dependent steps — so distributing it would buy k shuffle barriers over
  * ~20 rows; collecting the slice is the honest plan at any corpus size.
  *
  * Determinism contract (s4_mmr oracle, unrolled greedy replay like the
  * k1 Lloyd oracle): cosine accumulates dot/|a|²/|b|² left-to-right in
  * doubles (bit-identical to the explicit `list_sum(list_transform(...))`
  * folds and to [[graft.functions.VectorExpressions.CosineSimilarity]]),
  * the penalty `max` is order-independent, and λ=0.5 keeps both mmr terms
  * exactly representable scalings, so every comparison replays bit-for-bit
  * in any engine. */
object Mmr {

  /** The greedy core over an ALREADY-COLLECTED candidate slice:
    * (id, rel, vec) in, (id, rel, mmr_score, 1-based rank) out in selection
    * order. Callers that hold the collected rows (the serving arm) use this
    * directly so the retrieval plan executes exactly once. */
  def select(cands: Seq[(Long, Double, Array[Float])], k: Int,
             lambda: Double = 0.5): Seq[(Long, Double, Double, Long)] = {
    // deterministic pool order; also fixes scan order for exact-tie argmax
    val pool = scala.collection.mutable.ArrayBuffer(
      cands.sortBy(t => (-t._2, t._1)): _*)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Float], Double)]
    while (picked.size < math.min(k, cands.length)) {
      var best: (Long, Double, Array[Float], Double) = null
      pool.foreach { case (id, rel, v) =>
        // max cosine to the selected set; 0 for the first pick (no set) —
        // NOT clamped at 0 otherwise: an all-negative penalty must stay
        // negative, exactly as the oracle's max() computes it
        val pen =
          if (picked.isEmpty) 0.0
          else picked.iterator.map(s => cosine(v, s._3)).max
        val m = lambda * rel - (1 - lambda) * pen
        if (best == null || m > best._4 || (m == best._4 && id < best._1))
          best = (id, rel, v, m)
      }
      picked += best
      pool.remove(pool.indexWhere(_._1 == best._1))
    }
    picked.zipWithIndex.map { case ((id, rel, _, m), i) => (id, rel, m, (i + 1).toLong) }.toSeq
  }

  /** Greedy-diversify `candidates` (already scored + pre-limited) down to
    * `k` rows. Returns (idCol, scoreCol, mmr_score, mmr_rank), mmr_rank
    * 1-based in selection order. */
  def diversify(candidates: DataFrame, idCol: String, vecCol: String,
                scoreCol: String, k: Int, lambda: Double = 0.5): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val rows = candidates
      .select(col(idCol).cast("long"), col(scoreCol).cast("double"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Float](2).toArray))
    select(rows.toSeq, k, lambda).toDF(idCol, scoreCol, "mmr_score", "mmr_rank")
  }

  /** Driver-side cosine with the SAME accumulation shape as the
    * [[graft.functions.VectorExpressions.CosineSimilarity]] expression and
    * the oracle's explicit folds: three independent left-to-right double
    * accumulators, correctly-rounded sqrt/division. */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }
}
