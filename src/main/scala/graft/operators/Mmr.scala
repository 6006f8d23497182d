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
    // the min-id tie-break and index-keyed removal both assume one row per
    // id; a duplicated id would silently misorder, so refuse it up front
    require(cands.iterator.map(_._1).toSet.size == cands.length,
      "Mmr.select needs distinct candidate ids - dedupe the candidate slice first")
    // deterministic pool order; also fixes scan order for exact-tie argmax
    val pool = scala.collection.mutable.ArrayBuffer(
      cands.sortBy(t => (-t._2, t._1)): _*)
    // Running per-row max-cosine-to-selected, folded in only against the
    // NEWEST pick each step: O(k·|cand|·dim) total vs O(k²·|cand|·dim) for
    // recomputing the full max. A running max of doubles IS the full max
    // (max is exact and order-independent), so selection — and the s4
    // oracle's unrolled replay — is unchanged bit-for-bit.
    // seeded at -inf, NOT 0: the running max must be the true max over the
    // selected set, and an all-negative penalty stays negative
    val pen = scala.collection.mutable.ArrayBuffer.fill(pool.length)(Double.NegativeInfinity)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    var lastVec: Array[Float] = null
    while (picked.size < math.min(k, cands.length)) {
      if (lastVec != null) {
        var j = 0
        while (j < pool.length) {
          pen(j) = math.max(pen(j), cosine(pool(j)._3, lastVec)); j += 1
        }
      }
      // penalty is 0 for the first pick (no selected set) — NOT clamped at
      // 0 otherwise: an all-negative penalty must stay negative, exactly as
      // the oracle's max() computes it (pen holds the true max by then)
      var bestIdx = -1; var bestM = 0.0
      var j = 0
      while (j < pool.length) {
        val (id, rel, _) = pool(j)
        val m = lambda * rel - (1 - lambda) * (if (picked.isEmpty) 0.0 else pen(j))
        if (bestIdx < 0 || m > bestM || (m == bestM && id < pool(bestIdx)._1)) {
          bestIdx = j; bestM = m
        }
        j += 1
      }
      val (id, rel, v) = pool(bestIdx)
      picked += ((id, rel, bestM))
      lastVec = v
      pool.remove(bestIdx); pen.remove(bestIdx)
    }
    picked.zipWithIndex.map { case ((id, rel, m), i) => (id, rel, m, (i + 1).toLong) }.toSeq
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
