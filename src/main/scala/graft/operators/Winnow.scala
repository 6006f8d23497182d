package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.WinnowExpressions
import graft.functions.text

/** Winnowing-fingerprint operators over a document corpus — the MOSS
  * local-fingerprint layer (Schleimer et al. 2003; see
  * [[graft.functions.WinnowExpressions]] for the algorithm and the
  * engine-replayability contract). Complements the dedup family: MinHash
  * (t4) answers "are these documents similar as SETS"; winnowing answers
  * "do these documents share a CONTIGUOUS passage of length ≥ w+k−1" with
  * position evidence — the plagiarism/citation-detection shape, and the
  * candidate generator for span-level dedup when the t26 positional-n-gram
  * pass is too fine-grained.
  *
  * 100 TB shape: fingerprinting is map-only (the O(n) kernel inside
  * whole-stage codegen); matching is the t26 discipline — equi-join on the
  * fingerprint key ONLY, with a document-frequency cap that drops
  * stop-fingerprints (a k-gram shared by half the corpus generates
  * O(corpus²) candidate pairs; capping doc-freq bounds join fanout to
  * cap² per fingerprint), then a map-side-combined pair count. Never an
  * all-pairs comparison.
  */
object Winnow {

  /** Per-document winnowing fingerprints over the NORMALIZED text (the
    * dedup family's canonical form): `idCol`, `pos` (0-based k-gram
    * position in the normalized text), `fp` (31-bit polynomial hash). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 16): DataFrame =
    graft.Tables.scaled(df.select(col(idCol), col(textCol).as("__t")))
      .select(col(idCol),
        explode(WinnowExpressions.winnowFingerprints(
          text.normalize(col("__t")), k, w)).as("__packed"))
      .select(col(idCol),
        // exact unpack: pos·2^31 + hash with hash < 2^31 ⇒ shift/mask
        shiftright(col("__packed"), 31).as("pos"),
        col("__packed").bitwiseAND(lit(WinnowExpressions.PosPack - 1L)).as("fp"))

  /** The per-doc distinct fingerprint set as a reusable INDEX table
    * (id, fp) — write it partitioned/bucketed by fp once, then match any
    * incoming batch against it with [[matchAgainst]] without
    * re-fingerprinting the corpus (the t24/m5 incremental-crawl shape). */
  def fingerprintIndex(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 5, w: Int = 16): DataFrame =
    fingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("fp")).distinct()

  /** Incoming-vs-corpus passage matching: incoming docs fingerprint with
    * the same parameters and equi-join the index on fp; the
    * stop-fingerprint cap is computed on the INDEX side (the corpus is
    * what makes a fingerprint viral; an incoming batch is
    * request-sized). Output: `id` (incoming), `corpus_id`, `n_shared` ≥
    * `minShared`. Streaming shape: a batch function applied per
    * micro-batch via foreachBatch — stream-static equi-join, no
    * cross-batch state (design rule 8); StreamingWinnowSpec drives it and
    * gates equivalence with the batch [[matchPairs]]. */
  def matchAgainst(incoming: DataFrame, index: DataFrame,
                   idCol: String, textCol: String,
                   k: Int = 5, w: Int = 16,
                   minShared: Int = 2, maxDocFreq: Int = 50): DataFrame = {
    require(minShared >= 1, s"matchAgainst needs minShared>=1 (got $minShared)")
    require(maxDocFreq >= 1, s"matchAgainst needs maxDocFreq>=1 (got $maxDocFreq)")
    val rare = index.groupBy("fp").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDocFreq).select("fp")
    val inc = fingerprintIndex(incoming, idCol, textCol, k, w)
      .select(col("id").as("__inc_id"), col("fp"))
    inc.join(index.join(rare, Seq("fp")), Seq("fp"))
      .groupBy(col("__inc_id").as("id"), col("id").as("corpus_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Candidate passage-sharing pairs: documents sharing ≥ `minShared`
    * distinct fingerprints, counting only fingerprints present in 2..
    * `maxDocFreq` documents (the stop-fingerprint cap — same role as
    * t26's span-frequency cap). Output: `doc_a` < `doc_b`, `n_shared`. */
  def matchPairs(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 5, w: Int = 16,
                 minShared: Int = 2, maxDocFreq: Int = 50): DataFrame = {
    require(minShared >= 1, s"matchPairs needs minShared>=1 (got $minShared)")
    require(maxDocFreq >= 2, s"matchPairs needs maxDocFreq>=2 (got $maxDocFreq)")
    // Stage cut (rule 14, r17 optimization round): the distinct fingerprint
    // set feeds the doc-frequency rollup AND both sides of the pair
    // self-join — three evaluations of the normalize + winnow scan without
    // it. This table IS [[fingerprintIndex]], the thing a scale run writes
    // to storage once; survivor-sized (≈ chars/w fingerprints per doc,
    // deduped).
    val fps = graft.StageCut(fingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("fp")).distinct(),
      "winnow.fps")
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
      .where(col("__df") >= 2 && col("__df") <= maxDocFreq)
      .select("fp")
    val pruned = fps.join(rare, Seq("fp"))
    pruned.as("a").join(pruned.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
