package graft.operators

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the third leg of the compression toolbox
  * next to binary quantization ([[graft.functions.VectorExpressions]], 32×,
  * Hamming-only) and product quantization ([[PqIndex]], codebook-trained):
  * each dimension is affinely mapped to an 8-bit code against per-dimension
  * corpus [min, max] bounds, a 4× shrink over float32 that keeps
  * per-dimension resolution (the FAISS `ScalarQuantizer` QT_8bit /
  * Milvus/Lucene int8 layout). No codebook training — the model is just
  * 2·d doubles — so SQ8 is the default compression tier when PQ's codebook
  * fit is not worth scheduling, and the quality ladder binary → SQ8 → PQ →
  * float is complete.
  *
  * Quantization rule (engine-replayable by construction):
  *   code[j] = clamp(floor((x[j] − min[j]) / step[j]), 0, 255),
  *   step[j] = (max[j] − min[j]) / 256;  degenerate dims (max == min) code
  * to 0. `floor` + clamp rather than `round` specifically because
  * round-half ties differ across engines while floor is exact in IEEE
  * double everywhere — the same determinism discipline as [[PqIndex]]'s
  * fixed fold order. Scoring is ADC (asymmetric distance): the float query
  * against bin-center reconstructions,
  *   score = Σ_j q[j] · (min[j] + (code[j] + 0.5) · step[j]),
  * accumulated in double j=0..d−1, so a DuckDB oracle reproduces scores
  * bit-for-bit (v14).
  *
  * Scale design: [[train]] is ONE streaming pass — MLlib `Summarizer`
  * min/max, a treeAggregate with no corpus shuffle and exact (order-free)
  * results; the model rides plans as two d-length literals (d≤4096 ⇒ a few
  * KB — O(1) in corpus size, the broadcast-codebook property k1 proved for
  * k-means). [[encode]] and [[adcScore]] are narrow maps in codegen'd
  * collection expressions; [[topN]] is TakeOrderedAndProject (per-partition
  * heads, never a global sort). Composes with [[IvfIndex]] pruning and the
  * exact-rerank two-phase exactly like PQ (v13's bridge pattern).
  */
object SqIndex {

  /** Per-dimension affine quantization bounds. */
  case class Model(mins: Array[Double], maxs: Array[Double]) {
    require(mins.length == maxs.length, "mins/maxs length mismatch")
    def d: Int = mins.length
    /** Bin width per dim; 0.0 for degenerate (constant) dims. */
    def steps: Array[Double] =
      Array.tabulate(d)(j => (maxs(j) - mins(j)) / 256.0)
    private[operators] def minsLit: Column = typedLit(mins.toSeq)
    private[operators] def stepsLit: Column = typedLit(steps.toSeq)
  }

  /** One-pass exact per-dimension [min, max] over the corpus (no shuffle;
    * Summarizer treeAggregate). min/max are order-independent, so the model
    * is deterministic regardless of partitioning. */
  def train(corpus: DataFrame, vecCol: String): Model = {
    val row = corpus
      .select(Summarizer.metrics("min", "max")
        .summary(array_to_vector(col(vecCol))).as("s"))
      .select("s.min", "s.max").head()
    Model(row.getAs[MlVector](0).toArray, row.getAs[MlVector](1).toArray)
  }

  /** Adds `sq_code` (array<int>, length d, values 0..255): the affine
    * floor-clamp rule above. Out-of-range inputs (vectors unseen at train
    * time) clamp to the edge bins — encode never fails. */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val shifted = zip_with(
      transform(col(vecCol), x => x.cast("double")), model.minsLit,
      (x, mn) => x - mn)
    val codes = zip_with(shifted, model.stepsLit, (y, st) =>
      when(st === 0.0, lit(0))
        .otherwise(least(lit(255.0), greatest(lit(0.0), floor(y / st)))
          .cast("int")))
    df.withColumn("sq_code", codes)
  }

  /** ADC dot-product of a code column against a float query: bin-center
    * reconstruction per dim, double accumulation left-to-right. The query
    * and model are plan literals (broadcast by construction). */
  def adcScore(codeCol: Column, model: Model, query: Array[Float]): Column = {
    require(query.length == model.d, s"query dim ${query.length} != model dim ${model.d}")
    val q = typedLit(query.map(_.toDouble).toSeq)
    aggregate(
      zip_with(codeCol, sequence(lit(0), lit(model.d - 1)), (c, j) =>
        element_at(q, j + 1) *
          (element_at(model.minsLit, j + 1) +
            (c.cast("double") + lit(0.5)) * element_at(model.stepsLit, j + 1))),
      lit(0.0), (acc, x) => acc + x)
  }

  /** Approximate top-n by ADC dot-product (ties → smaller id first); the
    * two-phase pattern reranks these candidates with exact scores. */
  def topN(encoded: DataFrame, model: Model, idCol: String,
           query: Array[Float], n: Int): DataFrame =
    encoded
      .withColumn("adc_score", adcScore(col("sq_code"), model, query))
      .orderBy(col("adc_score").desc, col(idCol))
      .limit(n)
}
