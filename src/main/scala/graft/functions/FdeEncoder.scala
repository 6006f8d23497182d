package graft.functions

import java.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed-Dimensional Encoding (MUVERA; SURVEY E7): collapses a multi-vector
  * set into ONE vector whose inner product approximates MaxSim/Chamfer
  * similarity, turning multivector search into plain ANN
  * (`fast_multivector_store.py:325-331,446-449,521`; reference config
  * dim=128, reps=20, simhash_projections=5, projection_dim=16).
  *
  * Per repetition r: seeded Gaussian hyperplanes partition space into
  * 2^ksim SimHash buckets; vectors landing in a bucket are SUMMED (query
  * side) or AVERAGED (doc side) after a seeded ±1 sketch projection to
  * projDim; the concatenated bucket blocks across reps form the encoding
  * (scaled by 1/sqrt(reps)). Fixed seeds make it deterministic across
  * executors — the whole encoder is a pure function suitable for
  * mapPartitions at index-build time.
  */
case class FdeEncoder(inputDim: Int, reps: Int = 20, ksim: Int = 5,
                      projDim: Int = 16, seed: Long = 42L) extends Serializable {

  val buckets: Int = 1 << ksim
  val outputDim: Int = reps * buckets * projDim

  // Seeded parameters, generated once per encoder instance (deterministic).
  private lazy val planes: Array[Array[Array[Float]]] = {   // [rep][ksim][dim]
    val rnd = new Random(seed)
    Array.fill(reps, ksim, inputDim)(rnd.nextGaussian().toFloat)
  }
  private lazy val sketch: Array[Array[Array[Float]]] = {   // [rep][projDim][dim]
    val rnd = new Random(seed + 1)
    // AMS-style ±1 sketch projection
    Array.fill(reps, projDim, inputDim)(if (rnd.nextBoolean()) 1f else -1f)
  }

  private def bucketOf(rep: Int, v: Array[Float]): Int = {
    var b = 0; var i = 0
    while (i < ksim) {
      var dot = 0.0; var j = 0
      val p = planes(rep)(i)
      while (j < v.length) { dot += p(j) * v(j); j += 1 }
      b = (b << 1) | (if (dot > 0) 1 else 0)
      i += 1
    }
    b
  }

  private def project(rep: Int, v: Array[Float]): Array[Float] = {
    val out = new Array[Float](projDim)
    var i = 0
    while (i < projDim) {
      var dot = 0.0; var j = 0
      val s = sketch(rep)(i)
      while (j < v.length) { dot += s(j) * v(j); j += 1 }
      out(i) = (dot / math.sqrt(projDim)).toFloat
      i += 1
    }
    out
  }

  /** Encode one multivector set. `isQuery=true` sums per bucket (queries
    * keep magnitude); doc side averages (centroid per bucket). Every vector
    * must be exactly `inputDim` long: a longer one would index past the
    * hyperplane rows mid-job, a shorter one would silently project against
    * a truncated hyperplane — both are data bugs to surface, not mask. */
  def encode(vectors: Seq[Array[Float]], isQuery: Boolean): Array[Float] = {
    vectors.foreach(v => require(v.length == inputDim,
      s"FdeEncoder(inputDim=$inputDim) got a ${v.length}-dim vector"))
    val out = new Array[Float](outputDim)
    val scale = (1.0 / math.sqrt(reps)).toFloat
    var r = 0
    while (r < reps) {
      val sums = Array.fill(buckets)(new Array[Float](projDim))
      val counts = new Array[Int](buckets)
      vectors.foreach { v =>
        val b = bucketOf(r, v)
        val p = project(r, v)
        var i = 0
        while (i < projDim) { sums(b)(i) += p(i); i += 1 }
        counts(b) += 1
      }
      var b = 0
      while (b < buckets) {
        val base = (r * buckets + b) * projDim
        val denom = if (isQuery || counts(b) == 0) 1f else counts(b).toFloat
        var i = 0
        while (i < projDim) { out(base + i) = sums(b)(i) / denom * scale; i += 1 }
        b += 1
      }
      r += 1
    }
    out
  }

  /** Adds `outCol: array<float>` (the FDE) computed from a
    * `array<array<float>>` multivector column. */
  def encodeColumn(df: DataFrame, mvCol: String, outCol: String,
                   isQuery: Boolean): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType), nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(mvCol)
    val self = this
    df.mapPartitions { rows =>
      rows.map { r =>
        // null multivector cell (e.g. a doc with no embeddings after a left
        // join) encodes as the empty set — an all-zero FDE — not an NPE
        val raw = r.getSeq[scala.collection.Seq[Float]](idx)
        val mv = if (raw == null) Seq.empty[Array[Float]]
          else raw.filter(_ != null).map(_.toArray).toSeq
        Row.fromSeq(r.toSeq :+ self.encode(mv, isQuery).toSeq)
      }
    }(enc)
  }
}
