package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PqIndex

/** Behavioral gates for product quantization: losslessness when the
  * codebook covers the corpus (ADC == exact dot, bit-for-bit), trained-
  * codebook recall on clustered data, and encode determinism. The v12
  * oracle proves engine-equivalence of the sampled-codebook pipeline.
  */
class PqIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  // deterministic pseudo-random corpus: 3 well-separated cluster centers in
  // 16-dim, 32 points each with small perturbations
  private def clustered(): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(3, 16)(rnd.nextFloat() * 10f)
    (0 until 96).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + rnd.nextFloat() * 0.1f))
    }
  }

  test("ADC equals exact dot when the codebook covers every subvector") {
    val vecs = clustered().take(4)
    val df = vecs.toDF("id", "v")
    // k = corpus size: every subvector IS a centroid -> encode is lossless
    val model = PqIndex.sampledModel(df, "v", "id", m = 4, k = 4)
    val q = vecs.head._2
    val scored = PqIndex.encode(df, "v", model)
      .withColumn("adc", PqIndex.adcScore(col("pq_code"), model.lut(q), model.k))
      .select("id", "adc").as[(Long, Double)].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(scored(id) == dot(q, v), s"id $id: ADC must be exactly the dot")
    }
  }

  test("trained codebook two-phase (ADC candidates + exact rerank) is exact") {
    // PQ collapses WITHIN-cluster detail (all members share codes — ADC
    // ties), so raw ADC top-10 is not the gate; the production shape is
    // phase-1 ADC candidates + phase-2 exact rerank, which must reproduce
    // exact top-k once the oversample covers the quantization ties.
    val df = clustered().toDF("id", "v")
    val model = PqIndex.trainedModel(df, "v", m = 4, k = 8, seed = 7L)
    val q = clustered().head._2
    val candidates = PqIndex.topN(PqIndex.encode(df, "v", model), model, "id", q, n = 40)
      .select("id").as[Long].collect().toSet
    val byId = clustered().toMap
    val reranked = candidates.toSeq.map(id => (id, dot(q, byId(id))))
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    val exactTop = clustered().map { case (id, v) => (id, dot(q, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    assert(reranked == exactTop)
  }

  test("residual encoding beats plain encoding at the same codebook budget") {
    // The reason v17 exists: after the coarse quantizer removes the
    // between-cluster structure, residual subvectors have less variance,
    // so the SAME m·k budget quantizes them with less error. Deterministic
    // (seeded corpus, seeded Lloyd) — measured, not assumed.
    import graft.operators.IvfIndex
    val data = clustered()
    val df = data.toDF("id", "embedding")
    val (indexed, ivf) = IvfIndex.build(df, "embedding", lists = 3, seed = 7L)
    val centLit = typedLit(ivf.centroids.map(_.toSeq).toSeq)
    val resid = indexed.withColumn("r",
      zip_with(col("embedding"), element_at(centLit, col("cluster_id") + 1),
        (a, b) => a - b))
    def sqErr(frame: org.apache.spark.sql.DataFrame, vecCol: String): Double = {
      val model = PqIndex.trainedModel(frame, vecCol, m = 4, k = 4, seed = 7L)
      val dsub = model.dsub
      PqIndex.encode(frame, vecCol, model)
        .select(col(vecCol), col("pq_code"))
        .as[(Array[Float], Array[Int])].collect().map { case (v, code) =>
          (0 until model.m).map { i =>
            val cent = model.codebooks(i)(code(i))
            (0 until dsub).map { j =>
              val dlt = v(i * dsub + j).toDouble - cent(j).toDouble
              dlt * dlt
            }.sum
          }.sum
        }.sum
    }
    val plain = sqErr(df, "embedding")
    val residual = sqErr(resid, "r")
    assert(residual < plain,
      f"residual error $residual%.4f should beat plain $plain%.4f")
  }

  test("encode is deterministic and emits m codes in [0, k)") {
    val df = clustered().toDF("id", "v")
    val model = PqIndex.trainedModel(df, "v", m = 4, k = 8, seed = 7L)
    def run() = PqIndex.encode(df, "v", model)
      .select(col("id"), array_join(col("pq_code"), ",").as("c"))
      .as[(Long, String)].collect().toMap
    val a = run()
    assert(a == run())
    assert(a.values.forall { s =>
      val parts = s.split(",").map(_.toInt)
      parts.length == 4 && parts.forall(c => c >= 0 && c < 8)
    })
  }
}
