package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SqIndex

/** SQ8 scalar quantization: model bounds, the floor-clamp encode rule (edge
  * bins, degenerate dims, out-of-range clamping), and the ADC error
  * theorem — bin-center reconstruction is within step/2 per dim, so the ADC
  * dot product deviates from the exact one by at most Σ|q_j|·step_j/2. The
  * v14 oracle proves engine-equivalence; this proves the math. */
class SqIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def fixture = Seq(
    (0L, Seq(0f, 10f, 5f)),
    (1L, Seq(4f, 30f, 5f)),
    (2L, Seq(2f, 20f, 5f))).toDF("vec_id", "embedding")

  test("train: exact per-dimension min/max, order-independent") {
    val m = SqIndex.train(fixture, "embedding")
    assert(m.mins.toSeq === Seq(0.0, 10.0, 5.0))
    assert(m.maxs.toSeq === Seq(4.0, 30.0, 5.0))
    assert(m.steps.toSeq === Seq(4.0 / 256, 20.0 / 256, 0.0))
    val shuffled = SqIndex.train(fixture.orderBy(col("vec_id").desc), "embedding")
    assert(shuffled.mins.toSeq === m.mins.toSeq && shuffled.maxs.toSeq === m.maxs.toSeq)
  }

  test("encode: min -> 0, max clamps to 255, interior floors; degenerate dim codes 0") {
    val m = SqIndex.train(fixture, "embedding")
    val codes = SqIndex.encode(fixture, "embedding", m)
      .orderBy("vec_id").select("sq_code")
      .collect().map(_.getSeq[Int](0))
    assert(codes(0) === Seq(0, 0, 0))       // at the minimum of every dim
    assert(codes(1) === Seq(255, 255, 0))   // at the maximum: 256 clamps to 255
    assert(codes(2) === Seq(128, 128, 0))   // midpoint: floor(0.5 * 256)
  }

  test("encode clamps vectors outside the trained range instead of failing") {
    val m = SqIndex.train(fixture, "embedding")
    val out = SqIndex.encode(
      Seq((9L, Seq(-100f, 1000f, 5f))).toDF("vec_id", "embedding"),
      "embedding", m).select("sq_code").head().getSeq[Int](0)
    assert(out === Seq(0, 255, 0))
  }

  test("ADC error bound: |adc − exact dot| ≤ Σ|q_j|·step_j/2 on real embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m = SqIndex.train(e, "embedding")
    val q = graft.queries.VectorQueries.queryVec(spark, "/root/testdata/sf0.001")
    val bound = q.zip(m.steps).map { case (qj, st) => math.abs(qj) * st / 2 }.sum
    val exactDot = aggregate(
      zip_with(col("embedding"), typedLit(q.map(_.toDouble).toSeq),
        (x, qq) => x.cast("double") * qq),
      lit(0.0), (acc, x) => acc + x)
    val worst = SqIndex.encode(e, "embedding", m)
      .withColumn("adc", SqIndex.adcScore(col("sq_code"), m, q))
      .select(max(abs(col("adc") - exactDot))).head().getDouble(0)
    assert(worst <= bound + 1e-9,
      s"ADC deviated $worst > theoretical bound $bound")
  }

  test("topN: descending ADC score, id-ascending tiebreak") {
    val m = SqIndex.Model(Array(0.0), Array(256.0)) // step 1, recon = code + 0.5
    val df = Seq((3L, Seq(9f)), (1L, Seq(9f)), (2L, Seq(200f)))
      .toDF("vec_id", "embedding")
    val top = SqIndex.topN(SqIndex.encode(df, "embedding", m), m,
      "vec_id", Array(1f), 2).select("vec_id").collect().map(_.getLong(0))
    assert(top.toSeq === Seq(2L, 1L)) // 200 first; the 9s tie -> id 1 before 3
  }
}
