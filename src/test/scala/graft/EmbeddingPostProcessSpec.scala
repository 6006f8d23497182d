package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EmbeddingPostProcess

/** All-but-the-Top fit: the power iteration must find a planted dominant
  * direction, projections must order along it, and a common mean shift —
  * the artifact ABTT exists to remove — must not move the projections. */
class EmbeddingPostProcessSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("abtt-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  import spark.implicits._

  private val dim = 8
  private def mk(shift: Float) = (0L until 100L).map { i =>
    val v = Array.fill(dim)(0.0f)
    v(0) = (i % 11).toFloat + shift     // dominant spread 0..10
    v(1) = (i % 2).toFloat * 0.1f + shift // tiny orthogonal noise
    (2 until dim).foreach(j => v(j) = shift)
    (i, v)
  }.toDF("vec_id", "embedding")

  test("planted dominant direction is recovered; projections order along it") {
    val out = EmbeddingPostProcess.abtTopProjection(mk(0f), "vec_id",
        "embedding", dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per planted e0 value, mean projection must increase strictly
    val byA = (0L until 100L).groupBy(_ % 11).map { case (a, ids) =>
      a -> ids.map(out).sum.toDouble / ids.size
    }.toSeq.sortBy(_._1)
    byA.sliding(2).foreach { case Seq((a1, p1), (a2, p2)) =>
      assert(p1 < p2, s"projection not monotone along planted PC: $a1=$p1 $a2=$p2")
    }
    // the spread matches the planted scale: ~1 unit of e0 per step at
    // fixed-point 1e6 (u0 ≈ 1 after sign fix)
    val step = (byA.last._2 - byA.head._2) / 10.0
    assert(step > 0.9e6 && step < 1.1e6, s"step $step far from 1e6·u0")
  }

  test("a common mean shift barely moves the projections (the ABTT point)") {
    val base = EmbeddingPostProcess.abtTopProjection(mk(0f), "vec_id",
      "embedding", dim).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shifted = EmbeddingPostProcess.abtTopProjection(mk(5f), "vec_id",
      "embedding", dim).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 100L).foreach { i =>
      assert(math.abs(base(i) - shifted(i)) <= 2,
        s"mean shift moved vec $i: ${base(i)} vs ${shifted(i)}")
    }
  }
}
