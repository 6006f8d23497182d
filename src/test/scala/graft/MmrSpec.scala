package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mmr

/** Behavioral properties of MMR diversification: the s4 oracle proves
  * engine-equivalence of every greedy step; this proves the operator
  * actually diversifies — a redundant twin is deferred below a less
  * relevant but novel candidate — and pins the edge rules. */
class MmrSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // id 1: aligned with the query; id 2: its exact twin (same direction);
  // id 3: near-orthogonal, lower relevance. Pure relevance ranks (1, 2, 3);
  // MMR must defer the twin: (1, 3, 2).
  private def planted = Seq(
    (1L, 0.99, Array(1f, 0f, 0f, 0.1f)),
    (2L, 0.98, Array(1f, 0f, 0f, 0.1f)),
    (3L, 0.60, Array(0f, 1f, 0f, 0f))
  ).toDF("id", "score", "v")

  test("the redundant twin is deferred below the novel candidate") {
    val out = Mmr.diversify(planted, "id", "v", "score", k = 3)
      .orderBy("mmr_rank").select("id").as[Long].collect().toSeq
    assert(out == Seq(1L, 3L, 2L))
  }

  test("first pick is the pure-relevance winner with zero penalty") {
    val out = Mmr.diversify(planted, "id", "v", "score", k = 1)
      .select("id", "mmr_score").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 0.5 * 0.99)))
  }

  test("k beyond the candidate count returns every candidate, ranks dense") {
    val out = Mmr.diversify(planted, "id", "v", "score", k = 10)
      .select("mmr_rank").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("an all-negative penalty stays negative (not clamped at zero)") {
    // two anti-parallel vectors: after picking id 1, id 2's max-cos penalty
    // is -1, so its mmr EXCEEDS the λ·rel cap — clamping at 0 would not
    val df = Seq(
      (1L, 0.9, Array(1f, 0f)),
      (2L, 0.5, Array(-1f, 0f))
    ).toDF("id", "score", "v")
    val out = Mmr.diversify(df, "id", "v", "score", k = 2)
      .orderBy("mmr_rank").select("id", "mmr_score")
      .as[(Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L))
    assert(out(1)._2 == 0.5 * 0.5 - 0.5 * -1.0, "penalty term kept its sign")
  }

  test("exact ties break toward the lower id at every step") {
    val v = Array(1f, 0f)
    val df = Seq((5L, 0.8, v), (3L, 0.8, v), (9L, 0.8, v)).toDF("id", "score", "v")
    val out = Mmr.diversify(df, "id", "v", "score", k = 3)
      .orderBy("mmr_rank").select("id").as[Long].collect().toSeq
    assert(out == Seq(3L, 5L, 9L))
  }

  test("incremental penalty cache is bit-identical to the full recompute") {
    // naive reference: recompute max cosine over the WHOLE selected set at
    // every step (the pre-optimization semantics)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb); if (d == 0.0) 0.0 else dot / d
    }
    def naive(cands: Seq[(Long, Double, Array[Float])], k: Int,
              lambda: Double): Seq[(Long, Double, Double, Long)] = {
      val pool = scala.collection.mutable.ArrayBuffer(cands.sortBy(t => (-t._2, t._1)): _*)
      val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Float], Double)]
      while (picked.size < math.min(k, cands.length)) {
        var best: (Long, Double, Array[Float], Double) = null
        pool.foreach { case (id, rel, v) =>
          val pen = if (picked.isEmpty) 0.0 else picked.iterator.map(s => cos(v, s._3)).max
          val m = lambda * rel - (1 - lambda) * pen
          if (best == null || m > best._4 || (m == best._4 && id < best._1)) best = (id, rel, v, m)
        }
        picked += best
        pool.remove(pool.indexWhere(_._1 == best._1))
      }
      picked.zipWithIndex.map { case ((id, rel, _, m), i) => (id, rel, m, (i + 1).toLong) }.toSeq
    }
    val rnd = new scala.util.Random(42)
    val cands = (0L until 40L).map(i =>
      (i, rnd.nextDouble(), Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
    assert(Mmr.select(cands, k = 15) == naive(cands, k = 15, lambda = 0.5),
      "same ids, same ranks, bit-identical mmr scores")
  }

  test("duplicate candidate ids are refused, not silently misordered") {
    val v = Array(1f, 0f)
    val e = intercept[IllegalArgumentException](
      Mmr.select(Seq((1L, 0.9, v), (1L, 0.8, v)), k = 2))
    assert(e.getMessage.contains("distinct"))
  }
}
