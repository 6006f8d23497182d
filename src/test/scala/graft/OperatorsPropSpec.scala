package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Derandomized property tests for the round-10 operators: each trial
  * draws a random instance from a FIXED seed (the DedupPropSpec harness —
  * reproducible, no flaky RNG) and checks the operator against a
  * brute-force reference on the driver. */
class OperatorsPropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val params = Gen.Parameters.default
  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(params, Seed(seed)).get

  test("intervalUnion == brute-force point-set union on random span sets") {
    val spanGen = for {
      s <- Gen.choose(0L, 60L); len <- Gen.choose(0L, 15L)
    } yield (s, s + len)
    (0 until 10).foreach { trial =>
      val n = 5 + sample(Gen.choose(0, 20), trial * 19L + 1)
      val spans = (0 until n).map(i =>
        sample(spanGen, trial * 1000L + i * 7L + 3))
      val keyed = spans.map { case (s, e) => (1L, s, e) }
      val out = graft.operators.Intervals
        .intervalUnion(keyed.toDF("k", "s", "e"), Seq("k"), "s", "e")
        .select("s", "e", "n_merged").as[(Long, Long, Long)]
        .collect().sortBy(_._1)
      // independent sequential sweep (the textbook single-threaded merge;
      // inclusive-end real-line semantics: [1,13] and [14,26] do NOT
      // merge — they are disjoint with the open gap (13,14))
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      spans.sorted.foreach { case (s, e) =>
        if (runs.nonEmpty && s <= runs.last._2)
          runs(runs.size - 1) = (runs.last._1, math.max(runs.last._2, e))
        else runs += ((s, e))
      }
      assert(out.map(r => (r._1, r._2)).toSeq == runs.toSeq,
        s"trial $trial: islands ${out.toSeq} vs sequential sweep $runs")
      assert(out.map(_._3).sum == n.toLong, "every span lands in exactly one island")
    }
  }

  test("targetEncode: fold-marginal identities hold on random label tables") {
    (0 until 6).foreach { trial =>
      val n = 30 + sample(Gen.choose(0, 60), trial * 11L + 5)
      val rows = (0 until n).map { i =>
        (sample(Gen.oneOf("a", "b", "c", "d"), trial * 500L + i * 3L + 1),
         sample(Gen.choose(0L, 2L), trial * 500L + i * 3L + 2),
         sample(Gen.choose(0, 1), trial * 500L + i * 3L + 3))
      }
      val df = rows.toDF("cat", "fold", "y")
      val out = graft.operators.Features.targetEncode(df, "cat", "y", "fold")
        .select("category", "fold", "n_out", "pos_out", "encoding")
        .as[(String, Long, Long, Long, Double)].collect()
      val byCat = rows.groupBy(_._1)
      out.groupBy(_._1).foreach { case (cat, folds) =>
        val catRows = byCat(cat)
        folds.foreach { case (_, fold, nOut, posOut, enc) =>
          val outRows = catRows.filterNot(_._2 == fold)
          assert(nOut == outRows.size.toLong, s"$cat/$fold n_out")
          assert(posOut == outRows.map(_._3).sum.toLong, s"$cat/$fold pos_out")
          // encoding bounded by [0, 1] and uses ONLY out-of-fold labels:
          // bounds are strict consequences of the smoothed-rate form
          assert(enc >= 0.0 && enc <= 1.0)
        }
      }
      // no-leak witness: recompute each encoding after flipping every
      // IN-fold label of one (cat, fold) cell - it must not move
      val (c0, f0) = (out.head._1, out.head._2)
      val flipped = rows.map { case r @ (c, f, y) =>
        if (c == c0 && f == f0) (c, f, 1 - y) else r }
      val enc2 = graft.operators.Features
        .targetEncode(flipped.toDF("cat", "fold", "y"), "cat", "y", "fold")
        .select("category", "fold", "encoding")
        .as[(String, Long, Double)].collect()
        .find(r => r._1 == c0 && r._2 == f0).get._3
      val prior1 = rows.map(_._3).sum.toDouble / n
      val prior2 = flipped.map(_._3).sum.toDouble / n
      val enc1 = out.find(r => r._1 == c0 && r._2 == f0).get._5
      // the only channel an in-fold flip has is the global prior term
      val expectedShift = 20.0 * (prior2 - prior1) /
        (out.find(r => r._1 == c0 && r._2 == f0).get._3 + 20.0)
      assert(math.abs((enc2 - enc1) - expectedShift) < 1e-12,
        s"in-fold labels must only reach their own encoding via the prior")
    }
  }
}
