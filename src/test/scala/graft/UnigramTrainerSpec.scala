package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UnigramTrainer

/** Semantic properties of the unigram-LM trainer: the t62 oracle proves
  * engine-equivalence of every count/score/verdict on the real corpus;
  * this proves the trainer TRAINS — frequent whole words become pieces and
  * win their own Viterbi segmentation, coverage never breaks, and the
  * fixed-point design delivers partitioning-independent bits. */
class UnigramTrainerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def corpus(parts: Int = 4) = {
    val docs = Seq.fill(100)("spark") ++ Seq.fill(50)("park") ++ Seq("zq")
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(parts)
  }

  private def trained(parts: Int = 4): Map[String, (Long, Long, Long, Boolean)] =
    UnigramTrainer.train(corpus(parts), "doc_id", "text")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("frequent whole words become pieces and win their own segmentation") {
    val t = trained()
    // 'spark' seeds at its own frequency and Viterbi keeps it whole:
    // ln(100/T) beats any split's sum of two smaller logs
    assert(t.contains("spark") && t("spark")._1 == 100L)
    assert(t("spark")._3 == 100L, "every occurrence segments as one piece")
    assert(t("spark")._4, "a used piece this hot survives the prune")
    assert(t("park")._3 == 50L, "'park' is its own piece, not p+ark")
    // pieces that only ever lose the Viterbi race carry zero usage
    assert(t("spar")._3 == 0L)
  }

  test("single characters are always kept (coverage) and rare words stay segmentable") {
    val t = trained()
    for (c <- Seq("s", "p", "a", "r", "k", "z", "q")) {
      assert(t.contains(c) && t(c)._4, s"single char '$c' must be kept")
    }
    // 'zq' appears once; ln(1/T) as one piece still beats two ln(1/T) singles
    assert(t("zq")._3 == 1L)
  }

  test("log-prob model is the exact fixed-point of the seed ratios") {
    val t = trained()
    val total = t.values.map(_._1).sum
    for ((p, (seed, lnp, _, _)) <- t) {
      assert(lnp == math.floor(1e9 * math.log(seed.toDouble / total.toDouble)).toLong,
        s"piece '$p'")
    }
  }

  test("bit-identical inventory under different input partitionings") {
    assert(trained(parts = 1) == trained(parts = 7))
  }
}
