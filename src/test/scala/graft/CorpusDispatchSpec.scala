package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

/** Pins [[Corpus.decontaminateAuto]]'s size-adaptive dispatch: which arm
  * runs on each side of the threshold (read off the physical plan — the
  * Bloom arm carries a might_contain prefilter, the exact arm must not),
  * that the boundary is inclusive (<= broadcasts), and that both arms
  * return identical rows — the property that makes the dispatch a pure
  * performance choice. */
class CorpusDispatchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // train doc 10 shares "a b c d"-grams with eval doc 0; train doc 11 is
  // clean; eval docs contribute a known distinct 2-gram volume
  private def train = Seq(
    (10L, "a b c d e"), (11L, "zz yy xx ww"), (12L, "c d e f")
  ).toDF("doc_id", "text")
  private def evalDf = Seq(
    (0L, "a b c d"), (1L, "c d e")
  ).toDF("doc_id", "text")
  // eval distinct 2-grams: "a b","b c","c d","d e" -> 4

  private def usesBloom(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.toLowerCase.contains("might_contain")

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select("id", "n_shared").as[(Long, Long)].collect().toSet

  test("at or under the threshold: exact broadcast arm, no bloom prefilter in the plan") {
    val out = Corpus.decontaminateAuto(train, evalDf, "doc_id", "text", n = 2,
      broadcastNgramThreshold = 4) // == measured count: boundary is inclusive
    assert(!usesBloom(out), "<= threshold must take the exact broadcast arm")
    assert(rows(out) == Set((10L, 4L), (12L, 2L)))
  }

  test("over the threshold: bloom arm, prefilter present, rows identical to exact") {
    val out = Corpus.decontaminateAuto(train, evalDf, "doc_id", "text", n = 2,
      broadcastNgramThreshold = 3) // just under the measured count of 4
    assert(usesBloom(out), "> threshold must take the bloom-sketch arm")
    assert(rows(out) == Set((10L, 4L), (12L, 2L)),
      "both arms must compute identical results")
  }

  test("the registered t19 bloom path really carries the prefilter (guard the guard)") {
    val out = Corpus.bloomDecontaminate(train, evalDf, "doc_id", "text", n = 2)
    assert(usesBloom(out))
  }
}
