package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

/** Gates for the distinct-cardinality profile twins (design rule 21): the
  * t45 oracle proves the exact arm's engine-equivalence; this pins the HLL
  * arm against the exact arm — small vocabularies must agree exactly
  * (HLL++ sparse mode is a plain hash set below ~rsd⁻² distinct values),
  * a dense-mode vocabulary must land within the sketch's stated bound —
  * plus the honest-zero contract for token-less strata. */
class CorpusProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs = Seq(
    ("en", "alpha beta alpha gamma"),
    ("en", "beta beta delta"),
    ("de", "eins zwei eins"),
    ("empty", " "),
    ("empty", "")
  ).toDF("lang", "text")

  test("exact arm: hand-counted vocab/volume; token-less stratum keeps zeros") {
    val out = Corpus.distinctProfile(docs, "lang", "text")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("en") == (("en", 2L, 4L, 7L)), "en: 2 docs, {alpha,beta,gamma,delta}, 7 tokens")
    assert(out("de") == (("de", 1L, 2L, 3L)), "de: {eins,zwei}, 3 tokens")
    assert(out("empty") == (("empty", 2L, 0L, 0L)),
      "token-less stratum is an honest zero row, not a dropped one")
  }

  test("HLL arm equals the exact arm on a sparse-mode vocabulary") {
    val exact = Corpus.distinctProfile(docs, "lang", "text")
      .as[(String, Long, Long, Long)].collect().toSet
    val approx = Corpus.distinctProfileApprox(docs, "lang", "text")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(approx == exact, "below ~rsd^-2 distinct values the sketch is exact")
  }

  test("HLL arm lands within the sketch bound on a dense-mode vocabulary") {
    val wide = (1 to 30000).map(i => ("en", s"tok$i tok$i dup${i % 7}"))
      .toDF("lang", "text")
    val exact = Corpus.distinctProfile(wide, "lang", "text")
      .as[(String, Long, Long, Long)].collect().head
    val approx = Corpus.distinctProfileApprox(wide, "lang", "text", rsd = 0.01)
      .as[(String, Long, Long, Long)].collect().head
    assert(exact._3 == 30007L, "30000 tok_i + 7 dup_j")
    // rsd is the sketch's standard deviation; 5 sigma is a generous
    // deterministic ceiling (the sketch is a pure function of the data)
    val err = math.abs(approx._3 - exact._3).toDouble / exact._3
    assert(err <= 0.05, s"relative error $err > 5*rsd")
    assert(approx._4 == exact._4 && approx._2 == exact._2,
      "token volume and doc counts are exact in both arms")
  }
}
