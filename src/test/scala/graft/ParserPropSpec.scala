package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DocParser
import graft.sources.OfficeFixtures

/** Property tests for round-2 parsing/FTS surfaces:
  *  - xlsx and pdf container round trips under adversarial cell/line
  *    content (pipes, parens, backslashes, unicode, XML metachars),
  *  - the Column-expression stemmer and its driver-side mirror must agree
  *    on arbitrary tokens (n1's oracle silently breaks if they drift). */
class ParserPropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("a|b", "x\\|y", "<tag>", "a&b", "\"quoted\"", "späß", "日本語", ""),
    Gen.listOfN(3, Gen.oneOf("w", "|", "&", "<", ">")).map(_.mkString))

  test("xlsx round trip: parsed markdown equals the directly-computed emit") {
    samples(Gen.listOfN(3, Gen.listOfN(2, cellGen)), 40).foreach { rows0 =>
      // keep one non-empty cell per row (all-empty rows are skipped by
      // reference semantics, covered in DocParserSpec)
      val rows = rows0.map { r => if (r.forall(_.isEmpty)) List("x", r(1)) else r }
      val parsed = DocParser.parse("t.xlsx",
        OfficeFixtures.xlsx(Seq("S" -> rows.map(_.toSeq))))
      val expected = {
        val parts = Seq("## S\n") ++ rows.zipWithIndex.flatMap { case (r, i) =>
          val line = r.map(_.replace("|", "\\|")).mkString("| ", " | ", " |")
          if (i == 0) Seq(line, "| --- | --- |") else Seq(line)
        } ++ Seq("")
        parts.mkString("\n")
      }
      assert(parsed == expected, s"rows=$rows")
    }
  }

  private val pdfLineGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(30)),
    Gen.oneOf("(paren) text", "back\\slash", "a (b (c)) d", "mixed )( here"),
    Gen.listOfN(8, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('(', ')', '\\', ' ')))
      .map(_.mkString))

  test("pdf round trip: raw and Flate streams reproduce the exact lines") {
    samples(Gen.zip(Gen.listOfN(2, pdfLineGen), Gen.oneOf(true, false)), 40)
      .foreach { case (lines0, compress) =>
        val lines = lines0.map(l => if (l.isEmpty) "x" else l)
        val got = DocParser.parse("t.pdf", OfficeFixtures.pdf(lines, compress))
        assert(got == lines.mkString("\n"), s"lines=$lines compress=$compress")
      }
  }

  test("Column stemmer and driver-side mirror agree on arbitrary tokens") {
    import spark.implicits._
    val tokens = (samples(Gen.alphaLowerStr.map(_.take(10)), 150) ++ Seq(
      "sses", "classes", "ies", "studies", "ss", "as", "cats", "running",
      "ing", "wanted", "ed", "reports", "tables", "7", "a1s", "misses",
      "kisses", "dies", "ties", "boss", "s", "is")).filter(_.nonEmpty)
    val viaColumn = tokens.toDF("t")
      .withColumn("s", graft.functions.text.light_stem(col("t")))
      .collect().map(_.getString(1)).toSeq
    val viaDriver = tokens.map(graft.functions.text.lightStemString)
    assert(viaColumn == viaDriver)
  }
}
