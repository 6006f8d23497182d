package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MarkdownTables

/** Hand-written GitHub-dialect fixtures for the markdown table extractor:
  * the p9 oracle proves extract(render(cells)) == cells on the planted
  * corpus; this pins the dialect corners on literal documents — separator
  * validation, the no-separator trap, escaped pipes, alignment colons,
  * and multiple tables per document. */
class MarkdownTablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def cells(md: String): Seq[(Long, Long, Long, String)] =
    MarkdownTables.extract(Seq((1L, md)).toDF("id", "md"), "id", "md")
      .select("tbl", "row_idx", "col_idx", "cell")
      .as[(Long, Long, Long, String)].collect().toSeq
      .sortBy(t => (t._1, t._2, t._3))

  test("two tables with prose between; header is row 0; separator skipped") {
    val md =
      """intro prose
        || name | qty |
        || --- | --- |
        || ape | 3 |
        || bee | 7 |
        |middle prose
        || x | y | z |
        || :--- | :---: | ---: |
        || 1 | 2 | 3 |
        |tail""".stripMargin
    val out = cells(md)
    assert(out.filter(_._1 == 1L) == Seq(
      (1L, 0L, 0L, "name"), (1L, 0L, 1L, "qty"),
      (1L, 1L, 0L, "ape"), (1L, 1L, 1L, "3"),
      (1L, 2L, 0L, "bee"), (1L, 2L, 1L, "7")))
    assert(out.filter(_._1 == 2L) == Seq(
      (2L, 0L, 0L, "x"), (2L, 0L, 1L, "y"), (2L, 0L, 2L, "z"),
      (2L, 1L, 0L, "1"), (2L, 1L, 1L, "2"), (2L, 1L, 2L, "3")),
      "alignment-colon separators validate")
  }

  test("pipe block without a separator second line is prose, not a table") {
    val md =
      """| looks | like |
        || a | table |
        |but no separator line anywhere""".stripMargin
    assert(cells(md).isEmpty)
    assert(cells("just prose\nno pipes at all").isEmpty)
  }

  test("escaped pipe round-trips to a literal pipe; table may start at line 1") {
    // built by concatenation: stripMargin would eat line 1's leading pipe.
    // A doc STARTING with its table also exercises the sequence(1,0)
    // descending-range trap in the in-run position scan.
    val md = "| a | b |\n| --- | --- |\n| x\\|y | z |"
    assert(cells(md) == Seq((1L, 0L, 0L, "a"), (1L, 0L, 1L, "b"),
      (1L, 1L, 0L, "x|y"), (1L, 1L, 1L, "z")))
  }

  test("extra dash row after the separator is data (GitHub renders it so)") {
    val md = "| h |\n| --- |\n| --- |\n| v |"
    assert(cells(md) == Seq((1L, 0L, 0L, "h"), (1L, 1L, 0L, "---"),
      (1L, 2L, 0L, "v")))
  }
}
