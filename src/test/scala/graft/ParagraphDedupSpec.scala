package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Semantics of the CCNet-style paragraph-level global dedup: first
  * occurrence by (doc id, position) owns a paragraph, every later
  * occurrence — cross-doc AND within-doc — is cut, docs rebuild from
  * survivors in order. The t33 oracle proves engine-equivalence on the
  * token-window splitter; this suite pins the newline-splitter semantics a
  * real deployment uses, and the edge cases (empty paragraphs, total loss). */
class ParagraphDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] =
    Dedup.paragraphDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
      c => split(c, "\n{2,}"), sep = "\n\n")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("first occurrence by (doc, position) wins; later cross-doc and within-doc copies are cut") {
    val out = run(Seq(
      1L -> "alpha beta\n\ncommon para\n\nalpha beta", // within-doc repeat of para 0
      2L -> "common para\n\nunique two",               // loses 'common para' to doc 1
      3L -> "alpha beta"))                             // loses everything
    assert(out(1L) === ((3L, 2L, "alpha beta\n\ncommon para")))
    assert(out(2L) === ((2L, 1L, "unique two")))
    assert(out(3L) === ((1L, 0L, "")))
  }

  test("ownership order is (id, idx) lexicographic — smaller doc id wins even at a later position") {
    val out = run(Seq(
      1L -> "first\n\nshared tail",   // shared tail at idx 1 of doc 1
      2L -> "shared tail\n\nsecond")) // idx 0 of doc 2 still loses (1 < 2)
    assert(out(1L)._3 === "first\n\nshared tail")
    assert(out(2L)._3 === "second")
  }

  test("empty paragraphs never claim ownership and don't count") {
    val out = run(Seq(
      1L -> "\n\n\n\n",          // only blank paragraphs -> nothing
      2L -> "real\n\n\n\nmore")) // blanks between real paragraphs are dropped
    assert(out(1L) === ((0L, 0L, "")))
    assert(out(2L) === ((2L, 2L, "real\n\nmore")))
  }

  test("tokenWindowParagraphs: ceil(n/w) windows, last one ragged; empty text -> empty array") {
    val df = Seq((1L, (1 to 35).map(i => s"w$i").mkString(" ")), (2L, ""))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      Dedup.tokenWindowParagraphs(col("text"), 16).as("ps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).length === 3)
    assert(out(1L)(0) === (1 to 16).map(i => s"w$i").mkString(" "))
    assert(out(1L)(2) === (33 to 35).map(i => s"w$i").mkString(" "))
    assert(out(2L).isEmpty)
  }
}
