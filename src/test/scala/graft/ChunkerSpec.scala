package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Chunker

/** Goldens for the recursive character splitter (mirrors the reference's
  * splitter contract: boundary-aware splits, greedy merge, prev-suffix
  * overlap — `morphik_parser.py:54-107`). */
class ChunkerSpec extends AnyFunSuite {

  test("short text is a single chunk") {
    assert(Chunker.splitText("hello world", 100, 10) == Seq("hello world"))
  }

  test("empty text yields no chunks") {
    assert(Chunker.splitText("", 100, 10).isEmpty)
  }

  test("paragraph boundary preferred over mid-text split") {
    val t = "aaaa aaaa\n\nbbbb bbbb\n\ncccc cccc"
    val chunks = Chunker.splitText(t, 12, 0)
    assert(chunks == Seq("aaaa aaaa\n\n", "bbbb bbbb\n\n", "cccc cccc"))
  }

  test("falls through separators: sentence then word") {
    val t = "one two three. four five six seven eight"
    val chunks = Chunker.splitText(t, 15, 0)
    // ". " keeps separator on the left piece; second part re-splits on words
    assert(chunks.head == "one two three. ")
    assert(chunks.forall(_.length <= 15))
    assert(chunks.mkString == t)
  }

  test("overlap prepends previous suffix") {
    val t = "aaaa aaaa\n\nbbbb bbbb"
    val chunks = Chunker.splitText(t, 12, 4)
    // last 4 chars of "aaaa aaaa\n\n" are "aa\n\n"
    assert(chunks == Seq("aaaa aaaa\n\n", "aa\n\nbbbb bbbb"))
  }

  test("hard split when no separator fits") {
    val t = "x" * 25
    assert(Chunker.splitText(t, 10, 0) == Seq("x" * 10, "x" * 10, "x" * 5))
  }

  test("reconstruction invariant without overlap") {
    val t = ("lorem ipsum dolor sit amet. " * 40) + "\n\n" + ("consectetur adipiscing elit " * 30)
    val chunks = Chunker.splitText(t, 100, 0)
    assert(chunks.mkString == t)
    assert(chunks.forall(_.length <= 100))
  }
}
