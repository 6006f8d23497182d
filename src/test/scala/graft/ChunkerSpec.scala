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

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("textTileGaps: planted two-topic doc — the topic seam is the unique boundary") {
    import spark.implicits._
    // 16 tokens of topic A then 16 of topic B, w=8 -> 4 blocks, gaps 1..3.
    // gap 2 is the seam (left = A A, right = B B, zero overlap); gaps 1/3
    // straddle within-topic block pairs with 50% overlap.
    val a = (1 to 8).map(i => s"apple$i"); val b = (1 to 8).map(i => s"brick$i")
    val doc = ((a ++ a) ++ (b ++ b)).mkString(" ")
    val out = Chunker.textTileGaps(Seq((1L, doc)).toDF("id", "text"), "id", "text")
      .select("gap", "sim_ppm", "depth_ppm", "is_boundary")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // gap1: left = block1 (8 A-toks), right = blocks 2..3 (8 A + 8 B):
    // clipped overlap 8, Dice = 2*8/(8+16) = 2/3
    assert(out(0)._2 == 666666L)
    assert(out(1)._2 == 0L, "seam gap has zero lexical cohesion")
    assert(out(2)._2 == 666666L)
    // depth at seam = (666666-0)+(666666-0); neighbors see one-sided 666k
    assert(out(1)._3 == 1333332L)
    assert(out.filter(_._4).map(_._1).toSeq == Seq(2L),
      "exactly the topic seam crosses the threshold")
  }

  test("textTileGaps: short docs emit nothing; depth at profile edges uses one-sided peaks") {
    import spark.implicits._
    val out = Chunker.textTileGaps(
      Seq((1L, "only eight tokens here so no gap x")).toDF("id", "text"),
      "id", "text")
    assert(out.count() == 0, "8 tokens < w+1 carries no gap")
  }

  test("textTileChunks: chunks join back to the normalized token stream; seam respected") {
    import spark.implicits._
    val a = (1 to 8).map(i => s"apple$i"); val b = (1 to 8).map(i => s"brick$i")
    val doc = ((a ++ a) ++ (b ++ b)).mkString(" ")
    val out = Chunker.textTileChunks(
      Seq((1L, doc), (2L, "tiny doc")).toDF("id", "text"), "id", "text")
      .select("id", "chunk_number", "n_tokens", "chunk")
      .as[(Long, Long, Long, String)].collect()
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.length == 2, "one boundary -> two chunks")
    assert(d1(0)._3 == 16L && d1(1)._3 == 16L)
    assert(d1.map(_._4).mkString(" ") == doc, "chunks reconstruct the stream")
    assert(d1(0)._4 == (a ++ a).mkString(" "), "cut lands exactly on the seam")
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2(0)._4 == "tiny doc",
      "short doc passes through as one chunk")
  }
}
