package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

/** t46 [[Corpus.contextWindows]]: GPT-style fixed-length block
  * construction — docs tokenized, EOS-terminated, concatenated per shard
  * in doc-id order, sliced into exact `blockTokens` blocks (docs split
  * across boundaries, unlike t15/t44's whole-doc packing). */
class ContextWindowsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def fixture = Seq(
    (0L, 0L, "a b c d e"),       // 5 tokens + eos = 6
    (1L, 0L, "f g h"),           // 3 + eos = 4
    (2L, 0L, "i j"),             // 2 + eos = 3  -> shard 0: 13 tokens
    (10L, 1L, "x y z")           // shard 1: 4 tokens
  ).toDF("doc_id", "shard", "text")

  test("blocks are exact-size except each shard's tail; streams split docs at boundaries") {
    val out = Corpus.contextWindows(fixture, "doc_id", "shard", "text",
        blockTokens = 4L)
      .orderBy("shard", "block_id")
      .as[(Long, Long, Long, Long, Long, String)].collect()
    // shard 0: 13 tokens -> blocks of 4,4,4,1; shard 1: 4 -> one block of 4
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((0L, 0L, 4L), (0L, 1L, 4L), (0L, 2L, 4L), (0L, 3L, 1L), (1L, 0L, 4L)))
    // block 1 of shard 0 crosses the doc 0 -> doc 1 boundary: "e </s> f g"
    val b1 = out(1)
    assert((b1._4, b1._5) == (0L, 1L), s"doc span wrong: $b1")
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5s(s: String) = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(b1._6 == md5s("e </s> f g"), "boundary block token stream")
    assert(out(3)._6 == md5s("</s>"), "tail block is doc 2's lone EOS")
  }

  test("every shard's block streams re-concatenate to its doc token streams") {
    val out = Corpus.contextWindows(fixture, "doc_id", "shard", "text",
      blockTokens = 5L)
    // token conservation: sum of block sizes == tokens + one EOS per doc
    val got = out.groupBy("shard").agg(sum("n_tokens").as("n")).orderBy("shard")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 13L), (1L, 4L)), s"token mass not conserved: $got")
  }

  test("deterministic under repartitioning") {
    val a = Corpus.contextWindows(fixture, "doc_id", "shard", "text", 4L)
      .orderBy("shard", "block_id").collect().toSeq
    val b = Corpus.contextWindows(fixture.repartition(7), "doc_id", "shard",
        "text", 4L)
      .orderBy("shard", "block_id").collect().toSeq
    assert(a == b)
  }
}
