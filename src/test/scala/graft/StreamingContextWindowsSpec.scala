package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus
import graft.streaming.StreamingContextWindows

/** [[StreamingContextWindows]] rebuild equivalence: blocks emitted across
  * micro-batches must equal the batch
  * [[Corpus.contextWindows]]'s COMPLETED blocks over everything ingested
  * so far — including a batch seam in the middle of a block (the carried
  * partial-block state must splice the next batch's tokens onto the
  * pending tail) — while each shard's open tail lives in state, bounded
  * by blockTokens − 1 tokens. */
class StreamingContextWindowsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("streamed blocks equal the batch rerun's completed blocks, across mid-block seams") {
    implicit val sqlCtx = spark.sqlContext
    // shard 0: doc 0 has 5 tokens + eos = 6, doc 1 has 3 + eos = 4 —
    // with B = 4 the first block closes MID-doc-0 and the seam after
    // batch 1 leaves 2 pending tokens that doc 1 must extend
    val batch1 = Seq((0L, 0L, "a b c d e"))
    val batch2 = Seq((0L, 1L, "f g h"), (1L, 10L, "x y z w v"))
    val input = MemoryStream[(Long, Long, String)]
    val q = StreamingContextWindows.contextWindows(
        input.toDF().toDF("shard", "doc_id", "text"),
        "doc_id", "shard", "text", blockTokens = 4)
      .writeStream.format("memory").queryName("ctx_stream")
      .outputMode("append").start()
    val streamed = try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      spark.table("ctx_stream")
        .as[(Long, Long, Long, String)].collect().toSet
    } finally q.stop()

    val all = (batch1 ++ batch2).toDF("shard", "doc_id", "text")
    val rebuilt = Corpus.contextWindows(all, "doc_id", "shard", "text",
        blockTokens = 4L)
      .filter(col("n_tokens") === 4)  // completed blocks only
      .select("shard", "block_id", "n_tokens", "tok_md5")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed == rebuilt, s"stream $streamed\nvs batch $rebuilt")
    // the seam fact itself: shard 0's block 1 is "e </s> f g" — its first
    // two tokens arrived in batch 1, the rest in batch 2
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5s(s: String) = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(streamed.contains((0L, 1L, 4L, md5s("e </s> f g"))),
      s"mid-block seam spliced wrong: $streamed")
  }
}
