package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Winnow

/** Incoming-stream-vs-corpus passage matching over the winnow fingerprint
  * index: static index, per-micro-batch [[Winnow.matchAgainst]] inside
  * foreachBatch (design rule 8 — stream-static equi-join, no cross-batch
  * state). The t39/t40 oracles gate the batch semantics; this gates the
  * streaming drive AND batch-equivalence: matchAgainst == the
  * corpus×incoming slice of matchPairs over the union (cap slack so both
  * arms see the same fingerprints). */
class StreamingWinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val rnd = new scala.util.Random(29)
  private def rand(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
  private val passage = rand(100)
  private val corpus = Seq(
    (100L, rand(60) + passage + rand(60)),
    (101L, rand(200)),
    (102L, rand(200)))
  private val incoming = Seq(
    (1L, rand(40) + passage + rand(40)), // shares the passage with 100
    (2L, rand(200)))                     // novel

  test("matchAgainst equals the corpus×incoming slice of batch matchPairs") {
    val cdf = corpus.toDF("doc_id", "text")
    val idx = Winnow.fingerprintIndex(cdf, "doc_id", "text")
    val got = Winnow.matchAgainst(incoming.toDF("doc_id", "text"), idx,
      "doc_id", "text", minShared = 2, maxDocFreq = 1000)
      .as[(Long, Long, Long)].collect().toSet
    val union = (corpus ++ incoming.map { case (i, t) => (i + 1000L, t) })
      .toDF("doc_id", "text") // offset incoming ids above corpus ids
    val expected = Winnow.matchPairs(union, "doc_id", "text",
      minShared = 2, maxDocFreq = 1000)
      .as[(Long, Long, Long)].collect()
      .filter { case (a, b, _) => a < 1000L && b >= 1000L } // corpus × incoming
      .map { case (a, b, n) => (b - 1000L, a, n) }.toSet
    assert(got == expected)
    assert(got.map(t => (t._1, t._2)).contains((1L, 100L)))
  }

  test("micro-batches match against the static fingerprint index") {
    implicit val sqlCtx = spark.sqlContext
    val idx = Winnow.fingerprintIndex(corpus.toDF("doc_id", "text"),
      "doc_id", "text").cache()
    idx.count()
    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        hits ++= Winnow.matchAgainst(batch, idx, "doc_id", "text",
          minShared = 2, maxDocFreq = 1000)
          .select("id", "corpus_id").as[(Long, Long)].collect()
        ()
      }.start()
    try {
      input.addData(incoming.head)
      q.processAllAvailable()
      input.addData(incoming(1), (3L, rand(30) + passage + rand(30)))
      q.processAllAvailable()
      assert(hits.map(_._1).toSet == Set(1L, 3L))
      assert(hits.forall(_._2 == 100L))
    } finally q.stop()
  }
}
