package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Incoming-stream-vs-corpus dedup: the banded corpus index is static;
  * each micro-batch of arriving docs runs the batch [[Dedup.lshMatchAgainst]]
  * inside foreachBatch (design rule 8 — no cross-batch state needed, the
  * match is per-doc against the index). The t24 oracle gates the batch
  * semantics; this spec gates the streaming drive.
  */
class StreamingCorpusDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("micro-batches match against the static band index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq(
      (100L, base),
      (101L, "completely different content about spark physical plans here"),
      (102L, "yet another unrelated corpus document with its own words"))
      .toDF("doc_id", "text")
    val index = Dedup.bandIndex(corpus, "doc_id", "text").cache()
    index.count()

    val matches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        matches ++= Dedup.lshMatchAgainst(batch, index, "doc_id", "text")
          .select("id", "corpus_id").as[(Long, Long)].collect()
        ()
      }.start()
    try {
      // batch 1: one near-dup of corpus doc 100, one novel doc
      input.addData((1L, base + " extra"), (2L, "totally novel text nothing shared"))
      q.processAllAvailable()
      // batch 2: another near-dup arrives later — index still matches
      input.addData((3L, "xx " + base))
      q.processAllAvailable()
      assert(matches.map(_._1).toSet == Set(1L, 3L))
      assert(matches.forall(_._2 == 100L))
    } finally q.stop()
  }
}
