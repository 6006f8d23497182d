package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup

/** Cross-micro-batch dedup state: a duplicate arriving BATCHES later still
  * maps to the canonical id that already shipped — the property the batch
  * operator can't give a continuous pipeline. */
class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("keepFirst remembers canonical ids across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.keepFirst(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two distinct docs + an in-batch duplicate of doc 1
      input.addData((1L, "same content"), (2L, "other content"), (3L, "same content"))
      q.processAllAvailable()
      // batch 2: late duplicate of doc 1's content + a fresh doc
      input.addData((4L, "same content"), (5L, "third content"))
      q.processAllAvailable()
      val keep = spark.table("dedup_out")
        .select("id", "keep_id").as[(Long, Long)].collect().toMap
      assert(keep == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 5L))
    } finally q.stop()
  }
}
