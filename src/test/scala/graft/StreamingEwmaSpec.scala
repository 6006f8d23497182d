package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Features
import graft.streaming.StreamingEwma

/** Rebuild equivalence for the streaming EWMA: after every micro-batch the
  * keyed state must equal the batch fixed-point fold over the prefix
  * delivered so far — the exact-integer property that makes the two arms
  * interchangeable. */
class StreamingEwmaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private val batch1 = Seq(
    (1L, 10L, ts(10), 8.0), (1L, 11L, ts(20), 16.0),
    (2L, 12L, ts(10), 3.5))
  private val batch2 = Seq(
    (1L, 13L, ts(30), 4.0),
    (3L, 14L, ts(5), 100.25))

  private def batchFold(events: Seq[(Long, Long, Timestamp, Double)]): Map[Long, (Long, Long)] =
    Features.ewmaFixedPoint(
      events.toDF("user_id", "event_id", "ts", "value"),
      "user_id", "ts", "event_id", "value")
      .select("user_id", "n", "ewma_fp").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("stream state equals the batch fold after every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = StreamingEwma.ewma(
      input.toDF().toDF("user_id", "event_id", "ts", "value"),
      "user_id", "ts", "event_id", "value")
      .writeStream.outputMode("update").format("memory")
      .queryName("ewma_out").start()
    def latest(): Map[Long, (Long, Long)] =
      spark.table("ewma_out").as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (k, rows) =>
          k -> rows.maxBy(_._2) }.map { case (k, r) => k -> (r._2, r._3) }
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      assert(latest() == batchFold(batch1))
      input.addData(batch2: _*)
      q.processAllAvailable()
      assert(latest() == batchFold(batch1 ++ batch2))
    } finally q.stop()
  }
}
