package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Funnel
import graft.streaming.StreamingFunnel

/** Rebuild equivalence for the streaming funnel: per-step user counts and
  * time-to-step sums recomputed from the stream's attainment emissions must
  * equal the batch [[Funnel.funnel]] on the same (in-order) event stream —
  * including strict-after rejections, the journey window, and a
  * cross-micro-batch conversion. */
class StreamingFunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val steps = Seq("view", "click", "buy")

  // user 1 converts fully across TWO micro-batches; user 2's click is too
  // early (strict order); user 3's buy is outside the window; user 4 views
  // only
  private val batch1 = Seq(
    (1L, "view", ts(10)), (1L, "click", ts(20)),
    (2L, "click", ts(5)), (2L, "view", ts(8)),
    (3L, "view", ts(0)), (3L, "click", ts(30)))
  private val batch2 = Seq(
    (1L, "buy", ts(40)),
    (2L, "click", ts(12)), // now strictly after the view — attains step 2
    (3L, "buy", ts(5000)), // outside the 1000 s window
    (4L, "view", ts(100)))

  test("stream attainments rebuild the batch funnel exactly") {
    implicit val sqlCtx = spark.sqlContext
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingFunnel.attainments(
      input.toDF().toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", steps, windowSec = 1000)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      got ++= spark.table("funnel_out")
        .as[(Long, Int, Long, Long)].collect()
    } finally q.stop()

    // rebuild per-step aggregates from the emissions
    val streamAgg = got.groupBy(_._2).map { case (k, rows) =>
      k.toLong -> (rows.size.toLong,
        if (k == 1) 0L else rows.map(r => r._3 - r._4).sum / rows.size)
    }
    val batchAgg = Funnel.funnel(
      (batch1 ++ batch2).toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", steps, windowSec = 1000)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(streamAgg == batchAgg.filter(_._2._1 > 0),
      s"stream $streamAgg vs batch $batchAgg")
    // spot-check semantics: user 1 converted fully, across batches
    assert(got.count(_._1 == 1L) == 3)
    // user 2 attains click only via the LATER in-order event
    assert(got.filter(r => r._1 == 2L && r._2 == 2).map(_._3) == Seq(12000000L))
    // user 3 never buys (window); user 4 views only
    assert(!got.exists(r => r._1 == 3L && r._2 == 3))
    assert(got.filter(_._1 == 4L).map(_._2) == Seq(1))
  }
}
