package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Features
import graft.streaming.StreamingCusum

/** Rebuild equivalence for the streaming CUSUM: after every micro-batch
  * the keyed state must equal the batch prefix-identity report over the
  * prefix delivered so far — including alarm counts and FIRST-alarm order
  * keys across a batch seam (the monitor must not re-alarm or lose the
  * change-point when a stream resumes mid-trajectory). */
class StreamingCusumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val U = 10L; private val L = 5L; private val H = 6L

  // key "up": drifts upward from the third reading (readings 20 ≫ U=10:
  // alarms start inside batch 1 and CONTINUE across the seam); key
  // "down": shifts low only in batch 2 (first_down is a batch-2 order
  // key); key "quiet": sits inside the [L, U] dead band throughout.
  private val batch1 = Seq(
    ("up", 1L, 9L), ("up", 2L, 20L), ("up", 3L, 20L),
    ("down", 1L, 8L), ("down", 2L, 7L),
    ("quiet", 1L, 7L), ("quiet", 2L, 8L))
  private val batch2 = Seq(
    ("up", 4L, 20L), ("up", 5L, 2L),
    ("down", 3L, 1L), ("down", 4L, 1L), ("down", 5L, 1L),
    ("quiet", 3L, 9L))

  private type Rep = (String, Long, Long, Long, Long, Long,
    Option[Long], Option[Long])

  private def batchReport(events: Seq[(String, Long, Long)]): Map[String, Rep] =
    Features.cusumReport(events.toDF("key", "event_id", "reading"),
        "key", "event_id", "reading", U, L, H)
      .as[Rep].collect().map(r => r._1 -> r).toMap

  test("stream state equals the batch prefix-identity report after every " +
    "micro-batch; first-alarm keys survive the batch seam") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingCusum.cusum(
        input.toDF().toDF("key", "event_id", "reading"),
        "key", "event_id", "reading", U, L, H)
      .writeStream.outputMode("update").format("memory")
      .queryName("cusum_out").start()
    def latest(): Map[String, Rep] =
      spark.table("cusum_out").as[Rep].collect()
        .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }.toMap
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      val b1 = batchReport(batch1)
      assert(latest() == b1)
      // fixture sanity: the upward monitor is ALREADY alarming in batch 1
      assert(b1("up")._5 > 0 && b1("up")._7.nonEmpty)
      assert(b1("down")._6 == 0L && b1("quiet")._5 == 0L)
      input.addData(batch2: _*)
      q.processAllAvailable()
      val all = batchReport(batch1 ++ batch2)
      assert(latest() == all)
      // the seam did not move the first upward alarm, and the downward
      // monitor found its change point at a batch-2 order key
      assert(all("up")._7 == b1("up")._7, "first_up must be stable")
      assert(all("down")._8.exists(_ >= 3L), "first_down lands in batch 2")
      assert(all("quiet")._5 == 0L && all("quiet")._6 == 0L)
    } finally q.stop()
  }
}
