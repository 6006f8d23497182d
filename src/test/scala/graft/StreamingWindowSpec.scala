package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked tumbling-window aggregation over an event stream — the
  * Structured Streaming form of the batch e3 window agg: late events
  * inside the watermark still land in their window; in Append mode a
  * window only emits once the watermark passes its end. */
class StreamingWindowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Int): Timestamp = new Timestamp(sec * 1000L)

  test("tumbling window with watermark: in-watermark late data counts, closed windows emit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "key", "value")
      .withWatermark("ts", "30 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("key"))
      .agg(count(lit(1)).as("n"), sum("value").cast("double").as("total"))
      .select(col("window.start").cast("long").as("win_start"),
        col("key"), col("n"), col("total"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [0,60): three events, one of them arriving "late" but within
      // the watermark, plus an advancing event at t=120 that closes it
      input.addData((ts(5), "a", 1.0), (ts(20), "a", 2.0), (ts(40), "b", 5.0))
      q.processAllAvailable()
      input.addData((ts(10), "a", 4.0))      // late, still inside watermark
      q.processAllAvailable()
      input.addData((ts(120), "a", 9.0))     // watermark -> 90s, closes [0,60)
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .as[(Long, String, Long, Double)].collect().toSet
      // [0,60) emitted exactly once per key, with the late event included
      assert(rows == Set((0L, "a", 3L, 7.0), (0L, "b", 1L, 5.0)))
    } finally q.stop()
  }
}
