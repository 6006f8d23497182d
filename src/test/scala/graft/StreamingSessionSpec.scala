package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sessionize

/** Session windows under Structured Streaming — the same `session_window`
  * rollup the batch e6 query runs, with out-of-order-but-in-watermark events
  * MERGING sessions (the stateful part tumbling windows don't exercise), and
  * the batch [[Sessionize.assign]] ids agreeing with the native rollup.
  */
class StreamingSessionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Int): Timestamp = new Timestamp(sec * 1000L)

  test("streaming session_window merges in-watermark events and emits closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "key", "value")
      .withWatermark("ts", "60 seconds")
      .groupBy(session_window(col("ts"), "30 seconds").as("w"), col("key"))
      .agg(count(lit(1)).as("n"), sum("value").cast("double").as("total"))
      .select(col("w.start").cast("long").as("s_start"),
        col("w.end").cast("long").as("s_end"), col("key"), col("n"), col("total"))
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // two provisional sessions [0,35) and [50,80)...
      input.addData((ts(5), "a", 1.0), (ts(50), "a", 2.0))
      q.processAllAvailable()
      // ...MERGED by a late-but-in-watermark bridge event at t=30
      // (gap to 5 is 25 < 30, gap to 50 is 20 < 30 -> one session [5,80))
      input.addData((ts(30), "a", 4.0))
      q.processAllAvailable()
      // advance the watermark past 80 to close and emit the merged session
      input.addData((ts(200), "a", 9.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .as[(Long, Long, String, Long, Double)].collect().toSet
      assert(rows == Set((5L, 80L, "a", 3L, 7.0)))
    } finally q.stop()
  }

  test("assign ids agree with the native session_window rollup") {
    import spark.implicits._
    // key a: sessions {0,10,40}, {100}; key b: {5}; gap 30s. An event at
    // exactly prev+gap (t=40 for prev=10) still MERGES — session windows
    // touching at a boundary merge; only a strictly larger gap splits.
    val ev = Seq(
      ("a", ts(0)), ("a", ts(10)), ("a", ts(40)), ("a", ts(100)),
      ("b", ts(5))).toDF("user", "ts")
    val assigned = Sessionize.assign(ev, "user", "ts", gapMicros = 30000000L)
      .groupBy("user", "session_id")
      .agg(count(lit(1)).as("n"), unix_micros(min("ts")).as("start"))
      .as[(String, Long, Long, Long)].collect().toSet
    val native = Sessionize.rollup(ev, "user", "ts", "30 seconds",
      Seq("n" -> count(lit(1))))
      .select(col("user"), col("n"), unix_micros(col("session_start")).as("start"))
      .as[(String, Long, Long)].collect().toSet
    // same (user, start, n) triples; assign adds contiguous 1-based ids
    assert(assigned.map(r => (r._1, r._4, r._3)) == native.map(r => (r._1, r._3, r._2)))
    assert(assigned.filter(_._1 == "a").map(_._2) == Set(1L, 2L))
  }
}
