package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** As-of join semantics (SURVEY Q13, `video.py:41-53` nearest-timestamp):
  * backward inclusive match, no-match null, and nearest with tolerance
  * window (binary-search `at_time` equivalent). */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // left: (key, ts); right: (key, ts, content)
  lazy val left = Seq(("a", 5.0), ("a", 0.5), ("a", 10.0), ("b", 3.0))
    .toDF("k", "ts")
  lazy val right = Seq(("a", 1.5, "f1"), ("a", 3.2, "f2"), ("a", 10.0, "f3"))
    .toDF("k", "ts", "content")

  test("backward: latest right at-or-before each left ts; inclusive; null when none") {
    val got = AsOfJoin.backward(left, right, "k", "ts", Seq("content"))
      .select("k", "ts", "asof_ts", "asof_content")
      .as[(String, Double, Option[Double], Option[String])].collect().toSet
    assert(got == Set(
      ("a", 5.0, Some(3.2), Some("f2")),
      ("a", 0.5, None, None),          // nothing before 0.5
      ("a", 10.0, Some(10.0), Some("f3")), // inclusive at equality
      ("b", 3.0, None, None)))         // no right rows for key b
  }

  test("nearest with tolerance: picks closest either side, ties to earlier") {
    // at_time(t, padding) semantics (`video.py:41-106`)
    val got = AsOfJoin.nearest(left, right, "k", "ts", Seq("content"), toleranceSec = 2.0)
      .select("k", "ts", "near_ts", "near_content")
      .as[(String, Double, Double, String)].collect().toSet
    assert(got == Set(
      ("a", 5.0, 3.2, "f2"),   // dist 1.8 back vs 5.0 fwd
      ("a", 0.5, 1.5, "f1"),   // only forward within 2.0
      ("a", 10.0, 10.0, "f3")))
    // b@3.0 has no right rows; a@0.5 backward none, forward 1.0 away -> kept
  }

  test("resampleLocf: hourly grid spans floor(min)..floor(max), fills forward, honest leading gap") {
    val h = 3600L
    val ev = Seq(("a", 10 * 60L, 1.0), ("a", 2 * h + 50 * 60L, 2.0), // 00:10, 02:50
      ("b", h, 7.0)) // exactly on a tick
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val got = AsOfJoin.resampleLocf(ev, "k", "ts", Seq("v"), stepSec = h)
      .select(col("k"), unix_micros(col("ts")) / 1000000L,
        col("asof_v"))
      .as[(String, Double, Option[Double])].collect().toSet
    assert(got == Set(
      ("a", 0.0, None),             // tick 00:00 precedes the first event
      ("a", h.toDouble, Some(1.0)), // 01:00 carries 00:10
      ("a", 2.0 * h, Some(1.0)),    // 02:00 still carries it (02:50 is later)
      ("b", h.toDouble, Some(7.0)))) // an event ON the tick is included
  }

  test("tickCoverage: full, gappy, and corrupted-span keys — no explode, no cap needed") {
    val h = 3600L
    val ev = Seq(("full", 600L), ("full", h + 1), ("full", 2 * h),
      ("gap", 0L), ("gap", 4 * h),
      ("bad", 0L), ("bad", 500L * h)) // the resamplers' maxTicks hazard — fine here
      .toDF("k", "sec")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"))
    val got = AsOfJoin.tickCoverage(ev, "k", "ts", stepSec = h)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("full", 3L, 3L, 10000L, 0L),
      ("gap", 5L, 2L, 4000L, 3L),
      ("bad", 501L, 2L, 39L, 499L)), s"got $got")
  }

  test("resampleInterp: exact hit takes its value, bracketed ticks take the line, edges stay null") {
    val h = 3600L
    // key a: events at 00:30 (v=10) and 03:30 (v=40) — ticks 01:00 and
    // 02:00 sit 1/6 and 3/6 of the way along the 3 h span
    val ev = Seq(("a", 30 * 60L, 10.0), ("a", 3 * h + 30 * 60L, 40.0),
      ("b", h, 7.0)) // exactly on a tick, no later event
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val got = AsOfJoin.resampleInterp(ev, "k", "ts", "v", stepSec = h)
      .select(col("k"), unix_micros(col("ts")) / 1000000L, col("v"))
      .as[(String, Double, Option[Double])].collect().toSet
    assert(got == Set(
      ("a", 0.0, None),                        // before the first event
      ("a", h.toDouble, Some(10.0 + 30.0 * (1800.0 / 10800.0))), // 15.0
      ("a", 2.0 * h, Some(10.0 + 30.0 * (5400.0 / 10800.0))),    // 25.0
      ("a", 3.0 * h, Some(10.0 + 30.0 * (9000.0 / 10800.0))),    // 35.0
      ("b", h.toDouble, Some(7.0))), // exact hit needs no next neighbor
      s"got $got")
  }

  test("resampleInterp: shares the maxTicks guard") {
    val ev = Seq(("bad", 0L, 2.0), ("bad", 500L * 3600L, 3.0))
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val e = intercept[Exception] {
      AsOfJoin.resampleInterp(ev, "k", "ts", "v", stepSec = 3600L,
        maxTicks = 100L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("maxTicks") && msg.contains("resampleInterp"))
  }

  test("resampleLocf: a key spanning more than maxTicks fails loudly, naming the key") {
    // the garbage-value hazard the cap exists for: one epoch-0 timestamp
    // on an otherwise-2026 key would explode a ~490k-row hourly grid
    val ev = Seq(("good", 3600L, 1.0), ("bad", 0L, 2.0), ("bad", 500L * 3600L, 3.0))
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val e = intercept[Exception] {
      AsOfJoin.resampleLocf(ev, "k", "ts", Seq("v"), stepSec = 3600L,
        maxTicks = 100L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("maxTicks") && msg.contains("bad"))
    // under the default cap the same frame resamples fine
    assert(AsOfJoin.resampleLocf(ev, "k", "ts", Seq("v"), stepSec = 3600L)
      .count() == 502L)
  }

  test("resampleLocf/ohlcBars: backtick-hostile column names resolve (Column-based tick)") {
    val ev = Seq(("a", 3600L, 1.0), ("a", 7200L, 2.0))
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("event ts"), col("v"))
    // a space in the ts column name broke the old expr(s"unix_micros($ts)...")
    assert(AsOfJoin.resampleLocf(ev, "k", "event ts", Seq("v"), stepSec = 3600L)
      .count() == 2L)
    val bars = AsOfJoin.ohlcBars(ev, "k", "event ts", "v", stepSec = 86400L)
      .select("open", "high", "low", "close", "n")
      .as[(Double, Double, Double, Double, Long)].collect().toSet
    assert(bars == Set((1.0, 2.0, 1.0, 2.0, 2L)))
  }
}
