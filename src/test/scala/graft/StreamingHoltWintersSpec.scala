package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingHoltWinters

/** Rebuild equivalence for the streaming Holt–Winters forecaster: the
  * rows emitted over any prefix of the daily stream must equal the batch
  * operator's rows over the same daily series — including the seed
  * season's honest NULLs and the recursion state carried across a
  * micro-batch seam mid-season (the model must not re-seed or mis-phase
  * the seasonal index when a stream resumes). The day-gap contract is
  * loud, not silent. */
class StreamingHoltWintersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private type Row7 = (String, Long, Long, Option[Long], Option[Long],
    Option[Long], Option[Long])

  // two keys, 9 consecutive days each, one event per day so the batch
  // dailyGrid's centi rollup is exactly floor(v*100); values chosen to
  // swing level, trend, and both seasonal phases (period 2)
  private val vals = Map(
    "a" -> Seq(0.10, 0.30, 0.20, 0.40, 0.10, 0.50, 0.25, 0.35, 0.15),
    "b" -> Seq(1.00, 0.20, 0.90, 0.30, 0.80, 0.40, 0.70, 0.50, 0.60))

  private def day(i: Int) = java.sql.Timestamp.valueOf(
    java.time.LocalDate.of(1970, 1, 1).plusDays(i).atStartOfDay())

  private def batchRows(nDays: Int): Set[Row7] = {
    val raw = vals.toSeq.flatMap { case (k, vs) =>
      vs.take(nDays).zipWithIndex.map { case (v, i) => (k, day(i), v) }
    }.toDF("k", "ts", "v")
    graft.operators.Features.holtWinters(raw, "k", "ts", "v", period = 2)
      .select(col("k"),
        datediff(col("day"), lit("1970-01-01")).cast("long").as("di"),
        col("x_centi"), col("fc_milli"), col("resid_milli"),
        col("level_milli"), col("trend_milli"))
      .as[Row7].collect().toSet
  }

  private def dailyRows(from: Int, until: Int): Seq[(String, Long, Long)] =
    vals.toSeq.flatMap { case (k, vs) =>
      (from until until).map(i => (k, i.toLong, math.floor(vs(i) * 100).toLong))
    }

  test("stream rows equal the batch operator's over every prefix; the " +
    "seam lands mid-season and the phase survives it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingHoltWinters.forecast(
        input.toDF().toDF("k", "di", "x"), "k", "di", "x", period = 2)
      .writeStream.outputMode("update").format("memory")
      .queryName("hw_out").start()
    def emitted(): Set[Row7] =
      spark.table("hw_out").as[Row7].collect().toSet
    try {
      // batch 1 ends at day 4 — inside the recursion, phase 0 just
      // updated; batch 2 must continue at phase 1 without re-seeding
      input.addData(dailyRows(0, 5): _*)
      q.processAllAvailable()
      assert(emitted() == batchRows(5), "prefix-5 rebuild equivalence")
      input.addData(dailyRows(5, 9): _*)
      q.processAllAvailable()
      val all = batchRows(9)
      assert(emitted() == all, "full-series rebuild equivalence")
      // fixture sanity: the model is genuinely past seeding and moving
      assert(all.count(_._4.nonEmpty) == 2 * 7, "7 forecast days per key")
      assert(all.exists(r => r._7.exists(_ != 0L)), "trend moved")
    } finally q.stop()
  }

  test("late-start key under the global-span contract: the upstream " +
    "rollup zero-fills the key back to the corpus-wide min day, and " +
    "rebuild equivalence holds for it exactly") {
    // key "a" spans days 0..8; key "late" has real events only from day
    // 4 — the batch dailyGrid zero-fills "late" on days 0..3, so the
    // compliant streaming rollup must emit those zeros too (the
    // scaladoc contract). Feeding them proves seed/phase alignment.
    val lateVals = Seq(0.60, 0.20, 0.50, 0.10, 0.40)
    val raw = (vals("a").zipWithIndex.map { case (v, i) => ("a", day(i), v) }
      ++ lateVals.zipWithIndex.map { case (v, i) => ("late", day(i + 4), v) })
      .toDF("k", "ts", "v")
    val batch = graft.operators.Features
      .holtWinters(raw, "k", "ts", "v", period = 2)
      .select(col("k"),
        datediff(col("day"), lit("1970-01-01")).cast("long").as("di"),
        col("x_centi"), col("fc_milli"), col("resid_milli"),
        col("level_milli"), col("trend_milli"))
      .as[Row7].collect().toSet
    val streamIn = (0 until 9).flatMap { i =>
      Seq(("a", i.toLong, math.floor(vals("a")(i) * 100).toLong),
        ("late", i.toLong,
          if (i < 4) 0L else math.floor(lateVals(i - 4) * 100).toLong))
    }
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingHoltWinters.forecast(
        input.toDF().toDF("k", "di", "x"), "k", "di", "x", period = 2)
      .writeStream.outputMode("update").format("memory")
      .queryName("hw_late").start()
    try {
      input.addData(streamIn: _*)
      q.processAllAvailable()
      val got = spark.table("hw_late").as[Row7].collect().toSet
      assert(got == batch, "global-span zero-filled late key matches batch")
      assert(batch.exists(r => r._1 == "late" && r._4.nonEmpty),
        "fixture sanity: the late key is past seeding")
    } finally q.stop()
  }

  test("a day gap raises loudly instead of mis-phasing the season") {
    val e = intercept[Exception] {
      StreamingHoltWinters.forecast(
        Seq(("k", 0L, 10L), ("k", 1L, 20L), ("k", 3L, 30L))
          .toDF("k", "di", "x"), "k", "di", "x", period = 2)
        .collect()
    }
    assert(e.getMessage.contains("day gap"))
  }

  test("fractional daily values are rejected at plan time") {
    val e = intercept[Exception] {
      StreamingHoltWinters.forecast(
        Seq(("k", 0L, 0.5)).toDF("k", "di", "x"), "k", "di", "x")
    }
    assert(e.getMessage.contains("integral"))
  }
}
