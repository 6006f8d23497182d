package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Ordered-funnel and retention-cohort analysis over an event stream — the
  * two product-analytics aggregations (Amplitude/Mixpanel class) the
  * temporal family (as-of, intervals, sessionize, resample, OHLC) doesn't
  * cover: "of the users who did A, how many then did B, then C, within W?"
  * and "of the users who first appeared in period p, how many were active
  * k periods later?".
  *
  * All time arithmetic is integer µs (unix_micros — the engine-replayable
  * rule from [[AsOfJoin]]), every output an exact integer, so the DuckDB
  * oracles replay bit-for-bit.
  *
  * 100 TB shape — [[funnel]]: one map-side-combined min per step over the
  * step's OWN events (filter pushed to the scan), chained by equi-joins on
  * the user key — steps−1 bounded joins, each shuffling only users who
  * survived the previous step (monotonically shrinking), never a
  * sessionize-style full-stream sort. [[retention]]: one aggregation for
  * the per-user cohort anchor, one equi-join back to the stream, one
  * distinct + count — two user-keyed shuffles total. Driver state: none
  * (step list is configuration).
  */
object Funnel {

  private def idiv(a: Column, b: Column): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Strict-order first-touch funnel: per user, t1 = min ts of step 1;
    * t_k = min ts of step k with ts STRICTLY AFTER t_{k-1} and within
    * `windowSec` of t1 (the whole journey bounded, the common analytics
    * definition). Returns one row per step: `step_idx` (1-based), `step`,
    * `n_users` (users reaching the step), `avg_us_from_start` (mean µs
    * from t1 to t_k, exact integer div; 0 for step 1). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String], windowSec: Long): DataFrame = {
    require(steps.size >= 2, s"funnel needs >=2 steps (got ${steps.size})")
    require(windowSec >= 1, s"funnel needs windowSec>=1 (got $windowSec)")
    val winUs = windowSec * 1000000L
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      unix_micros(col(tsCol)).as("us"))
    // stage k frame: (u, t1, tk)
    var stage = ev.where(col("t") === steps.head)
      .groupBy("u").agg(min(col("us")).as("tk"))
      .withColumn("t1", col("tk"))
    val out = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    out += stage.agg(lit(1L).as("step_idx"), lit(steps.head).as("step"),
      count(lit(1)).as("n_users"), lit(0L).as("avg_us_from_start"))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val prev = stage.select(col("u"), col("t1"), col("tk").as("__tprev"))
      stage = ev.where(col("t") === s)
        .join(prev, Seq("u"))
        .where(col("us") > col("__tprev") && col("us") - col("t1") <= winUs)
        .groupBy(col("u"), col("t1")).agg(min(col("us")).as("tk"))
      out += stage.agg(lit(i + 1L).as("step_idx"), lit(s).as("step"),
        count(lit(1)).as("n_users"),
        coalesce(idiv(sum(col("tk") - col("t1")), count(lit(1))), lit(0L))
          .as("avg_us_from_start"))
    }
    out.reduce(_ unionAll _)
  }

  /** Retention cohorts: cohort = floor(first-event µs / period) per user;
    * a user is retained at offset k if active in cohort+k. One row per
    * (cohort, offset) observed: `cohort` (period index, integer),
    * `week_offset` ≥ 0, `n_users`. */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                periodSec: Long): DataFrame = {
    require(periodSec >= 1, s"retention needs periodSec>=1 (got $periodSec)")
    val pUs = periodSec * 1000000L
    val ev = events.select(col(userCol).as("u"),
      idiv(unix_micros(col(tsCol)), lit(pUs)).as("p"))
    val cohort = ev.groupBy("u").agg(min(col("p")).as("c"))
    ev.join(cohort, Seq("u"))
      .select(col("u"), col("c").as("cohort"), (col("p") - col("c")).as("week_offset"))
      .distinct()
      .groupBy("cohort", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
