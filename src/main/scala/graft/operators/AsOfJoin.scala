package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** As-of (nearest/backward temporal) join — the relational form of the
  * reference's time-series nearest-timestamp lookup
  * (`core/models/video.py:41-53` binary-search `at_time`; SURVEY Q13).
  *
  * Spark-first implementation: union the two sides, one window sort per key,
  * carry the last right-side row forward (`last(..., ignoreNulls)`). That is
  * a single shuffle on the join key + one sort — same cost envelope as a
  * sort-merge join, no range explosion, skew-safe under AQE. A
  * `mapPartitions` merge would be the (d)-tier fallback; this stays fully
  * declarative.
  */
object AsOfJoin {

  /** For every left row, attach the latest right row with
    * `right.ts <= left.ts` (backward as-of), matching on `key`.
    * Output: left columns + `asof_ts` + requested right value columns
    * (renamed `asof_<name>`). Rows with no prior right row keep nulls. */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame = {
    val leftTagged = left.withColumn("__side", lit(1))
    val rightTagged = right.select(
      (Seq(col(key), col(ts)) ++ valueCols.map(col)): _*)
      .withColumn("__side", lit(0))
    // Align schemas: left value-columns become null on right rows and vice
    // versa. unionByName with allowMissingColumns does exactly this.
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // Right rows sort before left rows at equal ts (side 0 < 1), so a left
    // row at ts == right ts DOES see that right row (<= semantics).
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withAsof = valueCols.foldLeft(
      unioned.withColumn("asof_ts",
        last(when(col("__side") === 0, col(ts)), ignoreNulls = true).over(w))) {
      case (df, c) => df.withColumn(s"asof_$c",
        last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    withAsof.filter(col("__side") === 1)
      .drop("__side").drop(valueCols: _*)
  }

  /** Nearest-timestamp lookup with optional window: |right.ts - left.ts| <=
    * tolerance, picking the closest (ties -> earlier right row). This is the
    * `at_time(t, padding)` form. Implemented as backward + forward pass. */
  def nearest(left: DataFrame, right: DataFrame, key: String, ts: String,
              valueCols: Seq[String], toleranceSec: Double): DataFrame = {
    val back = backward(left, right, key, ts, valueCols)
    // forward = backward on negated timestamps
    val negL = left.withColumn(ts, -col(ts))
    val negR = right.withColumn(ts, -col(ts))
    val fwdCols = valueCols.map(c => s"asof_$c")
    val fwd = backward(negL, negR, key, ts, valueCols)
      .withColumn(ts, -col(ts))
      .withColumn("asof_ts", -col("asof_ts"))
      .select((Seq(col(key), col(ts), col("asof_ts").as("fwd_ts")) ++
        fwdCols.map(c => col(c).as(s"fwd_${c.stripPrefix("asof_")}"))): _*)
    val joined = back.join(fwd, Seq(key, ts))
    val backDist = abs(col(ts) - col("asof_ts"))
    val fwdDist = abs(col("fwd_ts") - col(ts))
    val pickBack = col("asof_ts").isNotNull &&
      (col("fwd_ts").isNull || backDist <= fwdDist)
    val out = valueCols.foldLeft(
      joined.withColumn("near_ts",
        when(pickBack, col("asof_ts")).otherwise(col("fwd_ts")))) {
      case (df, c) => df.withColumn(s"near_$c",
        when(pickBack, col(s"asof_$c")).otherwise(col(s"fwd_$c")))
    }
    out
      .withColumn("near_dist", abs(col("near_ts") - col(ts)))
      .filter(col("near_ts").isNotNull && col("near_dist") <= toleranceSec)
      .drop((Seq("asof_ts", "fwd_ts") ++ valueCols.map(c => s"asof_$c") ++
        valueCols.map(c => s"fwd_$c")): _*)
  }

  /** Regular-grid resample with last-observation-carried-forward (the
    * pandas `resample().ffill()` / QuestDB `SAMPLE BY ... FILL(PREV)` shape
    * — what a feature/training pipeline runs to turn irregular event
    * streams into fixed-rate model inputs). Per key, a tick grid spans
    * floor(min ts / step) .. floor(max ts / step) (tick timestamps at
    * integer multiples of `stepSec`, all integer µs arithmetic — engine-
    * replayable), and each tick carries the latest event at-or-before it
    * ([[backward]]). Leading ticks before the first event keep null — an
    * honest gap, not a fabricated fill. `events` must be unique per (key,
    * ts) — pre-aggregate duplicates — or the carried row among equal
    * timestamps is nondeterministic (same contract the e1 registry query
    * satisfies with its max() pre-aggregation).
    *
    * 100 TB shape: bounds are one map-side-combined groupBy per key; the
    * grid explode is bounded by span/step per key (never a range join) AND
    * by `maxTicks` — one corrupted timestamp (an epoch-0 default on a 2026
    * stream spans ~1.8e9 one-second ticks) must fail loudly inside the
    * bounds row, not silently explode a partition-breaking grid (the same
    * garbage-value hazard class `videoFrameChunks` caps with `maxFrames`);
    * the fill is [[backward]]'s one shuffle + one window sort on the key.
    * Output: `key`, `ts` (grid tick), `asof_ts`, `asof_<value>`s. */
  def resampleLocf(events: DataFrame, key: String, ts: String,
                   valueCols: Seq[String], stepSec: Long,
                   maxTicks: Long = 10000000L): DataFrame =
    backward(tickGrid(events, key, ts, stepSec, maxTicks, "resampleLocf"),
      events, key, ts, valueCols)

  /** The shared bounded per-key tick grid ([[resampleLocf]] /
    * [[resampleInterp]]): one map-side-combined bounds pass, the maxTicks
    * guard, then the explode. */
  private def tickGrid(events: DataFrame, key: String, ts: String,
                       stepSec: Long, maxTicks: Long,
                       opName: String): DataFrame = {
    require(stepSec >= 1, s"$opName needs stepSec>=1 (got $stepSec)")
    require(maxTicks >= 1, s"$opName needs maxTicks>=1 (got $maxTicks)")
    val stepUs = stepSec * 1000000L
    val tick = tickOf(ts, stepUs)
    val bounds = events.groupBy(col(key))
      .agg(min(tick).as("__t0"), max(tick).as("__t1"))
    // assert_true inside a filter: evaluated distributed, per bounds row
    // (|keys| rows, not |events|), and un-prunable because it gates the
    // explode. A violating key names itself in the error instead of
    // emitting a ~span/step-row grid.
    bounds
      .where(assert_true(col("__t1") - col("__t0") < lit(maxTicks), concat(
        lit(s"$opName: key "), col(key).cast("string"),
        lit(" spans "), (col("__t1") - col("__t0") + 1).cast("string"),
        lit(s" ticks at stepSec=$stepSec > maxTicks=$maxTicks — corrupted " +
          "timestamp or too-fine step; pre-filter the key or raise maxTicks")))
        .isNull)
      .select(col(key), explode(sequence(col("__t0"), col("__t1"))).as("__tick"))
      .select(col(key), timestamp_micros(col("__tick") * stepUs).as(ts))
  }

  /** Tick-coverage report — the data-quality gate a feature pipeline runs
    * BEFORE trusting [[resampleLocf]]/[[resampleInterp]] output (a fill
    * over a 90%-missing stream is fabrication, not resampling): per key,
    * how many grid ticks exist in its span vs how many carry at least one
    * event, plus the longest gap in ticks — all exact integers. No grid
    * EXPLODE at all: expected ticks = t1 − t0 + 1 is arithmetic on the
    * bounds row, present ticks is one distinct-tick aggregation, and the
    * longest gap is a lag window over the (key, tick) stream — so unlike
    * the resamplers this report is safe to run on arbitrarily corrupted
    * spans (no maxTicks needed; a 490k-tick gap is one subtraction).
    * Output: `key`, `n_expected`, `n_present`, `coverage_bp` (integer
    * basis points), `max_gap` (ticks between consecutive present ticks,
    * minus 1; 0 when nothing is missing between events). */
  def tickCoverage(events: DataFrame, key: String, ts: String,
                   stepSec: Long): DataFrame = {
    require(stepSec >= 1, s"tickCoverage needs stepSec>=1 (got $stepSec)")
    val stepUs = stepSec * 1000000L
    val tick = tickOf(ts, stepUs)
    val ticks = events.select(col(key), tick.as("__tick")).distinct()
    val w = Window.partitionBy(col(key)).orderBy(col("__tick"))
    ticks
      .withColumn("__gap", col("__tick") - lag(col("__tick"), 1).over(w) - 1L)
      .groupBy(col(key))
      .agg(
        (max(col("__tick")) - min(col("__tick")) + 1L).as("n_expected"),
        count(lit(1)).as("n_present"),
        coalesce(max(col("__gap")), lit(0L)).as("max_gap"))
      .withColumn("coverage_bp",
        expr("(10000 * n_present) div n_expected"))
      .select(col(key), col("n_expected"), col("n_present"),
        col("coverage_bp"), col("max_gap"))
  }

  /** Regular-grid resample with LINEAR interpolation (pandas
    * `resample().interpolate('time')` / QuestDB `SAMPLE BY ... FILL(LINEAR)`
    * — the signal-reconstruction sibling of [[resampleLocf]]: LOCF carries
    * the last observation, this draws the line between the bracketing
    * observations). Per tick t with previous event (t₀,v₀) (at-or-before,
    * so an exact-hit tick takes its own event value) and next event
    * (t₁,v₁) strictly after: v₀ + (v₁−v₀)·((t−t₀)/(t₁−t₀)) in double
    * arithmetic whose op order the oracle replays bit-for-bit. Ticks
    * before the first or after the last event stay null — honest gaps,
    * never extrapolation. Same unique-per-(key,ts) contract and
    * `maxTicks` guard as LOCF.
    *
    * 100 TB shape: the bounded grid, then ONE key exchange serving all
    * four bracketing columns — prev via the ascending running `last(...)`
    * frame (the [[backward]] trick: events sort before ticks at equal ts,
    * giving ≤ semantics), next via the SAME running-frame shape over the
    * DESCENDING (ts, side) order (tick before its equal-ts event there,
    * so the running last-seen event is the nearest strictly-after one —
    * exactly the > the interpolation needs). Two ordered passes, one
    * exchange, no join — deliberately NOT a `first(...) over (0,
    * unboundedFollowing)` mirror: Spark's unbounded-FOLLOWING frame
    * recomputes its aggregate per row (O(n²) per partition — measured 6×
    * e7's wall time at sf0.1 before this form replaced it; the descending
    * running frame is O(n) like every other frame here). Output: `key`,
    * `ts`, `prev_ts`, `next_ts`, `<value>`. */
  def resampleInterp(events: DataFrame, key: String, ts: String,
                     valueCol: String, stepSec: Long,
                     maxTicks: Long = 10000000L): DataFrame = {
    val grid = tickGrid(events, key, ts, stepSec, maxTicks, "resampleInterp")
    val gridTagged = grid.withColumn("__side", lit(1))
    val evTagged = events.select(col(key), col(ts), col(valueCol))
      .withColumn("__side", lit(0))
    val unioned = gridTagged.unionByName(evTagged, allowMissingColumns = true)
    val wPrev = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(key)
      .orderBy(col(ts).desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val evTs = when(col("__side") === 0, col(ts))
    val evV = when(col("__side") === 0, col(valueCol))
    val bracketed = unioned
      .withColumn("prev_ts", last(evTs, ignoreNulls = true).over(wPrev))
      .withColumn("__pv", last(evV, ignoreNulls = true).over(wPrev))
      .withColumn("next_ts", last(evTs, ignoreNulls = true).over(wNext))
      .withColumn("__nv", last(evV, ignoreNulls = true).over(wNext))
    val t = unix_micros(col(ts)); val t0 = unix_micros(col("prev_ts"))
    val t1 = unix_micros(col("next_ts"))
    bracketed.filter(col("__side") === 1)
      .withColumn(valueCol,
        when(col("prev_ts") === col(ts), col("__pv"))
          .when(col("prev_ts").isNotNull && col("next_ts").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              ((t - t0).cast("double") / (t1 - t0).cast("double"))))
      .select(col(key), col(ts), col("prev_ts"), col("next_ts"), col(valueCol))
  }

  /** OHLC-bar downsampling (pandas `resample().ohlc()` / QuestDB
    * `SAMPLE BY` with first/max/min/last — the other half of the
    * [[resampleLocf]] feature-pipeline pair: LOCF carries state BETWEEN
    * buckets, OHLC summarizes WITHIN them). Same integer-µs tick grid:
    * each event lands in bucket floor(ts/step); per (key, bucket) emit
    * open (value at the earliest ts), high, low, close (latest ts), and
    * the event count. Same determinism contract as [[resampleLocf]]:
    * `events` unique per (key, ts) — pre-aggregate duplicates — or
    * open/close among equal timestamps are nondeterministic.
    *
    * 100 TB shape: ONE map-side-combined groupBy — min_by/max_by/min/max/
    * count all carry constant-size partial state, so a hot key's events
    * combine per-partition and the shuffle moves one row per (key, bucket,
    * partition). Empty buckets don't exist by construction (no grid
    * explode); pair with [[resampleLocf]] when a dense grid is needed. */
  def ohlcBars(events: DataFrame, key: String, ts: String, valueCol: String,
               stepSec: Long): DataFrame = {
    require(stepSec >= 1, s"ohlcBars needs stepSec>=1 (got $stepSec)")
    val stepUs = stepSec * 1000000L
    val tick = tickOf(ts, stepUs)
    events.groupBy(col(key), timestamp_micros(tick * stepUs).as("bar_ts"))
      .agg(min_by(col(valueCol), col(ts)).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), col(ts)).as("close"),
        count(lit(1)).as("n"))
  }

  /** floor(unix_micros(ts) / stepUs) as a Column — integer `div` semantics
    * (µs epochs exceed double's 53-bit mantissa headroom too easily for
    * float division) built on the Catalyst expression directly instead of a
    * string-interpolated `expr(...)`, so column names needing backtick
    * escaping resolve like every other Column-based operator here. */
  private def tickOf(ts: String, stepUs: Long): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(unix_micros(col(ts))),
      ColumnBridge.expression(lit(stepUs))))
}
