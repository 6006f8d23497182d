package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
