package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User sessionization — the classic gap-based event grouping a training
  * pipeline runs over interaction logs (and the reference's telemetry would
  * run over request streams). Two forms:
  *
  *  - [[rollup]]: per-session aggregates via Spark's native `session_window`
  *    (a session spans events with < gap between neighbors; window end =
  *    last event + gap). The IDENTICAL call works under `readStream` with a
  *    watermark (merging session state is Structured Streaming's built-in) —
  *    see StreamingSessionSpec.
  *  - [[assign]]: per-EVENT session ids (gaps-and-islands: new-session flag
  *    per row, running sum per key) for when downstream needs every event
  *    tagged, not aggregated.
  *
  * Scale: both are one hash-shuffle by key; session construction is a
  * per-key ordered pass (window / session-state merge), so keys process in
  * parallel and nothing is ever quadratic. Long-running keys (a bot user
  * with millions of events) bound the per-reducer work — cap or hash-split
  * such keys upstream if they exist.
  */
object Sessionize {

  /** Per-session aggregates: groupBy(key, session_window(ts, gap)).
    * `gap` is a duration string like "30 minutes". */
  def rollup(events: DataFrame, keyCol: String, tsCol: String, gap: String,
             aggs: Seq[(String, Column)]): DataFrame = {
    val exprs = aggs.map { case (n, c) => c.as(n) }
    events.groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(exprs.head, exprs.tail: _*)
      .withColumn("session_start", col("w.start"))
      .withColumn("session_end", col("w.end"))
      .drop("w")
  }

  /** Per-event session ids: session_id is 1-based per key in time order.
    * `tieCols` break equal-timestamp ordering deterministically (ties can
    * never straddle a session boundary — their gap is 0 — so the grouping
    * itself is tie-order independent). New session when the gap to the
    * previous event is STRICTLY > gapMicros: `session_window` merges
    * windows that touch at a boundary, so an event at exactly last+gap
    * still joins the session (spec-verified against the native rollup). */
  def assign(events: DataFrame, keyCol: String, tsCol: String,
             gapMicros: Long, tieCols: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
    val tus = unix_micros(col(tsCol))
    events
      .withColumn("__new",
        when(lag(tus, 1).over(w).isNull ||
          tus - lag(tus, 1).over(w) > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id",
        sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }
}
