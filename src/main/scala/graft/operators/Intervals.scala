package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) joins at scale: points matched to [start, end] intervals
  * per key. The naive formulation (`p.t BETWEEN i.start AND i.end` as a join
  * condition) plans as a nested-loop join — quadratic per key and a
  * 100 TB-killer. The standard fix, implemented here: quantize time into
  * fixed-width buckets, explode each interval onto every bucket it covers,
  * and equi-join on (key, bucket) with the exact range predicate as a
  * post-filter. The join becomes hash-shuffle-shaped (Catalyst/AQE handle it
  * like any equi-join: broadcast when small, skew-split when hot), and the
  * only amplification is the bounded explode factor
  * `len(interval)/bucketWidth + 1` — pick `bucketWidth` near the typical
  * interval length so it stays 1-3×.
  *
  * Each (point, interval) pair meets exactly once: a point owns ONE bucket
  * and `sequence` emits each covered bucket once — no post-join dedup.
  */
object Intervals {

  /** Join `points` (with a long time column `tCol`) to `intervals` (with
    * long `startCol`/`endCol`, inclusive ends) on equal `keyCols` and
    * `start <= t <= end`. Non-key column names must be disjoint between the
    * two frames. Time columns must be integral (epoch micros, not
    * timestamps) so bucket arithmetic is exact. */
  def bucketedIntervalJoin(points: DataFrame, intervals: DataFrame,
                           keyCols: Seq[String], tCol: String,
                           startCol: String, endCol: String,
                           bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // backticks: column names like `end` are SQL keywords
    val pb = points.withColumn("__bucket", expr(s"`$tCol` div ${bucketWidth}L"))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(expr(s"`$startCol` div ${bucketWidth}L"),
        expr(s"`$endCol` div ${bucketWidth}L"))))
    pb.join(ib, (keyCols :+ "__bucket").toSeq)
      .filter(col(startCol) <= col(tCol) && col(tCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Per-key interval UNION — merge overlapping-or-touching [start, end]
    * spans into maximal islands (the classic gaps-and-islands formulation
    * every warehouse runs for "total active/covered time": SLA uptime,
    * user activity coverage, sensor validity windows). Two spans merge
    * when the later one starts at or before the running maximum end of
    * everything before it (inclusive ends ⇒ touching merges).
    *
    * Pure windowed SQL both engines replay identically: per key, ordered
    * by (start, end), carry `max(end)` over the PRECEDING rows (a running
    * frame — rule 22: never unbounded-FOLLOWING); a row opens a new
    * island iff its start exceeds that carry; the island id is the
    * running count of opens. One keyed exchange, O(1) carried state after
    * the sort — the e7/e14 skew class (see ARCHITECTURE "Skew notes").
    * Tie rows (identical start AND end) are value-identical, so the
    * ROWS-frame tie order cannot move any result. Output: one row per
    * merged island — key cols, `span_id` (1-based per key in start
    * order), `start`, `end`, `n_merged`. Time columns must be integral
    * (epoch µs) so comparisons are exact. */
  def intervalUnion(intervals: DataFrame, keyCols: Seq[String],
                    startCol: String, endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "intervalUnion needs at least one key column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startCol).asc, col(endCol).asc)
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMax.isNull || col(startCol) > prevMax, 1L)
      .otherwise(0L)
    intervals
      .withColumn("__open", opens)
      .withColumn("span_id",
        sum(col("__open")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keyCols.map(col) :+ col("span_id")): _*)
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("n_merged"))
  }
}
