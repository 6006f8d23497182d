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
}
