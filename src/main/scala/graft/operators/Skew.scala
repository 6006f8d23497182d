package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for non-algebraic aggregations.
  *
  * Algebraic aggs (sum/count/min/max/avg) don't need this — Spark's partial
  * aggregation (map-side combine) already collapses hot keys before the
  * shuffle. The problem case is holistic aggs like `collect_list`: every
  * row of a hot key lands in one reducer task. Salting splits each key into
  * `salts` sub-keys for a first-stage aggregation, then merges the (now
  * bounded-size) partials in a second stage — the classic two-stage
  * repartition trick, kept fully declarative. AQE's skew handling covers
  * joins, not aggregations, so this is the groupBy-side answer.
  */
object Skew {

  /** collect_list over possibly-skewed keys in two salted stages; output
    * (groupCols..., values: array). Order within the array is
    * non-deterministic (as with plain collect_list) — sort downstream if
    * order matters. */
  def saltedCollectList(df: DataFrame, groupCols: Seq[String], valueCol: String,
                        salts: Int = 32): DataFrame = {
    val gc = groupCols.map(col)
    val salted = df.withColumn("__salt", pmod(spark_partition_id()
      + hash(col(valueCol)), lit(salts)))
    salted
      .groupBy((gc :+ col("__salt")): _*)
      .agg(collect_list(col(valueCol)).as("__partial"))
      .groupBy(gc: _*)
      .agg(flatten(collect_list(col("__partial"))).as("values"))
  }

  /** Generic two-stage aggregation: `partial` runs per (key, salt),
    * `merge` combines the partials per key. Caller guarantees
    * merge(partial(a), partial(b)) == partial(a ++ b) semantics. */
  def saltedAgg(df: DataFrame, groupCols: Seq[String], salts: Int)(
      partial: Column, merge: Column => Column): DataFrame = {
    val gc = groupCols.map(col)
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy((gc :+ col("__salt")): _*)
      .agg(partial.as("__partial"))
      .groupBy(gc: _*)
      .agg(merge(col("__partial")).as("agg"))
  }
}
