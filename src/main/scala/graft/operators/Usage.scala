package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-usage accounting, write side (SURVEY L8,
  * `postgres_database.py:2805-2878` `record_document_storage_deltas`).
  *
  * The reference applies each delta event as
  * `total = GREATEST(total + delta, 0)` — the clamp makes the fold
  * ORDER-DEPENDENT, so this is a per-key ordered reduction, not a window
  * sum (e.g. +10, -100, +5 folds to 5; a clamped sum would give 0).
  * All-zero delta events are skipped before they touch the row, and
  * `app_id` follows the last applied event (`EXCLUDED.app_id` upsert).
  *
  * Expected delta schema: (document_id, app_id, seq, raw_delta,
  * chunk_delta, mv_delta) where `seq` is the event order (monotonic
  * ingestion timestamp/sequence).
  *
  * Scale shape: one groupBy per key; the per-key event list is bounded by
  * updates-per-document (re-ingests), not corpus size, so a plain
  * collect_list is safe for the doc fold. The app-level fold CAN
  * concentrate (one hot app = all its events on one reducer) — for that
  * case pre-fold per (app, document) first, which is exactly what
  * [[foldAppFromDocs]] does when deltas arrive clamp-free.
  */
object Usage {

  private def nonZero(df: DataFrame): DataFrame =
    df.filter(col("raw_delta") =!= 0 || col("chunk_delta") =!= 0 || col("mv_delta") =!= 0)

  private def clampFold(evs: Column, field: String): Column =
    aggregate(evs, lit(0L), (acc, e) =>
      greatest(acc + e.getField(field).cast("long"), lit(0L)))

  private def folded(df: DataFrame, keyCol: String): DataFrame =
    nonZero(df)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col("seq"), col("app_id"),
        col("raw_delta"), col("chunk_delta"), col("mv_delta")))).as("evs"))
      .select(col(keyCol),
        element_at(col("evs"), -1).getField("app_id").as("last_app_id"),
        clampFold(col("evs"), "raw_delta").as("raw_bytes"),
        clampFold(col("evs"), "chunk_delta").as("chunk_bytes"),
        clampFold(col("evs"), "mv_delta").as("multivector_bytes"))

  /** `document_storage_usage` materialized from the delta stream. */
  def foldDocDeltas(deltas: DataFrame): DataFrame =
    folded(deltas, "document_id")
      .withColumnRenamed("last_app_id", "app_id")

  /** `app_storage_usage`: the same ordered clamp-fold over every event of
    * an app (the reference applies doc and app rows in the same
    * transaction, in the same order). */
  def foldAppDeltas(deltas: DataFrame): DataFrame =
    folded(deltas, "app_id").drop("last_app_id")

  /** App rollup via per-document pre-aggregation — equivalent to
    * [[foldAppDeltas]] whenever no document's running total ever clamps
    * (the common case: deltas mirror real byte counts). Two algebraic
    * shuffles, no per-app event concentration — the 100 TB-shaped path. */
  def foldAppFromDocs(deltas: DataFrame): DataFrame =
    foldDocDeltas(deltas)
      .groupBy("app_id")
      .agg(sum("raw_bytes").as("raw_bytes"),
        sum("chunk_bytes").as("chunk_bytes"),
        sum("multivector_bytes").as("multivector_bytes"))
}
