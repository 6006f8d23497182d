package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup — the arrival-time form of
  * [[graft.operators.Dedup.exactKeep]] for continuous ingestion: keyed
  * state over content fingerprints remembers the first (canonical) id per
  * fingerprint across micro-batches, so late duplicates map to the keeper
  * that already shipped.
  *
  * This is the Structured Streaming-native shape the prompt's §2.8 calls
  * for: `groupByKey(fingerprint).flatMapGroupsWithState` — state lives in
  * the checkpointed state store (RocksDB-backed on a real cluster), keys
  * partition across executors, and each micro-batch touches only the
  * fingerprints it contains. No timeout: dedup state is permanent by
  * semantics (bound it operationally by TTL'ing the checkpoint if the
  * corpus re-keys).
  *
  * Output: one (id, fp, keep_id) row per input doc — `id == keep_id` marks
  * the copy to keep; within a first-contact micro-batch the canonical id
  * is the min id of the batch's group (the same deterministic choice as
  * the batch operator).
  */
object StreamingDedup {

  def keepFirst(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withFp = docs.select(
      col(idCol).cast("long").as("id"),
      graft.functions.text.fingerprint(col(textCol)).as("fp"))
      .as[(Long, String)]
    withFp.groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, String, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (fp: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val ids = rows.map(_._1).toVector.sorted
          val keep = state.getOption.getOrElse(ids.min)
          if (!state.exists) state.update(keep)
          ids.iterator.map(id => (id, fp, keep))
      }
      .toDF("id", "fp", "keep_id")
  }
}
