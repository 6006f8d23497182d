package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming change-log application — the incremental arm of
  * [[graft.operators.Mutations.applyChangelog]]: a live CDC feed
  * (Debezium topic, Delta CDF stream) maintained as a keyed materialized
  * view, without re-folding the log. Keyed state per key is its CURRENT
  * version — (present, payload, last seq) — exactly the row a snapshot
  * table would hold; each micro-batch folds its rows in seq order on top
  * of that state (same per-key last-writer-wins as the batch window
  * form).
  *
  * Out-of-order protection: a row whose seq is ≤ the state's last-applied
  * seq is DROPPED (at-least-once replay of an already-applied change must
  * not regress the view — the same idempotency stance as
  * heavyHittersDelta's sink contract). Emits (Update mode) each key's
  * state after every micro-batch that touched it:
  * `key`, `present`, `payload`, `seq` — the upsert stream a sink merges;
  * `present = false` rows are retraction markers (the key is deleted).
  * Rebuild equivalence vs the batch operator is gated by
  * StreamingChangelogSpec, including a cross-batch D→I resurrection and
  * a replayed (duplicate-seq) change. */
object StreamingChangelog {

  def applyChangelog(log: DataFrame, keyCol: String, seqCol: String,
                     opCol: String, payloadCol: String): DataFrame = {
    val spark = log.sparkSession
    import spark.implicits._
    val typed = log.select(col(keyCol).cast("long"), col(seqCol).cast("long"),
      col(opCol).cast("string"), col(payloadCol).cast("string"))
      .as[(Long, Long, String, String)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Boolean, String, Long), (Long, Boolean, String, Long)](
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, String, String)],
         state: GroupState[(Boolean, String, Long)]) =>
          var (present, payload, lastSeq) =
            state.getOption.getOrElse((false, null: String, Long.MinValue))
          rows.toVector.sortBy(_._2).foreach { case (_, seq, op, p) =>
            if (seq > lastSeq) {
              if (op == "D") { present = false; payload = null }
              else { present = true; payload = p }
              lastSeq = seq
            }
          }
          state.update((present, payload, lastSeq))
          (key, present, payload, lastSeq)
      }
      .toDF("key", "present", "payload", "seq")
  }
}
