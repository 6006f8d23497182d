package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming fixed-point EWMA — the unbounded-history arm
  * [[graft.operators.Features.ewmaFixedPoint]]'s scaladoc names: the batch
  * fold collects each key's full history (bounded-group contract); this
  * carries ONE scaled long of keyed state per key and updates it event by
  * event, so a key's history length never matters. Same exact integer
  * update — s ← (num·s) div den + (den−num)·x div den, values
  * floor-scaled — so for in-order delivery the stream state after any
  * prefix equals the batch fold over that prefix (the rebuild-equivalence
  * StreamingEwmaSpec gates). Same arrival contract as
  * [[StreamingFunnel]]: per-key non-decreasing (ts, id) across
  * micro-batches, each batch's group sorted in the handler.
  *
  * Emits (Update mode) one row per key per micro-batch that touched it:
  * `key`, `n` (events so far), `ewma_fp`. */
object StreamingEwma {

  def ewma(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valueCol: String, scale: Long = 1000000L,
           num: Long = 7L, den: Long = 8L): DataFrame = {
    require(den >= 1 && num >= 0 && num < den, s"ewma needs 0<=num<den (got $num/$den)")
    require(scale >= 1, s"ewma needs scale>=1 (got $scale)")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
      col(keyCol).cast("long").as("k"),
      unix_micros(col(tsCol)).as("us"),
      col(idCol).cast("long").as("id"),
      floor(col(valueCol) * scale).cast("long").as("x"))
      .as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Long, Long)](
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var (n, s) = state.getOption.getOrElse((0L, 0L))
          rows.toVector.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, x) =>
            s = if (n == 0L) x else num * s / den + (den - num) * x / den
            n += 1
          }
          state.update((n, s))
          (key, n, s)
      }
      .toDF("key", "n", "ewma_fp")
  }
}
