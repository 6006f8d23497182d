package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel attainment — the continuous form of
  * [[graft.operators.Funnel.funnel]]: per-user keyed state tracks the
  * earliest attainment time of each step (strict-after ordering, journey
  * window from step 1), emitting one row the moment a user reaches a new
  * step. Counting the emissions per step reproduces the batch funnel's
  * `n_users`/`avg_us_from_start` exactly — the rebuild-equivalence
  * StreamingFunnelSpec gates.
  *
  * State is BOUNDED: one long per step per user (the attainment times) —
  * never the event history. That bound is what forces the ordering
  * contract: events must arrive per-user in non-decreasing ts order across
  * micro-batches (within a batch any order — the handler sorts its
  * group). In order, greedy first-eligible == the batch min, so the two
  * arms agree; an out-of-order regression would need the dropped-event
  * candidate sets the bounded state deliberately does not keep. Enforce
  * upstream with watermarked sorting (the same arrival contract
  * [[StreamingDedup]] states for ids). No timeout: funnel state is one
  * journey per user; TTL the checkpoint to re-key.
  *
  * Output (Append): `user`, `step_idx` (1-based), `t_us` (attainment µs),
  * `t1_us` (the journey anchor, so downstream aggregates need no join).
  */
object StreamingFunnel {

  def attainments(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String],
                  windowSec: Long): DataFrame = {
    require(steps.size >= 2, s"funnel needs >=2 steps (got ${steps.size})")
    require(windowSec >= 1, s"funnel needs windowSec>=1 (got $windowSec)")
    val winUs = windowSec * 1000000L
    val stepIdx = steps.zipWithIndex.toMap
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
      col(userCol).cast("long").as("u"),
      col(typeCol).cast("string").as("t"),
      unix_micros(col(tsCol)).as("us"))
      .as[(Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (Long, Int, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[Array[Long]]) =>
          // attained(k) = µs of step k+1, Long.MinValue = not yet
          val attained = state.getOption.getOrElse(
            Array.fill(steps.size)(Long.MinValue))
          val out = Vector.newBuilder[(Long, Int, Long, Long)]
          // within-batch order is unspecified — sort; cross-batch order is
          // the documented arrival contract
          rows.toVector.sortBy(r => (r._3, r._2)).foreach { case (_, t, us) =>
            stepIdx.get(t).foreach { k =>
              if (attained(k) == Long.MinValue) {
                val anchorOk = k == 0 ||
                  (attained(k - 1) != Long.MinValue && us > attained(k - 1) &&
                    us - attained(0) <= winUs)
                if (anchorOk) {
                  attained(k) = us
                  out += ((user, k + 1, us, attained(0)))
                }
              }
            }
          }
          state.update(attained)
          out.result().iterator
      }
      .toDF("user", "step_idx", "t_us", "t1_us")
  }
}
