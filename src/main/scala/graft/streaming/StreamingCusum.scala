package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming two-sided CUSUM — the online arm of
  * [[graft.operators.Features.cusumReport]] and the member of this family
  * that is INHERENTLY streaming in production: an SPC monitor exists to
  * alarm while the stream flows, not after a nightly batch. The batch
  * operator's prefix identity (S⁺_t = P_t − min(0, min_{j<t} P_j)) is what
  * makes the state O(1): per key this carries only the two running
  * prefixes, their running minima, and the alarm accounting — eleven
  * numbers, independent of history length — and updates them event by
  * event with the SAME exact integer arithmetic, so for in-order delivery
  * the stream state after any prefix equals the batch report over that
  * prefix (rebuild equivalence, StreamingCusumSpec-gated). Same arrival
  * contract as [[StreamingEwma]]: per-key non-decreasing order key across
  * micro-batches, each batch's group sorted in the handler.
  *
  * Emits (Update mode) one row per key per micro-batch that touched it,
  * with the batch report's exact columns: `key`, `n`, `max_sp`, `max_sn`,
  * `n_alarm_up`, `n_alarm_down`, `first_up`, `first_down`. */
object StreamingCusum {

  case class State(n: Long, pu: Long, pd: Long, minPu: Long, minPd: Long,
                   maxSp: Long, maxSn: Long, nUp: Long, nDown: Long,
                   firstUp: Option[Long], firstDown: Option[Long])

  def cusum(events: DataFrame, keyCol: String, orderCol: String,
            valueCol: String, upperTarget: Long, lowerTarget: Long,
            h: Long): DataFrame = {
    require(h > 0 && upperTarget >= lowerTarget,
      s"cusum needs h > 0 and upperTarget >= lowerTarget " +
        s"(got $h / $upperTarget / $lowerTarget)")
    graft.operators.Guards.requireIntegral(events, valueCol, "StreamingCusum")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(col(keyCol).cast("string").as("k"),
        col(orderCol).cast("long").as("o"),
        col(valueCol).cast("long").as("x"))
      .as[(String, Long, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[State,
        (String, Long, Long, Long, Long, Long, Option[Long], Option[Long])](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[State]) =>
          var s = state.getOption.getOrElse(
            State(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, None, None))
          rows.toVector.sortBy(_._2).foreach { case (_, o, x) =>
            val pu = s.pu + (x - upperTarget)
            val pd = s.pd + (lowerTarget - x)
            // min(0, min of PRIOR prefixes): s.minPu is seeded 0, so the
            // first row reads exactly the batch coalesce(NULL, 0) seam
            val sp = math.max(pu - math.min(0L, s.minPu), 0L)
            val sn = math.max(pd - math.min(0L, s.minPd), 0L)
            s = State(s.n + 1, pu, pd,
              math.min(s.minPu, pu), math.min(s.minPd, pd),
              math.max(s.maxSp, sp), math.max(s.maxSn, sn),
              s.nUp + (if (sp > h) 1L else 0L),
              s.nDown + (if (sn > h) 1L else 0L),
              s.firstUp.orElse(if (sp > h) Some(o) else None),
              s.firstDown.orElse(if (sn > h) Some(o) else None))
          }
          state.update(s)
          (key, s.n, s.maxSp, s.maxSn, s.nUp, s.nDown, s.firstUp, s.firstDown)
      }
      .toDF("key", "n", "max_sp", "max_sn", "n_alarm_up", "n_alarm_down",
        "first_up", "first_down")
  }
}
