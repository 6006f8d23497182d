package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming additive Holt–Winters — the online arm of
  * [[graft.operators.Features.holtWinters]] and, like CUSUM, a member of
  * this family that is inherently streaming in production: the point of
  * a one-step-ahead forecast is to score TODAY's volume while it
  * arrives, not in a nightly replay. Consumes the keyed DAILY rollup
  * stream (key, di = epoch day, x = the day's centi sum — what a
  * watermarked daily window aggregation upstream emits; gap-filling is
  * that rollup's job, and a di gap here raises loudly rather than
  * silently mis-phasing every subsequent seasonal index).
  *
  * CONTRACT — the upstream rollup must emit the SHARED GLOBAL-SPAN
  * zero-filled grid for every key (the batch operator's dailyGrid
  * convention: all keys start at the corpus-wide min day, zero-filled),
  * not merely gap-free per-key days. A key whose stream starts later
  * than the global min day seeds its season from its own first arriving
  * day, mis-aligning seed and seasonal phase versus the batch replay —
  * the per-key gap check above cannot see a missing PREFIX. Rebuild
  * equivalence with [[graft.operators.Features.holtWinters]] holds
  * exactly under this contract (StreamingHoltWintersSpec gates both the
  * equivalence and a late-start key against the batch grid).
  *
  * State per key is the MODEL, independent of history length: level,
  * trend, the period seasonal indices, and the seed buffer while the
  * first season accumulates — 3 + period longs. Updates run the batch
  * kernel's EXACT integer recursion (ppm weights, milli fixed point,
  * truncating division, the stated first-season init, the same loud
  * 10¹⁵ input bound with BigInt step products), so after any prefix of days the emitted rows equal the
  * batch operator's over that prefix (rebuild equivalence,
  * StreamingHoltWintersSpec-gated). Seed-season days emit the batch
  * operator's honest NULLs.
  *
  * Emits (Update mode) one row per processed day:
  * (key, di, x_centi, fc_milli, resid_milli, level_milli, trend_milli). */
object StreamingHoltWinters {

  case class State(t: Long, lastDi: Long, l: Long, b: Long,
                   s: Seq[Long], seed: Seq[Long])

  def forecast(days: DataFrame, keyCol: String, dayCol: String,
               valueCol: String, period: Int = 7,
               alphaPpm: Long = 300000L, betaPpm: Long = 50000L,
               gammaPpm: Long = 200000L): DataFrame = {
    require(period >= 2 && period <= 366,
      s"StreamingHoltWinters needs period in [2, 366] (got $period)")
    for ((w, nm) <- Seq((alphaPpm, "alpha"), (betaPpm, "beta"),
                        (gammaPpm, "gamma")))
      require(w >= 0 && w <= 1000000,
        s"StreamingHoltWinters needs $nm in [0, 1e6] ppm (got $w)")
    graft.operators.Guards.requireIntegral(days, valueCol,
      "StreamingHoltWinters")
    val spark = days.sparkSession
    import spark.implicits._
    val typed = days.select(col(keyCol).cast("string").as("k"),
        col(dayCol).cast("long").as("di"),
        col(valueCol).cast("long").as("x"))
      .as[(String, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[State,
        (String, Long, Long, Option[Long], Option[Long], Option[Long],
          Option[Long])](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[State]) =>
          // defined INSIDE the closure: a method-local helper outside it
          // drags the enclosing scope into the task and fails
          // serialization
          def chk(v: Long, what: String): Long = {
            require(math.abs(v) <= 1000000000000000L,
              s"StreamingHoltWinters: |$what| $v past 1e15 - exceeds the " +
                "exact arithmetic headroom; rescale upstream")
            v
          }
          // the batch kernel's BigInt-intermediate ppm mix (truncating)
          def mix(w: Long, a: Long, b: Long): Long =
            ((BigInt(w) * a + BigInt(1000000L - w) * b) / 1000000L).toLong
          var s = state.getOption.getOrElse(
            State(0L, Long.MinValue, 0L, 0L, Vector.fill(period)(0L),
              Vector.empty))
          val out = Vector.newBuilder[
            (String, Long, Long, Option[Long], Option[Long], Option[Long],
              Option[Long])]
          rows.toVector.sortBy(_._2).foreach { case (_, di, x) =>
            require(s.lastDi == Long.MinValue || di == s.lastDi + 1,
              s"StreamingHoltWinters: day gap for key '$key' " +
                s"(${s.lastDi} -> $di) - the upstream daily rollup owns " +
                "gap-filling; a skipped day would mis-phase every " +
                "subsequent seasonal index")
            val xm = chk(Math.multiplyExact(x, 1000L), "milli value")
            if (s.t < period - 1) {
              // seed season accumulating: honest NULLs, buffer the day
              out += ((key, di, x, None, None, None, None))
              s = s.copy(t = s.t + 1, lastDi = di, seed = s.seed :+ xm)
            } else if (s.t == period - 1) {
              // season complete: the stated FPP3-simplified init
              val full = s.seed :+ xm
              val l0 = full.sum / period
              out += ((key, di, x, None, None, None, None))
              s = State(s.t + 1, di, l0, 0L,
                full.map(_ - l0).toVector, Vector.empty)
            } else {
              val p = (s.t % period).toInt
              val fc = s.l + s.b + s.s(p)
              val resid = xm - fc
              val nl = mix(alphaPpm, xm - s.s(p), s.l + s.b)
              val nb = mix(betaPpm, nl - s.l, s.b)
              val ns = mix(gammaPpm, xm - s.l - s.b, s.s(p))
              out += ((key, di, x, Some(fc), Some(resid), Some(nl),
                Some(nb)))
              s = State(s.t + 1, di, nl, nb, s.s.updated(p, ns),
                Vector.empty)
            }
          }
          state.update(s)
          out.result().iterator
      }
      .toDF("key", "di", "x_centi", "fc_milli", "resid_milli",
        "level_milli", "trend_milli")
  }
}
