package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming HDR quantile sketch — the online arm of
  * [[graft.operators.Sketches.hdrQuantiles]] and the family's clearest
  * case FOR streaming state: the sketch's keyed state IS its mergeable
  * bucket-count map — bounded by the bucket universe
  * ((64−p)·2^(p−1)+2^p cells, ~3.8k at p = 7), independent of how many
  * rows have flowed through — so "live p99 latency per service" carries
  * a few KB per key forever while the batch operator would re-scan
  * history. Updates are the batch operator's EXACT integer bucketing
  * (bitlength−p exponent, top-p-bit mantissa, the `bin`-string law) and
  * each micro-batch emits the CURRENT per-key nearest-rank read-outs, so
  * after any prefix of rows the latest emission per key equals the batch
  * operator's rows over that prefix (rebuild equivalence,
  * StreamingHdrQuantilesSpec-gated). Negative values raise loudly (the
  * batch contract).
  *
  * Emits (Update mode) one row per (key, q_pct) per touched batch:
  * (key, q_pct, n, est, max_err). */
object StreamingHdrQuantiles {

  /** packed bucket key = e·2²¹ + m (m < 2^p ≤ 2²⁰ by the guard). */
  case class State(buckets: Map[Long, Long])

  def quantiles(df: DataFrame, keyCol: String, valueCol: String,
                precisionBits: Int = 7,
                quantilesPct: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(precisionBits >= 2 && precisionBits <= 20,
      s"StreamingHdrQuantiles needs precisionBits in [2, 20] " +
        s"(got $precisionBits)")
    require(quantilesPct.nonEmpty &&
      quantilesPct.forall(q => q >= 1 && q <= 100),
      s"StreamingHdrQuantiles needs quantiles in [1, 100] " +
        s"(got $quantilesPct)")
    graft.operators.Guards.requireIntegral(df, valueCol,
      "StreamingHdrQuantiles")
    val spark = df.sparkSession
    import spark.implicits._
    val p = precisionBits
    val qs = quantilesPct
    val typed = df.select(col(keyCol).cast("string").as("k"),
        col(valueCol).cast("long").as("v"))
      .as[(String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[State, (String, Long, Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[State]) =>
          var b = state.getOption.map(_.buckets).getOrElse(Map.empty[Long, Long])
          rows.foreach { case (_, v) =>
            require(v >= 0,
              s"StreamingHdrQuantiles: negative $v for key '$key' - HDR " +
                "buckets cover magnitudes; shift the domain upstream")
            // bitlen via nlz == length(bin(v)) for v > 0; v = 0 reads
            // bitlen 1 in the batch bin-string law, e = 0 either way
            val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(v)
            val e = math.max(0, bitLen - p).toLong
            val m = v >> e
            val pk = (e << 21) | m
            b = b.updated(pk, b.getOrElse(pk, 0L) + 1L)
          }
          state.update(State(b))
          val cells = b.toSeq
            .map { case (pk, c) => (pk >> 21, pk & ((1L << 21) - 1), c) }
            .sortBy(t => (t._1, t._2))
          val n = cells.iterator.map(_._3).sum
          qs.iterator.map { q =>
            val r = (q.toLong * n + 99) / 100
            var cum = 0L
            val hit = cells.find { c => cum += c._3; cum >= r }.get
            (key, q.toLong, n, hit._2 << hit._1.toInt,
              (1L << hit._1.toInt) - 1)
          }
      }
      .toDF("key", "q_pct", "n", "est", "max_err")
  }
}
