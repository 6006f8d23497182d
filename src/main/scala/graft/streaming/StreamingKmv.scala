package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming KMV (bottom-k) distinct sketch — the online arm of
  * [[graft.operators.Sketches.kmvOverlap]]'s per-corpus half and the
  * second sketch whose keyed state IS the sketch: the bottom-k set is
  * bounded by k longs per corpus no matter how many rows flow through,
  * so "live distinct-URL / distinct-n-gram count per source" carries a
  * few KB per key forever. The batch operator re-scans history for the
  * same answer; the streaming state merges each micro-batch's hashes
  * into the running bottom-k (the KMV mergeable law: bottom-k of a
  * union is the bottom-k of the sketch union).
  *
  * Updates are the batch operator's EXACT hash arithmetic — h = first
  * 15 hex digits of md5("kmv:" ‖ key), a 60-bit integer — and the
  * estimate is the same ⌊(k−1)·2^60 / h₍ₖ₎⌋ BigInt floor division
  * (|S| < k → |S| exactly), so after any prefix of rows the latest
  * emission per corpus equals the batch sketch over that prefix
  * (rebuild equivalence, StreamingKmvSpec-gated). Cross-corpus overlap
  * stays a sketch-side batch step: persist the emitted bottom-k states
  * and merge pairs offline — the stream never joins corpora.
  *
  * Emits (Update mode) one row per corpus per touched batch:
  * (corpus, sk_n, kth, est). */
object StreamingKmv {

  case class State(hs: Vector[Long])

  def distinctEstimate(df: DataFrame, corpusCol: String, keyCol: String,
                       k: Int = 256): DataFrame = {
    require(k >= 16 && k <= 4096,
      s"StreamingKmv needs k in [16, 4096] (got $k)")
    graft.operators.Guards.requireString(df, keyCol, "StreamingKmv")
    val spark = df.sparkSession
    import spark.implicits._
    val bigNum = BigInt(k - 1) * (BigInt(1) << 60)
    val typed = df.select(col(corpusCol).cast("string").as("c"),
        col(keyCol).as("key"))
      .as[(String, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[State, (String, Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (corpus: String, rows: Iterator[(String, String)],
         state: GroupState[State]) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          var hs = state.getOption.map(_.hs).getOrElse(Vector.empty[Long])
          rows.foreach { case (_, key) =>
            md.reset()
            val hex = md.digest(s"kmv:$key".getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
            // admit only if it can enter the bottom-k: below the current
            // max, or the sketch is not yet full — then dedup + re-cap
            if (hs.length < k || h < hs.last) {
              val idx = hs.search(h)(Ordering.Long)
              idx match {
                case scala.collection.Searching.Found(_) => // duplicate
                case scala.collection.Searching.InsertionPoint(i) =>
                  hs = (hs.take(i) :+ h) ++ hs.drop(i)
                  if (hs.length > k) hs = hs.dropRight(1)
              }
            }
          }
          state.update(State(hs))
          val skN = hs.length.toLong
          val est =
            if (skN < k) skN
            else (bigNum / hs.last).toLong
          Iterator.single((corpus, skN, if (hs.isEmpty) 0L else hs.last,
            est))
      }
      .toDF("corpus", "sk_n", "kth", "est")
  }
}
