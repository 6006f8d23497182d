package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming scene-cut detection — the incremental arm of
  * [[graft.operators.Multimodal.sceneCuts]] for a LIVE video-ingest
  * stream: frames arrive in micro-batches, and each video's transition
  * scores must not wait for (or re-decode) the full timeline. Per video
  * the batch operator's windowed lag needs only the PREVIOUS frame, so
  * the keyed state is exactly one (ts, dhash, decoded) triple — ~17
  * bytes per video, never a frame buffer — and the per-frame decode
  * stays where the batch arm puts it: a map-only
  * [[graft.operators.ImageCodec.dHash]] BEFORE the stateful stage, so
  * state handling touches 8-byte fingerprints, not pixels.
  *
  * Same semantics as the batch arm, transition for transition: hamming =
  * popcount(hash ⊕ prev) when both sides decode, null when either is
  * undecodable (the frame KEEPS its timeline row — never a fabricated
  * cut — and still becomes the next frame's predecessor, exactly like
  * the batch lag over the null hash), is_cut = hamming > maxHamming.
  * Arrival contract as [[StreamingEwma]]/[[StreamingFunnel]]: per-video
  * non-decreasing ts across micro-batches (a camera/demuxer emits in
  * order), each batch's group sorted in the handler. Under that contract
  * the union of all emitted rows equals the batch
  * [[graft.operators.Multimodal.sceneCuts]] over everything ingested so
  * far — the rebuild equivalence StreamingSceneCutsSpec gates, including
  * a mid-scene batch split and an undecodable frame straddling batches.
  *
  * Emits (Append mode) one row per ingested frame: `video_id`, `ts`,
  * `hamming`, `is_cut`. */
object StreamingSceneCuts {

  def sceneCuts(frames: DataFrame, videoCol: String, tsCol: String,
                bytesCol: String, maxHamming: Int = 10): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"sceneCuts needs maxHamming in [0,64) (got $maxHamming)")
    val spark = frames.sparkSession
    import spark.implicits._
    val hashed = frames.select(
      col(videoCol).cast("long"), col(tsCol).cast("long"), col(bytesCol))
      .as[(Long, Long, Array[Byte])]
      .map { case (v, ts, bytes) =>
        (v, ts, graft.operators.ImageCodec.dHash(bytes))
      }
    hashed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Boolean),
        (Long, Long, Option[Long], Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (video: Long, rows: Iterator[(Long, Long, Option[Long])],
         state: GroupState[(Long, Long, Boolean)]) =>
          // state: (ts, hash-or-0, decoded) of the latest frame seen
          var prev: Option[(Long, Option[Long])] = state.getOption
            .map { case (ts, h, ok) => (ts, if (ok) Some(h) else None) }
          val out = rows.toVector.sortBy(_._2).map { case (_, ts, h) =>
            val hamming = for (p <- prev.flatMap(_._2); c <- h)
              yield java.lang.Long.bitCount(p ^ c).toLong
            prev = Some((ts, h))
            (video, ts, hamming, hamming.exists(_ > maxHamming))
          }
          prev.foreach { case (ts, h) =>
            state.update((ts, h.getOrElse(0L), h.isDefined))
          }
          out.iterator
      }
      .toDF("video_id", "ts", "hamming", "is_cut")
  }
}
