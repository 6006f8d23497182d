package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Behavioral gates for scene-cut detection: cuts land exactly where the
  * frame content changes, near-identical frames never cut, undecodable
  * frames keep their timeline row with null hamming and no fabricated cut
  * on either adjacent transition, and the first frame of every video is
  * honest-null. The m8 oracle proves engine-replay; this proves the
  * SEMANTICS on pixels built here, not via the fixture's hash contract. */
class SceneCutsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** 9x8 gradient PNG; `flipTop` inverts the top half's step direction —
    * a ~32-bit dHash change (hard cut); `nudge` shifts one step (1 bit). */
  private def png(flipTop: Boolean, nudge: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8) {
      var v = 128
      img.setRGB(0, y, (v << 16) | (v << 8) | v)
      for (x <- 0 until 8) {
        val up = if (y < 4 && flipTop) x % 2 == 0 else x % 2 == 1
        val upN = if (nudge && y == 7 && x == 7) !up else up
        v += (if (upN) 10 else -10)
        img.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("cuts at content changes only; 1-bit drift stays under threshold") {
    val frames = Seq(
      (1L, 0L, png(flipTop = false)),
      (1L, 2L, png(flipTop = false)),               // identical -> 0
      (1L, 4L, png(flipTop = false, nudge = true)), // 1 bit -> no cut
      (1L, 6L, png(flipTop = true))                 // half the hash flips
    ).toDF("video_id", "ts", "bytes")
    val out = Multimodal.sceneCuts(frames, "video_id", "ts", "bytes",
      maxHamming = 10)
      .orderBy("ts")
      .as[(Long, Long, Option[Long], Boolean)].collect()
    assert(out(0)._3.isEmpty && !out(0)._4, "first frame: null hamming, no cut")
    assert(out(1)._3.contains(0L) && !out(1)._4, "identical frame")
    assert(out(2)._3.exists(h => h >= 1 && h <= 2) && !out(2)._4,
      s"1-bit nudge stays under threshold: ${out(2)}")
    assert(out(3)._3.exists(_ > 10) && out(3)._4, s"hard cut detected: ${out(3)}")
  }

  test("undecodable frame keeps its timeline row, cuts nothing") {
    val frames = Seq(
      (5L, 0L, png(flipTop = false)),
      (5L, 2L, Array[Byte](1, 2, 3)),   // junk bytes
      (5L, 4L, png(flipTop = false))
    ).toDF("video_id", "ts", "bytes")
    val out = Multimodal.sceneCuts(frames, "video_id", "ts", "bytes",
      maxHamming = 10)
      .orderBy("ts")
      .as[(Long, Long, Option[Long], Boolean)].collect()
    assert(out.length == 3, "timeline stays complete")
    assert(out(1)._3.isEmpty && !out(1)._4, "junk frame: null, no cut")
    assert(out(2)._3.isEmpty && !out(2)._4,
      "transition FROM a junk frame is unjudgeable, not a cut")
  }
  test("videoNearDups: exact re-upload matches on every frame; 1-bit " +
    "jitter still matches; a hard-different video with a shared block " +
    "emits an audited non-dup; frame-count mismatch never a candidate; " +
    "undecodable frames drop from the signature") {
    // videos: 10 = original (3 frames), 11 = 1-bit-nudged re-encode,
    // 12 = hard-different content but SAME first-frame lower blocks
    // (flipTop flips ~32 bits spread over blocks -> may or may not
    // collide; instead 12 reuses frame 0 verbatim so blocks agree, and
    // hard-flips frames 1..2 -> match 1/3 < 80%), 13 = only 2 frames
    // (same content as 10 -> still never a candidate), 14 = 10's twin
    // with a junk middle frame (signature shrinks to 2 frames -> count
    // mismatch with 10, no candidacy)
    val f0 = png(flipTop = false)
    val f0n = png(flipTop = false, nudge = true)
    val fX = png(flipTop = true)
    val frames = Seq(
      (10L, 0L, f0), (10L, 1L, f0), (10L, 2L, f0),
      (11L, 0L, f0n), (11L, 1L, f0n), (11L, 2L, f0n),
      (12L, 0L, f0), (12L, 1L, fX), (12L, 2L, fX),
      (13L, 0L, f0), (13L, 1L, f0),
      (14L, 0L, f0), (14L, 1L, Array[Byte](9, 9)), (14L, 2L, f0)
    ).toDF("video_id", "ts", "bytes")
    val out = Multimodal.videoNearDups(frames, "video_id", "ts", "bytes",
        maxHamming = 3, minMatchPpm = 800000L)
      .as[(Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out.contains((10L, 11L)), "jittered re-encode is a candidate")
    assert(out((10L, 11L)) == ((10L, 11L, 3L, 3L, 1000000L, true)),
      s"every frame matches within 1 bit: ${out((10L, 11L))}")
    assert(out.contains((10L, 12L)) && !out((10L, 12L))._6,
      "shared-first-frame different video: audited non-dup candidate")
    assert(out((10L, 12L))._4 == 1L && out((10L, 12L))._5 == 333333L)
    // 13 and 14 both carry 2-frame signatures of the same content (14's
    // junk middle frame DROPPED from its signature) - they pair with
    // each other, and NEITHER pairs with the 3-frame videos: the count
    // gate refuses cross-length alignment rather than faking it
    assert(out((13L, 14L)) == ((13L, 14L, 2L, 2L, 1000000L, true)))
    assert(!out.keySet.exists(k =>
      (Set(k._1, k._2) & Set(13L, 14L)).nonEmpty &&
        (Set(k._1, k._2) & Set(10L, 11L, 12L)).nonEmpty),
      "frame-count mismatch is never a candidate")
    val e = intercept[IllegalArgumentException] {
      Multimodal.videoNearDups(frames, "video_id", "ts", "bytes",
        maxHamming = 9)
    }
    assert(e.getMessage.contains("pigeonhole"))
  }

  test("videoNearDups: a dup whose FIRST frame alone is hard-different " +
    "(intro card) is still found — blocking is per-rank, not first-frame") {
    // 20 = original (5 frames), 21 = same content but frame 0 replaced
    // by a hard-different intro card (~32-bit dHash distance >> 3).
    // Frames 1..4 match exactly -> 4/5 = 800000 ppm >= threshold: a
    // true dup that first-frame-only blocking would silently miss.
    val f0 = png(flipTop = false)
    val fX = png(flipTop = true)
    val frames = Seq(
      (20L, 0L, f0), (20L, 1L, f0), (20L, 2L, f0), (20L, 3L, f0), (20L, 4L, f0),
      (21L, 0L, fX), (21L, 1L, f0), (21L, 2L, f0), (21L, 3L, f0), (21L, 4L, f0)
    ).toDF("video_id", "ts", "bytes")
    val out = Multimodal.videoNearDups(frames, "video_id", "ts", "bytes",
        maxHamming = 3, minMatchPpm = 800000L)
      .as[(Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out.contains((20L, 21L)),
      "intro-card variant must be a candidate via ranks 2..5")
    assert(out((20L, 21L)) == ((20L, 21L, 5L, 4L, 800000L, true)),
      s"4/5 frames match -> dup: ${out((20L, 21L))}")
  }

}
