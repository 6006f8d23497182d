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
}
