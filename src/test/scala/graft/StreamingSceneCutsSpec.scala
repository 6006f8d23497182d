package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.streaming.StreamingSceneCuts

/** [[StreamingSceneCuts]] rebuild equivalence: the union of rows emitted
  * across micro-batches must equal the batch
  * [[Multimodal.sceneCuts]] over everything ingested so far — including a
  * batch boundary INSIDE a scene (the carried one-frame state must score
  * the first frame of the next batch against the last of the previous)
  * and an undecodable frame straddling a boundary (null propagates, never
  * a fabricated cut). */
class StreamingSceneCutsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def png(flipTop: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8) {
      var v = 128
      img.setRGB(0, y, (v << 16) | (v << 8) | v)
      for (x <- 0 until 8) {
        val up = if (y < 4 && flipTop) x % 2 == 0 else x % 2 == 1
        v += (if (up) 10 else -10)
        img.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("streamed transitions equal the batch rerun, across scene-splitting batch seams") {
    implicit val sqlCtx = spark.sqlContext
    val a = png(flipTop = false); val b = png(flipTop = true)
    val junk = Array[Byte](9, 9, 9)
    // video 1: a a | a b  (seam mid-scene; cut arrives in batch 2)
    // video 2: a junk | a (undecodable frame straddles the seam)
    val batch1 = Seq((1L, 0L, a), (1L, 2L, a), (2L, 0L, a), (2L, 2L, junk))
    val batch2 = Seq((1L, 4L, a), (1L, 6L, b), (2L, 4L, a))
    val input = MemoryStream[(Long, Long, Array[Byte])]
    val q = StreamingSceneCuts.sceneCuts(
        input.toDF().toDF("video_id", "ts", "bytes"),
        "video_id", "ts", "bytes", maxHamming = 10)
      .writeStream.format("memory").queryName("scene_stream")
      .outputMode("append").start()
    val streamed = try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      spark.table("scene_stream")
        .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    } finally q.stop()

    val all = (batch1 ++ batch2).toDF("video_id", "ts", "bytes")
    val rebuilt = Multimodal.sceneCuts(all, "video_id", "ts", "bytes",
        maxHamming = 10)
      .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    assert(streamed == rebuilt, s"stream $streamed\nvs batch $rebuilt")
    // the seam-crossing facts themselves:
    assert(streamed.contains((1L, 4L, Some(0L), false)),
      "first frame of batch 2 scored against carried batch-1 state")
    assert(streamed.exists(r => r._1 == 1L && r._2 == 6L && r._4),
      "the cut lands inside batch 2")
    assert(streamed.contains((2L, 4L, None, false)),
      "transition FROM the carried undecodable frame stays null")
  }
}
