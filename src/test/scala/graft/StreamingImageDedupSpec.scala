package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Incremental-crawl arm of the image dedup pass: incoming micro-batches
  * decode + hash only themselves and match against the static corpus
  * dHash index (the StreamingCorpusDedup pattern at image granularity). */
class StreamingImageDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 9x8 staircase PNG encoding `bits` (the ImageCodecSpec construction). */
  private def staircase(bits: Long): Array[Byte] = {
    val img = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8) {
      var v = 128
      for (x <- 0 until 9) {
        if (x > 0) v += (if (((bits >> (y * 8 + (x - 1))) & 1L) == 1L) 10 else -10)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val baseBits = 0x5a5a5a5a5a5a5aL

  test("micro-batches match against the static dHash index; best match wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, staircase(baseBits)),
      (101L, staircase(baseBits ^ 1L)),        // 1 bit off doc 100
      (102L, staircase(0x0fedcba987654L)))     // far from everything
      .toDF("doc_id", "bytes")
    val index = Multimodal.imageDHashIndex(corpus, "doc_id", "bytes").cache()
    index.count()

    val matches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val input = MemoryStream[(Long, Array[Byte])]
    val q = input.toDF().toDF("doc_id", "bytes").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        matches ++= Multimodal.imageMatchAgainst(batch, index, "doc_id", "bytes")
          .as[(Long, Long, Long)].collect()
        ()
      }.start()
    try {
      // batch 1: an exact re-crawl of 100 and a novel image
      input.addData((1L, staircase(baseBits)), (2L, staircase(0x7777777777777L)))
      q.processAllAvailable()
      // batch 2: near-dup 2 bits from 100 (1 bit from 101) — best match 101
      input.addData((3L, staircase(baseBits ^ 3L)))
      q.processAllAvailable()
    } finally q.stop()
    assert(matches.toSet == Set((1L, 100L, 0L), (3L, 101L, 1L)),
      s"exact re-crawl matches its original, near-dup its closest: $matches")
  }
}
