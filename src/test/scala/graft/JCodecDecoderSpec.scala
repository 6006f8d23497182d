package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{JCodecDecoder, JCodecFrameDecoder, Multimodal}

/** Integration spec for the optional JCodec-backed video frame decoder:
  * runs against real seek-decoded pixels when a JCodec jar is on the
  * classpath and cancels cleanly when it is not (this sandbox ships none —
  * zero egress; CI binds the test-scope API stub instead, which exercises
  * the identical reflection chain). The semantics AROUND the seat
  * (skip/blank/numbering) are gated by the deterministic-fake test below
  * either way — same split as PdfboxRendererSpec / ColpaliRenderingSpec. */
class JCodecDecoderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The stub container format; with real JCodec these fixtures would be
    * tiny MP4s and every assertion below holds unchanged. */
  private def fakeVideo(durationSec: Double, label: String): Array[Byte] =
    s"GRAFT-VID\n$durationSec\n$label".getBytes(StandardCharsets.UTF_8)

  test("absence is detected at construction with an actionable error, not a NoClassDefFoundError") {
    assume(!JCodecDecoder.available, "JCodec present - absence path not testable")
    val e = intercept[IllegalArgumentException](JCodecFrameDecoder())
    assert(e.getMessage.contains("classpath"), s"unhelpful error: ${e.getMessage}")
  }

  test("jcodec binds and decodes real pixels: duration + seek-decode round-trip") {
    assume(JCodecDecoder.available, "JCodec jar not on classpath")
    val d = JCodecFrameDecoder()
    assert(d.durationSec(fakeVideo(65.0, "clip")) == 65.0)
    val img = ImageIO.read(new ByteArrayInputStream(d.frameAt(fakeVideo(65.0, "clip"), 30.0)))
    assert(img.getWidth == 320 && img.getHeight == 240)
    // text was drawn -> decoded frame is not uniform (would fail the blank gate)
    val px = (0 until img.getHeight).flatMap(y => (0 until img.getWidth).map(img.getRGB(_, y)))
    assert(px.distinct.length > 1, "decoded frame has real non-blank pixels")
  }

  test("seek outside the track duration is a per-frame failure (throws), not a hang") {
    assume(JCodecDecoder.available, "JCodec jar not on classpath")
    intercept[Exception](JCodecFrameDecoder().frameAt(fakeVideo(10.0, "clip"), 99.0))
  }

  test("videoFrameChunks over the bound decoder: frames per stepSec, dense numbering, bad container = zero rows") {
    assume(JCodecDecoder.available, "JCodec jar not on classpath")
    import spark.implicits._
    val docs = Seq(
      (1L, fakeVideo(65.0, "clip")),          // steps 0,30,60 -> 3 frames
      (2L, fakeVideo(65.0, "")),              // decodes blank -> all gated
      (3L, "not a video".getBytes(StandardCharsets.UTF_8))) // open fails -> 0
      .toDF("doc_id", "bytes")
    val out = Multimodal.videoFrameChunks(docs, "doc_id", "bytes",
      JCodecFrameDecoder(), stepSec = 30)
      .as[(Long, Int, Double, String, Boolean)].collect().toSeq.sorted
    assert(out.map(c => (c._1, c._2, c._3)) ==
      Seq((1L, 0, 0.0), (1L, 1, 30.0), (1L, 2, 60.0)),
      "only the decodable non-blank video contributes, chunk numbers dense over survivors")
    assert(out.forall(_._4.startsWith("data:image/jpeg;base64,")))
  }

  test("per-document demux amortization: one container open per doc, not per frame") {
    assume(JCodecDecoder.available, "JCodec jar not on classpath")
    // only the STUB exposes the open counter; with a real jar the
    // amortization is the same code path but uncountable from here
    val counter = scala.util.Try(
      Class.forName("org.jcodec.api.FrameGrab")
        .getMethod("opens").invoke(null)
        .asInstanceOf[java.util.concurrent.atomic.AtomicInteger]).toOption
    assume(counter.isDefined, "real JCodec jar (no test counter) - skipping count assert")
    val c = counter.get
    val d = JCodecFrameDecoder()
    val vid = fakeVideo(300.0, "clip") // ONE array instance, like the chunk flow
    val before = c.get()
    d.durationSec(vid)
    (0 until 10).foreach(i => d.frameAt(vid, i * 30.0))
    assert(c.get() - before == 1,
      s"probe + 10 frames of one doc should open the container once, opened ${c.get() - before}")
    // a different document (new array) naturally evicts the slot
    d.durationSec(fakeVideo(10.0, "other"))
    assert(c.get() - before == 2)
    // a failing frame evicts and retries once on a fresh demuxer — the
    // per-frame fault contract costs exactly the reopens it needs
    val v2 = fakeVideo(10.0, "clip")
    d.durationSec(v2)                        // open 3
    intercept[Exception](d.frameAt(v2, 99.0)) // out-of-range: retry opens 4...
    assert(c.get() - before == 4, "failed frame = evict + one fresh retry")
    d.frameAt(v2, 5.0) // cache was evicted after the double failure -> reopen
    assert(c.get() - before == 5)
  }

  // Seat-independent semantics with a deterministic fake (always runs,
  // jar or not) — the ColpaliRenderingSpec split applied to frames.
  private object FakeDecoder extends Multimodal.FrameDecoder {
    override def durationSec(b: Array[Byte]): Double =
      if (b.isEmpty) throw new RuntimeException("unparseable") else 70.0
    override def frameAt(b: Array[Byte], ts: Double): Array[Byte] = {
      if (ts == 30.0) throw new RuntimeException("corrupt GOP")
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try {
        g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 64, 64)
        if (ts != 60.0) { g.setColor(java.awt.Color.BLACK); g.fillRect(8, 8, 16, 16) }
      } finally g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", out); out.toByteArray
    }
  }

  test("videoFrameChunks skips failed and blank frames, keeps the rest; failed probe = zero frames") {
    import spark.implicits._
    val docs = Seq((7L, "vid".getBytes), (8L, Array.emptyByteArray))
      .toDF("doc_id", "bytes")
    val out = Multimodal.videoFrameChunks(docs, "doc_id", "bytes",
      FakeDecoder, stepSec = 30)
      .as[(Long, Int, Double, String, Boolean)].collect().toSeq.sorted
    // duration 70 -> ts 0,30,60: 30 throws (skipped), 60 blank (gated)
    assert(out.map(c => (c._1, c._2, c._3)) == Seq((7L, 0, 0.0)),
      "chunk numbers dense over survivors; probe-failed doc contributes nothing")
    assert(out.forall(_._5), "every frame chunk is flagged is_image")
  }
}
