package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import javax.imageio.ImageIO

/** Optional JCodec binding for the [[Multimodal.FrameDecoder]] seat — the
  * real video decoder a deployment plugs into the S8 frame-sampling flow
  * (the ffmpeg/decord seat, reference `core/parser/video/parse_video.py:91-280`).
  *
  * Bound via REFLECTION, not a compile-time dependency, exactly like
  * [[PdfboxRenderer]]: this sandbox ships no codec jar (zero egress, fixed
  * build.sbt), and the engine must keep compiling without one. A deployment
  * drops the pure-Java JCodec jars (`jcodec` + `jcodec-javase`, 0.2.x) on
  * the driver + executor classpath and [[JCodecFrameDecoder]] binds at
  * first use; when absent, [[JCodecDecoder.available]] is false and the
  * integration spec cancels cleanly.
  *
  * Reflection surface (the stable public 0.2.x API):
  *  - `ByteBufferSeekableByteChannel.readFromByteBuffer(ByteBuffer)` wraps
  *    the in-flight binary column without touching disk;
  *  - `FrameGrab.createFrameGrab(SeekableByteChannel)` opens the container;
  *  - `getVideoTrack().getMeta().getTotalDuration()` reads duration;
  *  - `seekToSecondPrecise(double)` + `getNativeFrame()` seek-decode one
  *    frame; `AWTUtil.toBufferedImage(Picture)` crosses to AWT pixels.
  * Methods are resolved BY NAME (not exact parameter classes) so minor-
  * version signature drift (e.g. the channel subtype) cannot break the
  * probe.
  *
  * Scale shape: unchanged from the seat contract — the decoder runs inside
  * [[Multimodal.videoFrameChunks]]'s mapPartitions, one JVM-local
  * seek-decode per sampled timestamp, no shuffle. The opened demuxer is
  * CACHED PER DOCUMENT (single slot, keyed by bytes-array identity — the
  * chunk flow feeds every frame of one doc the same array instance), so a
  * 2-hour file sampled at 1 frame/2 s parses its container once, not ~3600
  * times. Frame failures stay PER-FRAME recoverable: a decode throw evicts
  * the cached demuxer and retries that frame once on a fresh one (a
  * corrupt GOP cannot poison later frames — they never see the failed
  * demuxer), the same error contract as the page-renderer seat.
  */
object JCodecDecoder {

  /** One resolved reflection surface (per JVM, lazily). */
  private[operators] final class Binding(
      val open: Array[Byte] => AnyRef,                 // bytes -> FrameGrab
      val duration: AnyRef => Double,                  // grab -> seconds
      val frameAt: (AnyRef, Double) => BufferedImage)  // (grab, ts) -> pixels

  private def method(cls: Class[_], name: String): java.lang.reflect.Method =
    cls.getMethods.find(_.getName == name).getOrElse(
      throw new NoSuchMethodException(s"${cls.getName}.$name"))

  @transient private lazy val binding: Option[Binding] =
    scala.util.Try {
      val chanCls = Class.forName("org.jcodec.common.io.ByteBufferSeekableByteChannel")
      val grabCls = Class.forName("org.jcodec.api.FrameGrab")
      val awtCls = Class.forName("org.jcodec.scale.AWTUtil")
      val wrap = method(chanCls, "readFromByteBuffer")
      val create = method(grabCls, "createFrameGrab")
      val track = method(grabCls, "getVideoTrack")
      val seek = method(grabCls, "seekToSecondPrecise")
      val native = method(grabCls, "getNativeFrame")
      val toImg = method(awtCls, "toBufferedImage")
      val open: Array[Byte] => AnyRef = bytes =>
        create.invoke(null, wrap.invoke(null, ByteBuffer.wrap(bytes)))
      new Binding(
        open,
        grab => {
          val meta = method(track.getReturnType, "getMeta").invoke(track.invoke(grab))
          method(meta.getClass, "getTotalDuration").invoke(meta)
            .asInstanceOf[java.lang.Double].doubleValue
        },
        (grab, ts) => {
          seek.invoke(grab, java.lang.Double.valueOf(ts))
          toImg.invoke(null, native.invoke(grab)).asInstanceOf[BufferedImage]
        })
    }.toOption

  /** True iff a JCodec (0.2.x API surface) is on this JVM's classpath. */
  def available: Boolean = binding.isDefined

  private[operators] def bound: Binding = binding.getOrElse(throw new IllegalStateException(
    "JCodec is not on the classpath: add jcodec + jcodec-javase (0.2.x) to " +
      "the driver and executor classpath to use JCodecFrameDecoder"))
}

/** The pluggable decoder: configuration only (serializable to executors);
  * the reflection surface re-resolves lazily in each JVM. */
case class JCodecFrameDecoder(format: String = "jpg")
    extends Multimodal.FrameDecoder {

  // fail fast at DRIVER construction when no JCodec is on the classpath —
  // an absence first noticed per-task would surface as swallowed per-frame
  // failures. (Java serialization bypasses the constructor, so this does
  // not re-run on executors; an executor-side classpath gap still throws
  // IllegalStateException from `bound`, which videoFrameChunks rethrows as
  // a configuration error rather than treating as a decode failure.)
  require(JCodecDecoder.available,
    "JCodec is not on the classpath: add jcodec + jcodec-javase (0.2.x) " +
      "before constructing JCodecFrameDecoder")

  // Single-slot per-document demux cache. Identity (eq), not content,
  // keys the slot: videoFrameChunks passes the SAME array instance for
  // every frame of one doc, and identity comparison is free where a
  // content hash would re-scan megabytes per frame. @transient — each
  // deserialized task closure starts with an empty slot, so tasks never
  // share a demuxer even when they share the JVM (local mode / multiple
  // executor cores).
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedGrab: AnyRef = _

  private def grabFor(bytes: Array[Byte]): AnyRef = {
    if (cachedGrab == null || !(cachedBytes eq bytes)) {
      cachedGrab = JCodecDecoder.bound.open(bytes)
      cachedBytes = bytes
    }
    cachedGrab
  }

  override def durationSec(videoBytes: Array[Byte]): Double =
    JCodecDecoder.bound.duration(grabFor(videoBytes))

  override def frameAt(videoBytes: Array[Byte], tsSec: Double): Array[Byte] = {
    val b = JCodecDecoder.bound
    val img =
      try b.frameAt(grabFor(videoBytes), tsSec)
      catch {
        case scala.util.control.NonFatal(_) =>
          // per-frame fault contract: evict the possibly-poisoned demuxer
          // and retry THIS frame once fresh; if the fresh one also fails,
          // evict again (the next frame reopens) and let the caller's
          // skip-on-failure semantics take it
          cachedGrab = null
          try b.frameAt(grabFor(videoBytes), tsSec)
          catch { case e2: Throwable => cachedGrab = null; throw e2 }
      }
    // JPEG writers reject ARGB; repaint onto RGB first (same normalization
    // as PdfboxPageRenderer / ImageCodec before a JPEG encode)
    val rgb =
      if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else {
        val c = new BufferedImage(img.getWidth, img.getHeight,
          BufferedImage.TYPE_INT_RGB)
        val g = c.createGraphics()
        try { g.drawImage(img, 0, 0, java.awt.Color.WHITE, null) }
        finally g.dispose()
        c
      }
    val out = new ByteArrayOutputStream()
    if (!ImageIO.write(rgb, format, out))
      throw new IllegalStateException(s"no ImageIO writer for format=$format")
    out.toByteArray
  }
}
