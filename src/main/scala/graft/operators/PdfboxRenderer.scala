package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Optional Apache PDFBox binding for the [[Multimodal.PageRenderer]] seat —
  * the real rasterizer a deployment plugs into the S10/S11 page-image flow
  * (the pyMuPDF/pdf2image seat, reference
  * `core/services/ingestion_service.py:1416-1896`).
  *
  * Bound via REFLECTION, not a compile-time dependency: this sandbox ships
  * no PDFBox jar (zero egress, fixed build.sbt), and the engine must keep
  * compiling without one. A deployment drops `pdfbox-app` on the driver +
  * executor classpath and [[PdfboxPageRenderer]] binds at first use; when
  * the jar is absent, [[PdfboxRenderer.available]] is false and the
  * integration spec cancels cleanly. Both PDFBox lines are supported:
  * 3.x (`org.apache.pdfbox.Loader.loadPDF`) and 2.x
  * (`PDDocument.load(byte[])`), probed in that order.
  *
  * Scale shape: unchanged from the seat contract — the renderer runs inside
  * [[Multimodal.pageImageChunks]]'s mapPartitions, one JVM-local call per
  * page, no shuffle. Each call loads the document fresh: render failures
  * stay PER-PAGE recoverable (a corrupt page cannot poison a shared parsed
  * document), which is the seat's error contract; a deployment that needs
  * per-document parse amortization wraps its own caching renderer.
  */
object PdfboxRenderer {

  /** One resolved reflection surface (per JVM, lazily). */
  private[operators] final class Binding(
      val load: Array[Byte] => AnyRef,
      val pageCount: AnyRef => Int,
      val render: (AnyRef, Int, Float) => BufferedImage,
      val close: AnyRef => Unit)

  @transient private lazy val binding: Option[Binding] =
    scala.util.Try {
      val pdDoc = Class.forName("org.apache.pdfbox.pdmodel.PDDocument")
      // 3.x moved static loading to Loader; 2.x has PDDocument.load
      val load: Array[Byte] => AnyRef =
        scala.util.Try {
          val m = Class.forName("org.apache.pdfbox.Loader")
            .getMethod("loadPDF", classOf[Array[Byte]])
          (b: Array[Byte]) => m.invoke(null, b)
        }.getOrElse {
          val m = pdDoc.getMethod("load", classOf[Array[Byte]])
          (b: Array[Byte]) => m.invoke(null, b)
        }
      val rendererCls = Class.forName("org.apache.pdfbox.rendering.PDFRenderer")
      val ctor = rendererCls.getConstructor(pdDoc)
      val renderM = rendererCls.getMethod("renderImageWithDPI",
        classOf[Int], classOf[Float])
      val pagesM = pdDoc.getMethod("getNumberOfPages")
      val closeM = pdDoc.getMethod("close")
      new Binding(
        load,
        doc => pagesM.invoke(doc).asInstanceOf[Integer].intValue,
        (doc, page, dpi) => renderM.invoke(ctor.newInstance(doc),
          Int.box(page), Float.box(dpi)).asInstanceOf[BufferedImage],
        doc => closeM.invoke(doc))
    }.toOption

  /** True iff a PDFBox (2.x or 3.x) is on this JVM's classpath. */
  def available: Boolean = binding.isDefined

  private[operators] def bound: Binding = binding.getOrElse(throw new IllegalStateException(
    "PDFBox is not on the classpath: add pdfbox-app (2.x or 3.x) to the " +
      "driver and executor classpath to use PdfboxPageRenderer"))

  /** The text-extraction half of the same jar:
    * `org.apache.pdfbox.text.PDFTextStripper.getText(PDDocument)` (same
    * package in 2.x and 3.x), one fresh stripper per call — PDFTextStripper
    * instances are stateful and not thread-safe, and a task may run next to
    * 31 others in this JVM. */
  @transient private lazy val stripBinding: Option[AnyRef => String] =
    binding.flatMap { _ =>
      scala.util.Try {
        val cls = Class.forName("org.apache.pdfbox.text.PDFTextStripper")
        val ctor = cls.getConstructor()
        val getText = cls.getMethods
          .find(m => m.getName == "getText" && m.getParameterCount == 1).get
        (doc: AnyRef) => getText.invoke(ctor.newInstance().asInstanceOf[AnyRef], doc)
          .asInstanceOf[String]
      }.toOption
    }

  /** True iff PDFBox including its text stripper is on this classpath. */
  def textAvailable: Boolean = stripBinding.isDefined

  private[operators] def stripText(doc: AnyRef): String =
    stripBinding.getOrElse(throw new IllegalStateException(
      "PDFBox is not on the classpath: add pdfbox-app (2.x or 3.x) to the " +
        "driver and executor classpath to use PdfboxDeepStage"))(doc)
}

/** Optional PDFBox-backed binding for the [[DocParser.DeepStage]] seat —
  * the "accurate" fallback rung of the p5 parse ladder (the reference's
  * Docling/EasyOCR slot, `morphik_parser.py:527-651`): when the native
  * extractor comes back empty and the bytes aren't decodable text, a real
  * PDF text engine gets one more shot before the doc is accepted-but-marked
  * `no_content_extracted`. PDFBox's stripper handles the layouts, encodings
  * and font/CMap machinery the pure-JDK extractor deliberately doesn't
  * (`DocParser` scaladoc states those limits), which is exactly the
  * strength gap the deep rung exists for.
  *
  * Same lifecycle as [[PdfboxPageRenderer]]: reflection-bound optional jar,
  * fail-fast at DRIVER construction; an executor-side classpath gap throws
  * IllegalStateException, which [[DocParser.parseWithFallback]] rethrows as
  * a configuration error instead of treating as a parse failure. Non-PDF
  * bytes (the deep rung sees arbitrary binary) fail PDF load with an
  * ordinary exception → the ladder falls through to accept-but-mark, per
  * its contract. */
case class PdfboxDeepStage() extends DocParser.DeepStage {

  require(PdfboxRenderer.textAvailable,
    "PDFBox is not on the classpath: add pdfbox-app (2.x or 3.x) before " +
      "constructing PdfboxDeepStage")

  override def parse(filename: String, bytes: Array[Byte]): String = {
    val b = PdfboxRenderer.bound
    val doc = b.load(bytes)
    try PdfboxRenderer.stripText(doc) finally b.close(doc)
  }
}

/** The pluggable renderer: configuration only (serializable to executors);
  * the reflection surface re-resolves lazily in each JVM. */
case class PdfboxPageRenderer(dpi: Float = 96f, format: String = "jpg")
    extends Multimodal.PageRenderer {

  // fail fast at DRIVER construction when no PDFBox is on the classpath —
  // an absence first noticed per-task would surface as swallowed per-doc
  // failures. (Java serialization bypasses the constructor, so this does
  // not re-run on executors; an executor-side classpath gap still throws
  // IllegalStateException from `bound`, which pageImageChunks rethrows as
  // a configuration error rather than treating as a parse failure.)
  require(PdfboxRenderer.available,
    "PDFBox is not on the classpath: add pdfbox-app (2.x or 3.x) before " +
      "constructing PdfboxPageRenderer")

  override def pageCount(docBytes: Array[Byte]): Int = {
    val b = PdfboxRenderer.bound
    val doc = b.load(docBytes)
    try b.pageCount(doc) finally b.close(doc)
  }

  override def render(docBytes: Array[Byte], page: Int): Array[Byte] = {
    val b = PdfboxRenderer.bound
    val doc = b.load(docBytes)
    try {
      val img = b.render(doc, page, dpi)
      // JPEG writers reject ARGB; repaint onto RGB first (same normalization
      // ImageCodec applies before its JPEG encode)
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
    } finally b.close(doc)
  }
}
