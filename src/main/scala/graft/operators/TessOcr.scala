package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

/** Optional Tess4J (Tesseract) binding for the [[DocParser.DeepStage]]
  * seat — the real OCR rung of the p5 parse ladder (the reference's
  * EasyOCR "accurate" slot, `core/parser/morphik_parser.py:527-651`): a
  * SCANNED document has no text layer, so [[PdfboxDeepStage]]'s stripper
  * comes back empty and only actual character recognition over rendered
  * pixels can recover content before the doc is accepted-but-marked
  * `no_content_extracted`.
  *
  * Bound via REFLECTION like [[PdfboxRenderer]]/[[JCodecDecoder]]: this
  * sandbox ships no OCR jar (zero egress, fixed build.sbt) and the engine
  * must keep compiling without one. A deployment drops `tess4j` (+ its
  * native tesseract libs and a tessdata model dir) on the driver + executor
  * classpath and [[TessOcrDeepStage]] binds at first use; when absent,
  * [[TessOcr.available]] is false and the integration spec cancels cleanly.
  *
  * Reflection surface (stable across tess4j 4.x/5.x):
  *  - `new net.sourceforge.tess4j.Tesseract()` — a FRESH instance per call:
  *    Tesseract instances are stateful and not thread-safe, and a task may
  *    run next to 31 others in this JVM (the PDFTextStripper rule);
  *  - `setDatapath(String)` / `setLanguage(String)` configuration;
  *  - `doOCR(BufferedImage): String` recognition.
  *
  * Scale shape: the stage runs inside [[DocParser.parseLadder]]'s
  * mapPartitions — render + OCR per page, JVM-local, no shuffle. OCR is
  * orders of magnitude heavier than text stripping, which is WHY it sits on
  * the deep rung: only the documents every cheaper rung already failed pay
  * for it (the reference gates its EasyOCR pass the same way).
  */
object TessOcr {

  /** (image, datapath, language) -> recognized text. */
  private[operators] final class Binding(
      val ocr: (BufferedImage, Option[String], String) => String)

  @transient private lazy val binding: Option[Binding] =
    scala.util.Try {
      val cls = Class.forName("net.sourceforge.tess4j.Tesseract")
      val ctor = cls.getConstructor()
      def m(name: String) = cls.getMethods.find(_.getName == name).getOrElse(
        throw new NoSuchMethodException(s"${cls.getName}.$name"))
      val setPath = m("setDatapath")
      val setLang = m("setLanguage")
      val doOcr = cls.getMethods.find(x => x.getName == "doOCR" &&
        x.getParameterCount == 1 &&
        x.getParameterTypes()(0) == classOf[BufferedImage]).getOrElse(
        throw new NoSuchMethodException(s"${cls.getName}.doOCR(BufferedImage)"))
      new Binding((img, datapath, language) => {
        val t = ctor.newInstance().asInstanceOf[AnyRef]
        datapath.foreach(p => setPath.invoke(t, p))
        setLang.invoke(t, language)
        doOcr.invoke(t, img).asInstanceOf[String]
      })
    }.toOption

  /** True iff a Tess4J (4.x/5.x API surface) is on this JVM's classpath. */
  def available: Boolean = binding.isDefined

  private[operators] def bound: Binding = binding.getOrElse(
    throw new IllegalStateException(
      "Tess4J is not on the classpath: add tess4j (and its native " +
        "tesseract + tessdata) to the driver and executor classpath to " +
        "use TessOcrDeepStage"))
}

/** The pluggable OCR deep stage: configuration only (serializable to
  * executors); the reflection surface re-resolves lazily in each JVM.
  *
  * Input routing: `%PDF` bytes are rasterized page-by-page through the
  * [[PdfboxRenderer]] binding (one document load per doc, one render+OCR
  * per page, failed pages skipped — all-fail = empty = the ladder's
  * accept-but-mark path) and the page texts joined with blank lines;
  * anything else is tried as a plain image (`ImageIO.read`) — scanned
  * TIFF/PNG/JPEG ingests OCR directly; non-image bytes raise an ordinary
  * exception, which [[DocParser.parseWithFallback]] treats as this rung
  * falling through, per the ladder contract. */
case class TessOcrDeepStage(language: String = "eng",
                            datapath: Option[String] = None,
                            dpi: Float = 300f) extends DocParser.DeepStage {

  // fail fast at DRIVER construction when no Tess4J is on the classpath —
  // an absence first noticed per-task would surface as swallowed per-doc
  // failures. (Java serialization bypasses the constructor, so this does
  // not re-run on executors; an executor-side gap still throws
  // IllegalStateException from `bound`, which parseWithFallback rethrows
  // as a configuration error rather than treating as a parse failure.)
  require(TessOcr.available,
    "Tess4J is not on the classpath: add tess4j before constructing " +
      "TessOcrDeepStage")

  override def parse(filename: String, bytes: Array[Byte]): String = {
    val ocr = TessOcr.bound
    if (bytes.length >= 4 && bytes(0) == '%' && bytes(1) == 'P' &&
        bytes(2) == 'D' && bytes(3) == 'F') {
      // rasterizing a scanned PDF needs the PDFBox seat as well; its
      // absence is a CONFIGURATION gap (IllegalStateException from `bound`,
      // rethrown by parseWithFallback), not a parse failure — an
      // image-only corpus never takes this branch and needs no PDFBox
      val b = PdfboxRenderer.bound
      val doc = b.load(bytes)
      try {
        val n = b.pageCount(doc)
        (0 until n).iterator.flatMap { p =>
          try Some(ocr.ocr(b.render(doc, p, dpi), datapath, language))
          catch {
            case e: IllegalStateException => throw e
            case _: Exception => None // corrupt page: skip, keep the rest
          }
        }.map(_.trim).filter(_.nonEmpty).mkString("\n\n")
      } finally b.close(doc)
    } else {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null)
        throw new IllegalArgumentException(
          s"$filename: not a PDF and not a decodable image — OCR rung falls through")
      ocr.ocr(img, datapath, language)
    }
  }
}

/** Deep-stage LADDER composition: try each stage in order, first rung
  * returning non-blank text wins (the reference tries its converter list
  * the same way, `morphik_parser.py:560-651`). The intended stack for a
  * mixed corpus is `ChainedDeepStage(Seq(PdfboxDeepStage(),
  * TessOcrDeepStage()))` — cheap embedded-text stripping first, pixels-OCR
  * only for the scans the stripper recovered nothing from.
  * IllegalStateException (a stage's missing-jar configuration class)
  * rethrows; ordinary failures fall to the next rung. */
case class ChainedDeepStage(stages: Seq[DocParser.DeepStage])
    extends DocParser.DeepStage {
  override def parse(filename: String, bytes: Array[Byte]): String = {
    val it = stages.iterator
    while (it.hasNext) {
      val text =
        try it.next().parse(filename, bytes)
        catch {
          case e: IllegalStateException => throw e
          case _: Exception => ""
        }
      if (text.trim.nonEmpty) return text
    }
    ""
  }
}
