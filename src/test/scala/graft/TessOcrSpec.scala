package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ChainedDeepStage, DocParser, PdfboxDeepStage,
  PdfboxRenderer, TessOcr, TessOcrDeepStage}
import graft.sources.OfficeFixtures

/** Integration spec for the optional Tess4J OCR rung of the p5 parse
  * ladder: runs against recognition when a tess4j jar is on the classpath
  * (CI binds the test-scope ink-census stub — same split as
  * JCodecDecoderSpec) and cancels cleanly when it is not. The ladder
  * semantics AROUND the seat stay gated by DocParserSpec + the p5 oracle. */
class TessOcrSpec extends AnyFunSuite {

  private object BlindNativeStage extends DocParser.Stage {
    def parse(filename: String, bytes: Array[Byte]): String = ""
  }

  private def pdf = OfficeFixtures.pdfPages(
    Seq(Seq("scanned page alpha"), Seq("scanned page beta")), compress = true)

  private def pngBytes(draw: Boolean): Array[Byte] = {
    val img = new BufferedImage(120, 60, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 120, 60)
      if (draw) { g.setColor(java.awt.Color.BLACK); g.drawString("INVOICE", 10, 30) }
    } finally g.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out); out.toByteArray
  }

  test("absence is detected at construction with an actionable error, not a NoClassDefFoundError") {
    assume(!TessOcr.available, "Tess4J present - absence path not testable")
    val e = intercept[IllegalArgumentException](TessOcrDeepStage())
    assert(e.getMessage.contains("classpath"), s"unhelpful error: ${e.getMessage}")
  }

  test("tess4j binds: a rendered-text PDF OCRs page-by-page to non-blank text") {
    assume(TessOcr.available, "tess4j jar not on classpath")
    assume(PdfboxRenderer.available, "PDF OCR also needs the PDFBox seat")
    val text = TessOcrDeepStage(dpi = 96f).parse("scan.pdf", pdf)
    // two pages, both carrying drawn glyphs -> two non-blank page texts
    val pages = text.split("\n\n")
    assert(pages.length == 2, s"expected 2 OCR'd pages, got: $text")
    assert(pages.forall(_.trim.nonEmpty))
  }

  test("a plain scanned image OCRs directly; a blank one reads back empty") {
    assume(TessOcr.available, "tess4j jar not on classpath")
    val stage = TessOcrDeepStage(language = "deu")
    val withInk = stage.parse("scan.png", pngBytes(draw = true))
    assert(withInk.trim.nonEmpty, "drawn glyphs must OCR to non-blank text")
    assert(withInk.contains("deu"), "configured language reaches the engine")
    assert(stage.parse("blank.png", pngBytes(draw = false)).trim.isEmpty)
  }

  test("ladder: image-only bytes fall past the stripper to the OCR rung (path=deep)") {
    assume(TessOcr.available, "tess4j jar not on classpath")
    assume(PdfboxRenderer.textAvailable, "chain test needs both seats")
    val chain = ChainedDeepStage(Seq(PdfboxDeepStage(), TessOcrDeepStage()))
    // a PNG is not a PDF: the stripper rung fails ordinarily, OCR recovers
    val r = DocParser.parseWithFallback("scan.png", pngBytes(draw = true),
      deep = chain, stage = BlindNativeStage)
    assert(r.path == "deep", s"expected the deep rung, got ${r.path}")
    assert(r.text.trim.nonEmpty)
    assert(r.extractionStatus.contains("deep_fallback_succeeded"))
  }

  test("chain order: embedded text wins without invoking OCR; garbage still accept-but-marks") {
    assume(TessOcr.available, "tess4j jar not on classpath")
    assume(PdfboxRenderer.textAvailable, "chain test needs both seats")
    object ExplodingOcr extends DocParser.DeepStage {
      def parse(f: String, b: Array[Byte]): String =
        throw new RuntimeException("OCR must not run when the stripper succeeds")
    }
    val r = DocParser.parseWithFallback("doc.pdf", pdf,
      deep = ChainedDeepStage(Seq(PdfboxDeepStage(), ExplodingOcr)),
      stage = BlindNativeStage)
    assert(r.path == "deep" && r.text.contains("scanned page alpha"))
    val junk = Array.tabulate[Byte](256)(i => (i % 251).toByte)
    val r2 = DocParser.parseWithFallback("blob.bin", junk,
      deep = ChainedDeepStage(Seq(PdfboxDeepStage(), TessOcrDeepStage())),
      stage = BlindNativeStage)
    assert(r2.path == "none" && r2.extractionStatus.contains("no_content_extracted"))
  }
}
