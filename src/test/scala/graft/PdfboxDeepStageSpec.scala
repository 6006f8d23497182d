package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DocParser, PdfboxDeepStage, PdfboxRenderer}
import graft.sources.OfficeFixtures

/** Integration spec for the optional PDFBox-backed deep-parse rung of the
  * p5 ladder: runs against real text extraction when a PDFBox jar is on
  * the classpath and cancels cleanly when it is not. The ladder semantics
  * AROUND the seat (rung order, status marks) stay gated by DocParserSpec
  * + the p5 oracle either way. */
class PdfboxDeepStageSpec extends AnyFunSuite {

  /** Simulates the reference's deep-rung trigger: a document the native
    * extractor can't read (scanned/exotic-encoding PDF — our pure-JDK
    * extractor's stated limits), while the BYTES are a perfectly valid PDF
    * a real text engine handles. */
  private object BlindNativeStage extends DocParser.Stage {
    def parse(filename: String, bytes: Array[Byte]): String = ""
  }

  // compress=true: the content streams are deflate-binary, so the ladder's
  // text-decode rung (strict UTF-8, >=90% printable) correctly refuses and
  // the deep rung is the one that must recover the text.
  private def pdf = OfficeFixtures.pdfPages(
    Seq(Seq("quarterly report alpha"), Seq("appendix beta")), compress = true)

  test("absence is detected at construction with an actionable error, not a NoClassDefFoundError") {
    assume(!PdfboxRenderer.textAvailable, "PDFBox present - absence path not testable")
    val e = intercept[IllegalArgumentException](PdfboxDeepStage())
    assert(e.getMessage.contains("classpath"), s"unhelpful error: ${e.getMessage}")
  }

  test("pdfbox stripper binds and extracts real text from a compressed PDF") {
    assume(PdfboxRenderer.textAvailable, "PDFBox jar not on classpath")
    val text = PdfboxDeepStage().parse("report.pdf", pdf)
    assert(text.contains("quarterly report alpha") && text.contains("appendix beta"))
  }

  test("ladder falls to the deep rung and recovers: path=deep, deep_fallback_succeeded") {
    assume(PdfboxRenderer.textAvailable, "PDFBox jar not on classpath")
    val r = DocParser.parseWithFallback("scan.pdf", pdf,
      deep = PdfboxDeepStage(), stage = BlindNativeStage)
    assert(r.path == "deep", s"expected the deep rung, got ${r.path}")
    assert(r.text.contains("quarterly report alpha"))
    assert(r.extractionStatus.contains("deep_fallback_succeeded"))
  }

  test("non-PDF binary through the deep rung: accept-but-mark, not an error") {
    assume(PdfboxRenderer.textAvailable, "PDFBox jar not on classpath")
    val junk = Array.tabulate[Byte](256)(i => (i % 251).toByte)
    val r = DocParser.parseWithFallback("blob.bin", junk,
      deep = PdfboxDeepStage(), stage = BlindNativeStage)
    assert(r.path == "none" && r.extractionStatus.contains("no_content_extracted"))
    assert(r.warning.isDefined)
  }

  test("an executor-side classpath gap is a loud configuration error, not silent no_content") {
    // the ladder must rethrow IllegalStateException from any deep stage
    object MisconfiguredStage extends DocParser.DeepStage {
      def parse(filename: String, bytes: Array[Byte]): String =
        throw new IllegalStateException("PDFBox is not on the classpath")
    }
    intercept[IllegalStateException](DocParser.parseWithFallback(
      "x.pdf", "PKjunk".getBytes(StandardCharsets.ISO_8859_1),
      deep = MisconfiguredStage, stage = BlindNativeStage))
  }
}
