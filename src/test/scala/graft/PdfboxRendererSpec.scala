package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, PdfboxPageRenderer, PdfboxRenderer}
import graft.sources.OfficeFixtures

/** Integration spec for the optional PDFBox-backed page rasterizer: runs
  * against real rendered pixels when a PDFBox jar is on the classpath and
  * cancels cleanly when it is not (this sandbox ships none — zero egress).
  * The semantics AROUND the seat (skip/blank/numbering) stay gated by
  * ColpaliRenderingSpec's deterministic fakes either way. */
class PdfboxRendererSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def twoPagePdf = OfficeFixtures.pdfPages(
    Seq(Seq("page one line a", "page one line b"), Seq("page two only")))

  test("absence is detected at construction with an actionable error, not a NoClassDefFoundError") {
    assume(!PdfboxRenderer.available, "PDFBox present - absence path not testable")
    val e = intercept[IllegalArgumentException](PdfboxPageRenderer())
    assert(e.getMessage.contains("classpath"), s"unhelpful error: ${e.getMessage}")
  }

  test("pdfbox binds and renders real pixels: pageCount + render round-trip") {
    assume(PdfboxRenderer.available, "PDFBox jar not on classpath")
    val r = PdfboxPageRenderer(dpi = 96f)
    assert(r.pageCount(twoPagePdf) == 2)
    val img = ImageIO.read(new ByteArrayInputStream(r.render(twoPagePdf, 0)))
    // 612x792pt media box at 96dpi = 816x1056px
    assert(img.getWidth == 816 && img.getHeight == 1056)
  }

  test("pageImageChunks over the real renderer: text pages survive the blank gate") {
    assume(PdfboxRenderer.available, "PDFBox jar not on classpath")
    import spark.implicits._
    val docs = Seq((1L, twoPagePdf)).toDF("doc_id", "bytes")
    val out = Multimodal.pageImageChunks(docs, "doc_id", "bytes",
      PdfboxPageRenderer(dpi = 96f))
      .as[(Long, Int, Int, String, Boolean)].collect().sortBy(_._2).toSeq
    assert(out.map(c => (c._2, c._3)) == Seq((0, 0), (1, 1)),
      "both text pages render non-blank, chunk numbers dense")
    assert(out.forall(_._4.startsWith("data:image/jpeg;base64,")))
  }
}
