// TEST-SCOPE STUB of the Apache PDFBox 2.x API surface that
// graft.operators.PdfboxRenderer binds via reflection. It exists so CI
// exercises the REAL binding chain — Class.forName lookups, static-load
// invocation, boxing, per-call close, ARGB→RGB repaint, ImageIO encode,
// blank-gate integration — without shipping the actual jar (this sandbox
// has no egress). Rasterization is a trivial Graphics2D drawString of the
// text DocParser extracts; a deployment uses real PDFBox, where
// PdfboxRendererSpec's same assertions hold against real rasterization.
// NOT on the main classpath: production `available` is false unless a real
// PDFBox jar is present.
package org.apache.pdfbox

package pdmodel {

  class PDDocument(val bytes: Array[Byte]) {
    private[pdfbox] var closed = false
    def getNumberOfPages: Int =
      graft.operators.DocParser.parsePdfPages(bytes).length
    def close(): Unit = closed = true
  }

  object PDDocument {
    // Scala emits a static forwarder for this, matching the reflection
    // lookup `PDDocument.getMethod("load", classOf[Array[Byte]])`
    def load(bytes: Array[Byte]): PDDocument = new PDDocument(bytes)
  }
}

package text {

  class PDFTextStripper {
    def getText(doc: pdmodel.PDDocument): String = {
      require(!doc.closed, "getText after close")
      graft.operators.DocParser.parsePdfPages(doc.bytes).mkString("\n\n")
    }
  }
}

package rendering {

  import java.awt.image.BufferedImage
  import java.awt.{Color, RenderingHints}

  class PDFRenderer(doc: pdmodel.PDDocument) {
    def renderImageWithDPI(page: Int, dpi: Float): BufferedImage = {
      require(!doc.closed, "render after close")
      // US-Letter media box (612x792pt) scaled by dpi, like real PDFBox
      val w = math.round(612f * dpi / 72f); val h = math.round(792f * dpi / 72f)
      // ARGB on purpose: the adapter must repaint to RGB before JPEG encode
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
      val g = img.createGraphics()
      try {
        g.setColor(Color.WHITE); g.fillRect(0, 0, w, h)
        g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
          RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
        g.setColor(Color.BLACK)
        val text = graft.operators.DocParser.parsePdfPages(doc.bytes)
          .lift(page).getOrElse(throw new IndexOutOfBoundsException(s"page $page"))
        text.split("\n").zipWithIndex.foreach { case (line, i) =>
          g.drawString(line, w / 10, h / 10 + i * (dpi / 6f).toInt)
        }
      } finally g.dispose()
      img
    }
  }
}
