// TEST-SCOPE STUB of the Tess4J 4.x/5.x API surface that
// graft.operators.TessOcr binds via reflection. It exists so CI exercises
// the REAL binding chain — Class.forName lookup, per-call instance
// construction, datapath/language configuration, doOCR dispatch, the
// PDF-rasterize-then-OCR composition — without shipping the jar or the
// native tesseract libs (this sandbox has no egress). "Recognition" is a
// deterministic ink census: the text a real engine would read back is
// replaced by a marker carrying the configured language, the image
// geometry, and the count of non-white pixels — enough for specs to prove
// rendered-text pages OCR to NON-BLANK output and truly blank pages to
// ink=0. A deployment uses real Tess4J, where TessOcrSpec's structural
// assertions hold against real recognition. NOT on the main classpath:
// production `available` is false unless a real tess4j jar is present.
package net.sourceforge.tess4j

import java.awt.image.BufferedImage

class Tesseract {
  private var datapath: String = ""
  private var language: String = "eng"

  def setDatapath(p: String): Unit = datapath = p
  def setLanguage(l: String): Unit = language = l

  def doOCR(img: BufferedImage): String = {
    var ink = 0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        if ((img.getRGB(x, y) & 0xffffff) != 0xffffff) ink += 1
        x += 1
      }
      y += 1
    }
    if (ink == 0) "" // a blank page reads back as no text, like real OCR
    else s"OCR[$language ${img.getWidth}x${img.getHeight} ink=$ink]"
  }
}
