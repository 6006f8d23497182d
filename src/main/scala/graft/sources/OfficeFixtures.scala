package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

/** Deterministic minimal-but-valid document builders (xlsx / docx / pptx /
  * pdf) for exercising [[graft.operators.DocParser]] end to end — the
  * sandbox ships no office suites, so ingestion fixtures are synthesized
  * from corpus rows. The generators emit the standard OOXML package shape
  * (content types, rels, parts) and standard PDF object/stream layout, so
  * the parser is tested against real container formats, not mocks.
  */
object OfficeFixtures {

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def zip(entries: Seq[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** XLSX with the given sheets (name -> rows of cells). `sharedStrings`
    * switches cell storage between inline strings and the shared-string
    * table — both real-world layouts. */
  def xlsx(sheets: Seq[(String, Seq[Seq[String]])],
           sharedStrings: Boolean = false): Array[Byte] = {
    val allStrings = sheets.flatMap(_._2.flatten).distinct
    val stringIdx = allStrings.zipWithIndex.toMap
    def cellXml(v: String, ref: String): String =
      if (sharedStrings) s"""<c r="$ref" t="s"><v>${stringIdx(v)}</v></c>"""
      else s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
    def colRef(c: Int): String = {
      var n = c + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheetXmls = sheets.zipWithIndex.map { case ((_, rows), si) =>
      val rowsXml = rows.zipWithIndex.map { case (cells, ri) =>
        val cellsXml = cells.zipWithIndex.map { case (v, ci) =>
          cellXml(v, s"${colRef(ci)}${ri + 1}")
        }.mkString
        s"""<row r="${ri + 1}">$cellsXml</row>"""
      }.mkString
      s"xl/worksheets/sheet${si + 1}.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rowsXml</sheetData></worksheet>""".stripMargin
    }
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>${
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString}</sheets></workbook>""".stripMargin
    val rels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">${
        sheets.indices.map { i =>
          s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
        }.mkString}</Relationships>""".stripMargin
    val sst =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${allStrings.length}" uniqueCount="${allStrings.length}">${
        allStrings.map(s => s"<si><t>${xmlEscape(s)}</t></si>").mkString}</sst>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/></Types>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin
    zip(Seq(
      "[Content_Types].xml" -> contentTypes,
      "_rels/.rels" -> rootRels,
      "xl/workbook.xml" -> workbook,
      "xl/_rels/workbook.xml.rels" -> rels) ++
      (if (sharedStrings) Seq("xl/sharedStrings.xml" -> sst) else Seq.empty) ++
      sheetXmls)
  }

  /** DOCX with one w:t run per paragraph. */
  def docx(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map(p =>
      s"<w:p><w:r><w:t>${xmlEscape(p)}</w:t></w:r></w:p>").mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>$body</w:body></w:document>""".stripMargin
    zip(Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>""".stripMargin,
      "word/document.xml" -> doc))
  }

  /** PPTX with one a:t run per paragraph per slide. */
  def pptx(slides: Seq[Seq[String]]): Array[Byte] = {
    val slideEntries = slides.zipWithIndex.map { case (paras, i) =>
      val body = paras.map(p =>
        s"<a:p><a:r><a:t>${xmlEscape(p)}</a:t></a:r></a:p>").mkString
      s"ppt/slides/slide${i + 1}.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"><p:cSld><p:spTree><p:sp><p:txBody>$body</p:txBody></p:sp></p:spTree></p:cSld></p:sld>""".stripMargin
    }
    zip(Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/></Types>""".stripMargin) ++ slideEntries)
  }

  /** Multi-page PDF: one content stream per page (each line shown with
    * `Tj`, `T*` line breaks); `compress` Flate-encodes the streams. */
  def pdfPages(pages: Seq[Seq[String]], compress: Boolean = false): Array[Byte] = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    def streamBytes(lines: Seq[String]): Array[Byte] = {
      val content = ("BT /F1 12 Tf 14 TL 72 720 Td " +
        lines.map(l => s"(${esc(l)}) Tj").mkString(" T* ") + " ET")
        .getBytes(StandardCharsets.ISO_8859_1)
      if (!compress) content
      else {
        val d = new Deflater()
        d.setInput(content); d.finish()
        val buf = new ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
        d.end()
        buf.toByteArray
      }
    }
    val n = pages.length
    val fontObj = 3 + 2 * n
    val filter = if (compress) " /Filter /FlateDecode" else ""
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    w("%PDF-1.4\n")
    offsets += bos.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets += bos.size()
    w(s"2 0 obj\n<< /Type /Pages /Kids [${
      (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")}] /Count $n >>\nendobj\n")
    (0 until n).foreach { i =>
      offsets += bos.size()
      w(s"${3 + i} 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents ${3 + n + i} 0 R /Resources << /Font << /F1 $fontObj 0 R >> >> >>\nendobj\n")
    }
    pages.zipWithIndex.foreach { case (lines, i) =>
      val data = streamBytes(lines)
      offsets += bos.size()
      w(s"${3 + n + i} 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
      bos.write(data)
      w("\nendstream\nendobj\n")
    }
    offsets += bos.size()
    w(s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xref = bos.size()
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    bos.toByteArray
  }

  /** One-page PDF whose content stream shows each line with `Tj` separated
    * by `T*`; `compress` Flate-encodes the stream (both layouts occur in
    * the wild and both paths must parse). */
  def pdf(lines: Seq[String], compress: Boolean = false): Array[Byte] = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val content = ("BT /F1 12 Tf 14 TL 72 720 Td " +
      lines.map(l => s"(${esc(l)}) Tj").mkString(" T* ") + " ET")
      .getBytes(StandardCharsets.ISO_8859_1)
    val streamData =
      if (compress) {
        val d = new Deflater()
        d.setInput(content); d.finish()
        val buf = new ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
        d.end()
        buf.toByteArray
      } else content
    val filter = if (compress) " /Filter /FlateDecode" else ""
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    w("%PDF-1.4\n")
    offsets += bos.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets += bos.size(); w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offsets += bos.size(); w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n")
    offsets += bos.size()
    w(s"4 0 obj\n<< /Length ${streamData.length}$filter >>\nstream\n")
    bos.write(streamData)
    w("\nendstream\nendobj\n")
    offsets += bos.size(); w("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xref = bos.size()
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    bos.toByteArray
  }
}
