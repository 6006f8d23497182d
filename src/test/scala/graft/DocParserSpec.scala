package graft

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DocParser
import graft.sources.OfficeFixtures

/** Golden tests for the pure-JDK document parsers against generated
  * real-container fixtures: xlsx (inline + shared strings), docx, pptx,
  * pdf (raw + Flate streams, escapes, hex strings), plain-text decode,
  * and dispatch fallback. */
class DocParserSpec extends AnyFunSuite {

  test("xlsx markdown matches the reference emit shape exactly") {
    val bytes = OfficeFixtures.xlsx(Seq(
      "Budget" -> Seq(Seq("item", "cost"), Seq("disk", "70"), Seq("ram", "30"))))
    val want =
      "## Budget\n\n| item | cost |\n| --- | --- |\n| disk | 70 |\n| ram | 30 |\n"
    assert(DocParser.parse("t.xlsx", bytes) == want)
  }

  test("xlsx shared-strings layout parses identically to inline strings") {
    val sheets = Seq("S1" -> Seq(Seq("a", "b"), Seq("c", "d")))
    assert(DocParser.parse("t.xlsx", OfficeFixtures.xlsx(sheets, sharedStrings = true)) ==
      DocParser.parse("t.xlsx", OfficeFixtures.xlsx(sheets, sharedStrings = false)))
  }

  test("xlsx multi-sheet order, pipe escaping, and sheet separator") {
    val bytes = OfficeFixtures.xlsx(Seq(
      "A" -> Seq(Seq("x|y")),
      "B" -> Seq(Seq("z"))))
    assert(DocParser.parse("t.xlsx", bytes) ==
      "## A\n\n| x\\|y |\n| --- |\n\n## B\n\n| z |\n| --- |\n")
  }

  test("docx paragraphs join with blank lines") {
    val bytes = OfficeFixtures.docx(Seq("first para", "second para"))
    assert(DocParser.parse("t.docx", bytes) == "first para\n\nsecond para")
  }

  test("pptx slides in numeric order, paragraphs per slide") {
    val bytes = OfficeFixtures.pptx(Seq(Seq("title", "body"), Seq("slide two")))
    assert(DocParser.parse("t.pptx", bytes) == "title\nbody\n\nslide two")
  }

  test("pdf text extraction: raw and Flate-compressed streams agree") {
    val lines = Seq("hello pdf world", "second line here")
    val raw = DocParser.parse("t.pdf", OfficeFixtures.pdf(lines, compress = false))
    val flate = DocParser.parse("t.pdf", OfficeFixtures.pdf(lines, compress = true))
    assert(raw == "hello pdf world\nsecond line here")
    assert(flate == raw)
  }

  test("pdf string escapes: parens and backslashes round-trip") {
    val lines = Seq("a (nested) \\ line")
    assert(DocParser.parse("t.pdf", OfficeFixtures.pdf(lines)) == "a (nested) \\ line")
  }

  test("pdf hex strings decode") {
    val content = "BT (ab) Tj T* <48656C6C6F> Tj ET"
    val pdf = (s"%PDF-1.4\n1 0 obj\n<< /Length ${content.length} >>\nstream\n" +
      content + "\nendstream\nendobj\n%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    assert(DocParser.parse("t.pdf", pdf) == "ab\nHello")
  }

  test("plain text decodes utf-8 with latin-1 fallback") {
    assert(DocParser.parse("a.txt", "héllo".getBytes(StandardCharsets.UTF_8)) == "héllo")
    // invalid UTF-8 byte sequence -> latin-1
    assert(DocParser.parse("a.md", Array[Byte](0x68, 0xE9.toByte, 0x21)) == "hé!")
  }

  test("unparseable office bytes yield empty string, like the reference") {
    assert(DocParser.parse("broken.xlsx", Array[Byte](1, 2, 3)) == "")
    assert(DocParser.parse("broken.docx", "not a zip".getBytes) == "")
  }

  test("pdf per-page extraction walks the object graph (raw and Flate)") {
    val pages = Seq(
      Seq("page one line a", "page one line b"),
      Seq("page two only"),
      Seq("page three x", "page three y"))
    for (compress <- Seq(false, true)) {
      val got = DocParser.parsePdfPages(OfficeFixtures.pdfPages(pages, compress))
      assert(got == Seq(
        "page one line a\npage one line b",
        "page two only",
        "page three x\npage three y"), s"compress=$compress")
    }
    // single-page builder still yields one page
    assert(DocParser.parsePdfPages(OfficeFixtures.pdf(Seq("solo"))) == Seq("solo"))
  }
}
