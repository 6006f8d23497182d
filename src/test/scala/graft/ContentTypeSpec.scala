package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ContentType
import graft.sources.OfficeFixtures

/** Ports the detect_content_type precedence table
  * (`core/storage/utils_file_extensions.py`) and the v2 ingest filename /
  * storage-key / tag-strip helpers over real container fixtures.
  */
class ContentTypeSpec extends AnyFunSuite {

  private val pdf = OfficeFixtures.pdfPages(Seq(Seq("hello")))
  private val docx = OfficeFixtures.docx(Seq("para"))
  private val xlsx = OfficeFixtures.xlsx(Seq(("S1", Seq(Seq("a")))))
  private val pptx = OfficeFixtures.pptx(Seq(Seq("slide")))

  test("magic sniff wins over hint and filename") {
    assert(ContentType.detect(Some(pdf), Some("x.txt"), Some("text/plain"))
      == "application/pdf")
    assert(ContentType.detect(Some(docx), None, None)
      == "application/vnd.openxmlformats-officedocument.wordprocessingml.document")
    assert(ContentType.detect(Some(xlsx), None, None)
      == "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet")
    assert(ContentType.detect(Some(pptx), None, None)
      == "application/vnd.openxmlformats-officedocument.presentationml.presentation")
    assert(ContentType.sniffMagic("PNG1234".getBytes("ISO-8859-1").updated(0, 0x89.toByte))
      .contains("image/png"))
  }

  test("generic hints are ignored; real hints clean their parameters") {
    val text = "just words".getBytes("UTF-8")
    // text bytes sniff to nothing -> hint wins, params stripped
    assert(ContentType.detect(Some(text), None, Some("text/HTML; charset=utf-8"))
      == "text/html")
    // generic hint dropped -> filename extension
    assert(ContentType.detect(Some(text), Some("a.md"), Some("application/octet-stream"))
      == "text/markdown")
    // no hint, no filename, printable -> text/plain
    assert(ContentType.detect(Some(text), None, None) == "text/plain")
    // binary junk -> octet-stream
    val junk = Array.tabulate[Byte](64)(i => (i * 7 % 251).toByte)
    assert(ContentType.detect(Some(junk), None, None) == "application/octet-stream")
  }

  test("colpali-native formats: images and document mimes, not text") {
    assert(ContentType.isColpaliNative(Some("image/webp")))
    assert(ContentType.isColpaliNative(Some("application/pdf")))
    assert(!ContentType.isColpaliNative(Some("text/plain")))
    assert(!ContentType.isColpaliNative(None))
  }

  test("stripXmlTags drops tags, collapses space, unescapes entities") {
    assert(ContentType.stripXmlTags("<p>Hello  <b>world</b></p>") == "Hello world")
    assert(ContentType.stripXmlTags("a &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;")
      == "a <tag> & \"q\" 's'")
    assert(ContentType.stripXmlTags("x &#65;&#x42; y") == "x AB y")
    // double-escaped stays single-decoded (amp last)
    assert(ContentType.stripXmlTags("&amp;lt;") == "&lt;")
  }

  test("normalizeTextFilename keeps extensions, appends html/txt by sniff") {
    assert(ContentType.normalizeTextFilename(Some("r.pdf"), "x", "id1") == "r.pdf")
    assert(ContentType.normalizeTextFilename(Some("notes"), "plain words", "id1")
      == "notes.txt")
    assert(ContentType.normalizeTextFilename(Some("page"), "  <!DOCTYPE HTML><p>", "id1")
      == "page.html")
    assert(ContentType.normalizeTextFilename(None, "<html><body>", "abc")
      == "document_text_abc.html")
    assert(ContentType.normalizeTextFilename(None, "words", "abc")
      == "document_text_abc.txt")
  }

  test("emoji/astral-heavy text counts code points like Python isprintable") {
    // each emoji is TWO UTF-16 units but ONE printable code point; counting
    // units would put the printable ratio near 0 and misclassify as binary
    val emoji = ("😀" * 40 + " ok").getBytes("UTF-8")
    assert(ContentType.detect(Some(emoji), None, None) == "text/plain")
    // a format char (ZWJ)-rich string still fails the ratio (Cf unprintable)
    val zwj = ("‍" * 50 + "ab").getBytes("UTF-8")
    assert(ContentType.detect(Some(zwj), None, None) == "application/octet-stream")
  }

  test("buildStorageKey sanitizes paths and appends the sniffed extension") {
    val (key, safe) = ContentType.buildStorageKey(Some("dir/sub\\report"), pdf, "id9")
    assert(key == "ingest_uploads/id9/report.pdf" && safe == "report.pdf")
    val (key2, safe2) = ContentType.buildStorageKey(Some("a.docx"), docx, "id9")
    assert(key2 == "ingest_uploads/id9/a.docx" && safe2 == "a.docx")
    val (key3, safe3) = ContentType.buildStorageKey(None, "plain".getBytes, "id9")
    assert(key3 == "ingest_uploads/id9/uploaded_file" && safe3 == "uploaded_file")
  }
}
