package graft.operators

import java.nio.charset.StandardCharsets

/** Content-type detection and filename/storage-key normalization, porting
  * `core/storage/utils_file_extensions.py` (detect_content_type,
  * is_colpali_native_format) and the v2 ingest helpers
  * (`core/services/v2_document_service.py:101-128,187-193`). Precedence is
  * the reference's exactly: magic-byte sniff → cleaned hint → filename
  * extension → printable-ratio text heuristic → octet-stream. All pure
  * deterministic byte/string compute — safe anywhere in an executor.
  */
object ContentType {

  /** MIME types ColPali ingests natively (images plus these). */
  val colpaliNativeMimeTypes: Set[String] = Set(
    "application/pdf",
    "application/dicom",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "application/msword",
    "application/vnd.ms-powerpoint",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "application/vnd.openxmlformats-officedocument.presentationml.slideshow")

  private val genericTypes = Set(
    "application/octet-stream", "binary/octet-stream", "application/x-octet-stream")

  private val extMimes = Map(
    "txt" -> "text/plain", "md" -> "text/markdown", "html" -> "text/html",
    "htm" -> "text/html", "csv" -> "text/csv", "json" -> "application/json",
    "xml" -> "application/xml", "pdf" -> "application/pdf",
    "png" -> "image/png", "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg",
    "gif" -> "image/gif", "bmp" -> "image/bmp",
    "docx" -> "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "pptx" -> "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "zip" -> "application/zip")

  private def startsWith(b: Array[Byte], magic: Int*): Boolean =
    b.length >= magic.length && magic.zipWithIndex.forall { case (m, i) =>
      (b(i) & 0xff) == m }

  /** Magic-byte sniff (the `filetype.guess` role). Zip containers probe the
    * OOXML content-types entry to distinguish docx/xlsx/pptx from plain
    * zip — same information `filetype`'s office matchers read. */
  def sniffMagic(content: Array[Byte]): Option[String] = {
    if (content == null || content.isEmpty) None
    else if (startsWith(content, 0x25, 0x50, 0x44, 0x46)) Some("application/pdf") // %PDF
    else if (startsWith(content, 0x89, 0x50, 0x4e, 0x47)) Some("image/png")
    else if (startsWith(content, 0xff, 0xd8, 0xff)) Some("image/jpeg")
    else if (startsWith(content, 0x47, 0x49, 0x46, 0x38)) Some("image/gif")
    else if (startsWith(content, 0x42, 0x4d)) Some("image/bmp")
    else if (startsWith(content, 0x50, 0x4b, 0x03, 0x04)) Some(sniffZip(content))
    else None
  }

  private def sniffZip(content: Array[Byte]): String =
    try {
      val names = DocParser.zipEntries(content).keySet
      if (names.exists(_.startsWith("word/"))) extMimes("docx")
      else if (names.exists(_.startsWith("xl/"))) extMimes("xlsx")
      else if (names.exists(_.startsWith("ppt/"))) extMimes("pptx")
      else "application/zip"
    } catch { case _: Exception => "application/zip" }

  /** `_looks_like_text`: valid UTF-8 with >= 90% printable/space chars in
    * the first 8 KiB. */
  def looksLikeText(content: Array[Byte], sampleSize: Int = 8192): Boolean = {
    if (content == null || content.isEmpty) return true
    val sample = content.take(sampleSize)
    val decoded =
      try {
        val dec = StandardCharsets.UTF_8.newDecoder()
        dec.decode(java.nio.ByteBuffer.wrap(sample)).toString
      } catch { case _: Exception => return false }
    if (decoded.isEmpty) return true
    val printable = decoded.count(ch => !ch.isControl || ch.isWhitespace)
    printable.toDouble / decoded.length >= 0.9
  }

  /** `detect_content_type`: sniff → cleaned hint → extension → text
    * heuristic → octet-stream. */
  def detect(content: Option[Array[Byte]], filename: Option[String],
             contentTypeHint: Option[String]): String = {
    val hint = contentTypeHint
      .map(_.split(";", 2)(0).trim.toLowerCase)
      .filter(h => h.nonEmpty && !genericTypes(h))
    content.filter(_.nonEmpty).flatMap(sniffMagic)
      .orElse(hint)
      .orElse(filename.flatMap { f =>
        val i = f.lastIndexOf('.')
        if (i >= 0 && i < f.length - 1) extMimes.get(f.substring(i + 1).toLowerCase)
        else None
      })
      .orElse(content.filter(looksLikeText(_)).map(_ => "text/plain"))
      .getOrElse("application/octet-stream")
  }

  /** `is_colpali_native_format`. */
  def isColpaliNative(mime: Option[String]): Boolean =
    mime.exists(m => m.startsWith("image/") || colpaliNativeMimeTypes(m))

  /** `_strip_xml_tags`: drop tags, collapse whitespace, unescape the
    * common entities (named five + numeric). */
  def stripXmlTags(text: String): String = {
    val noTags = text.replaceAll("<[^>]+>", " ")
    val collapsed = noTags.replaceAll("\\s+", " ").trim
    val numeric = "&#(x?)([0-9a-fA-F]+);".r
    val unescapedNums = numeric.replaceAllIn(collapsed, m => {
      val code = if (m.group(1).nonEmpty) Integer.parseInt(m.group(2), 16)
      else Integer.parseInt(m.group(2))
      java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(code)))
    })
    unescapedNums
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&apos;", "'")
      .replace("&amp;", "&") // last, so &amp;lt; decodes to &lt; not <
  }

  /** `_normalize_text_filename`, deterministic: the caller supplies the
    * unique id (the reference draws uuid4 — serving-side nondeterminism
    * kept out of the engine). */
  def normalizeTextFilename(filename: Option[String], content: String,
                            idHex: String): String = {
    def needsHtml: Boolean = {
      val head = content.dropWhile(_.isWhitespace).toLowerCase
      head.startsWith("<!doctype html") || head.contains("<html")
    }
    filename.map(_.trim).filter(_.nonEmpty) match {
      case None => s"document_text_$idHex${if (needsHtml) ".html" else ".txt"}"
      case Some(f) =>
        val i = f.lastIndexOf('.')
        if (i > 0 && i < f.length - 1) f
        else s"$f${if (needsHtml) ".html" else ".txt"}"
    }
  }

  /** `_build_storage_key`: ingest_uploads/<id>/<safe name>, with a sniffed
    * extension appended when the name carries none. */
  def buildStorageKey(filename: Option[String], content: Array[Byte],
                      idHex: String): (String, String) = {
    val safe0 = filename.map(f => f.split("[/\\\\]").last).filter(_.nonEmpty)
      .getOrElse("uploaded_file")
    val hasExt = { val i = safe0.lastIndexOf('.'); i > 0 && i < safe0.length - 1 }
    val mimeToExt = Map(
      "application/pdf" -> ".pdf", "image/png" -> ".png",
      "image/jpeg" -> ".jpg", "image/gif" -> ".gif", "image/bmp" -> ".bmp",
      extMimes("docx") -> ".docx", extMimes("xlsx") -> ".xlsx",
      extMimes("pptx") -> ".pptx", "application/zip" -> ".zip")
    val detectedExt =
      if (hasExt) None
      else sniffMagic(content).flatMap(mimeToExt.get)
    val safe = detectedExt.map(safe0 + _).getOrElse(safe0)
    (s"ingest_uploads/$idHex/$safe", safe)
  }
}
