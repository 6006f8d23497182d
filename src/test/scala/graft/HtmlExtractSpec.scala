package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HtmlExtract

/** Real-HTML behavior of the jusText-lite extractor: tag-case
  * insensitivity, script/style/comment removal, entity decode order,
  * anchor-attribute handling, link-density and length classification,
  * main-text reassembly in block order. */
class HtmlExtractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("html-extract-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  import spark.implicits._

  private val page =
    """<HTML><head><STYLE>body { color: red }</STYLE>
      |<script type="text/javascript">var nav = ["a","b"];</script></head>
      |<BODY><!-- header comment -->
      |<h1>The Article Title Goes Here</h1>
      |<DIV id="nav"><a href="/">Home</a> <A HREF="/about">About us</A> <a href="/more">More links here</a></DIV>
      |<p>This paragraph carries the real article body text and easily clears the length bar.</p>
      |<p>Ampersand &amp; angle &lt;brackets&gt; and &quot;quotes&quot; decode; &amp;lt; stays literal.</p>
      |<li>crumb</li>
      |<p>A second real paragraph with an inline <a href="#x">reference link</a> inside much longer prose.</p>
      |</BODY></HTML>""".stripMargin

  test("blocks: classification, entity decode, script/style/comment removal") {
    val df = Seq((1L, page)).toDF("doc_id", "html")
    val out = HtmlExtract.blocks(df, "doc_id", "html")
      .orderBy("pos")
      .select("btext", "n_chars", "link_chars", "is_boiler")
      .collect()
    val texts = out.map(_.getString(0))
    assert(!texts.exists(_.contains("color: red")), "style must be stripped")
    assert(!texts.exists(_.contains("var nav")), "script must be stripped")
    assert(!texts.exists(_.contains("header comment")), "comments must be stripped")
    // title block: real text, no links, long enough
    val title = out.find(_.getString(0) == "The Article Title Goes Here").get
    assert(!title.getBoolean(3))
    // nav div: all-anchor text → link density 100% → boilerplate
    val nav = out.find(_.getString(0).startsWith("Home")).get
    assert(nav.getLong(2) == nav.getLong(1), "nav text is all anchor text")
    assert(nav.getBoolean(3))
    // entity decode: &amp; → &, &lt; → <, &quot; → ", &amp;lt; → &lt;
    val ent = out.find(_.getString(0).startsWith("Ampersand")).get
    assert(ent.getString(0) ==
      "Ampersand & angle <brackets> and \"quotes\" decode; &lt; stays literal.")
    // short crumb → boilerplate by length
    val crumb = out.find(_.getString(0) == "crumb").get
    assert(crumb.getBoolean(3))
    // inline link inside long prose → low density → main
    val inline = out.find(_.getString(0).startsWith("A second real")).get
    assert(inline.getLong(2) == "reference link".length)
    assert(!inline.getBoolean(3))
  }

  test("mainText: non-boilerplate blocks reassemble in block order") {
    val df = Seq((1L, page)).toDF("doc_id", "html")
    val r = HtmlExtract.mainText(df, "doc_id", "html").head()
    val main = r.getAs[String]("main_text")
    val lines = main.split("\n")
    assert(lines.head == "The Article Title Goes Here")
    assert(lines.exists(_.startsWith("This paragraph carries")))
    assert(lines.last.startsWith("A second real paragraph"))
    assert(!main.contains("Home"), "nav must not reach the main text")
    assert(!main.contains("crumb"))
    assert(r.getAs[Long]("n_main") == lines.length)
    assert(r.getAs[Long]("n_blocks") ==
      r.getAs[Long]("n_main") + r.getAs[Long]("n_boiler"))
  }

  test("scalar twin == Column pipeline; DocParser routes .html through it") {
    val df = Seq((1L, page)).toDF("doc_id", "html")
    val columnMain = HtmlExtract.mainText(df, "doc_id", "html")
      .head().getAs[String]("main_text")
    assert(HtmlExtract.mainTextString(page) == columnMain,
      "the per-row parser path and the Column pipeline must not drift")
    val viaParser = graft.operators.DocParser.parse("page.html",
      page.getBytes("UTF-8"))
    assert(viaParser == columnMain)
    assert(viaParser.contains("The Article Title Goes Here") &&
      !viaParser.contains("Home"))
  }
}
