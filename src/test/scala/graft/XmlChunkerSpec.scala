package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.XmlChunker

/** S7 contract (mirrors `xml_chunker.py:311-368` assertions): unit-tag
  * profiling, breadcrumbs, prev/next linking, token-bounded splitting. */
class XmlChunkerSpec extends AnyFunSuite {

  val doc =
    """<doc>
      |  <meta><title>T</title></meta>
      |  <body>
      |    <section><p>alpha one</p></section>
      |    <section><p>beta two words</p></section>
      |    <section><p>gamma three</p></section>
      |  </body>
      |</doc>""".stripMargin

  test("picks the repeated unit tag and emits one chunk per unit") {
    val chunks = XmlChunker.chunk(doc)
    assert(chunks.map(_.tag).distinct == Seq("section"))
    assert(chunks.map(_.content) == Seq("alpha one", "beta two words", "gamma three"))
  }

  test("breadcrumbs reflect the ancestor path") {
    val chunks = XmlChunker.chunk(doc)
    assert(chunks.forall(_.breadcrumbs == Seq("doc", "body")))
  }

  test("prev/next links chain in document order") {
    val chunks = XmlChunker.chunk(doc)
    assert(chunks.head.prevId.isEmpty && chunks.last.nextId.isEmpty)
    assert(chunks(1).prevId.contains(chunks(0).xmlId))
    assert(chunks(1).nextId.contains(chunks(2).xmlId))
  }

  test("oversized unit splits token-bounded") {
    val big = s"<r><u>${"w " * 50}</u><u>x</u></r>"
    val chunks = XmlChunker.chunk(big, maxTokens = 10)
    assert(chunks.count(_.content.startsWith("w")) == 5)
    assert(chunks.forall(_.content.split(" ").length <= 10))
  }

  test("malformed xml yields no chunks; single-element doc falls back to root") {
    assert(XmlChunker.chunk("<unclosed>").isEmpty)
    val single = XmlChunker.chunk("<only>hello there</only>")
    assert(single.map(_.content) == Seq("hello there"))
  }

  test("distributed chunkColumn explodes rows with links") {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val df = Seq((1L, doc), (2L, "<a><b>x</b><b>y</b></a>")).toDF("doc_id", "xml")
    val out = XmlChunker.chunkColumn(df, "doc_id", "xml")
    assert(out.filter($"doc_id" === 1L).count() == 3)
    assert(out.filter($"doc_id" === 2L).count() == 2)
    assert(out.columns.contains("prev_id") && out.columns.contains("breadcrumbs"))
  }
}
