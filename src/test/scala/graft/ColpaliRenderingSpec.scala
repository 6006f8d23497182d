package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{HashMultiVectorEmbedder, Multimodal}

/** Port of the reference's ColPali rendering + embedding unit tables
  * (`core/tests/unit/test_ingestion_colpali_rendering.py`,
  * `test_colpali_embedding.py`): the page-image chunk flow must skip pages
  * that fail to render AND pages that render blank — never failing the
  * document — and the multivector embedding contract is (tokens × dim)
  * per input with dim fixed and token count varying with input length. */
class ColpaliRenderingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._
  import ColpaliRenderingSpec.FakeRenderer

  test("pageImageChunks skips failed and blank pages, keeps the rest") {
    val docs = Seq((7L, "doc".getBytes)).toDF("doc_id", "bytes")
    val out = Multimodal.pageImageChunks(docs, "doc_id", "bytes", FakeRenderer)
      .as[(Long, Int, Int, String, Boolean)].collect().sortBy(_._2).toSeq
    assert(out.map(c => (c._2, c._3)) == Seq((0, 0), (1, 3)),
      "chunk numbers dense over survivors; original page indices kept")
    assert(out.forall(_._4.startsWith("data:image/jpeg;base64,")))
    assert(out.forall(_._5), "every page chunk is flagged is_image")
  }

  test("a document whose page count fails contributes zero pages, not an error") {
    val docs = Seq((1L, Array.emptyByteArray), (2L, "ok".getBytes))
      .toDF("doc_id", "bytes")
    val out = Multimodal.pageImageChunks(docs, "doc_id", "bytes", FakeRenderer)
      .select("doc_id").as[Long].collect().toSeq
    assert(!out.contains(1L) && out.count(_ == 2L) == 2)
  }

  // `test_colpali_embedding.py` shape table, against the deterministic
  // token-shaped stand-in (the GPU model is external by design).
  private val model = HashMultiVectorEmbedder(dim = 128)

  test("embed_for_query: (tokens x 128), float32, shape varies with length") {
    val short = model.embedTextMulti("Find images similar to this concept")
    val long = model.embedTextMulti(
      "Find images that contain diagrams of electronic circuits with resistors and capacitors")
    assert(short.forall(_.length == 128) && long.forall(_.length == 128))
    assert(short.length == 6 && long.length == 12,
      "token count tracks query length")
    assert(model.embedTextMulti("x").head.forall(v => v >= -1f && v < 1f))
  }

  test("embed_for_ingestion: one multivector per chunk, empty input non-empty") {
    val chunks = Seq((0L, "alpha beta"), (1L, "gamma"), (2L, ""))
      .toDF("id", "content")
    val out = model.embedMulti(chunks, "content", "mv")
      .select("id", "mv").as[(Long, Seq[Seq[Float]])].collect().toMap
    assert(out.size == 3)
    assert(out(0L).length == 2 && out(1L).length == 1)
    assert(out(2L).length == 1, "empty content still embeds (special tokens)")
    assert(out.values.forall(_.forall(_.length == 128)))
  }

  test("embedding is deterministic across calls and engines (md5-derived)") {
    val a = model.embedTextMulti("alpha beta").map(_.toSeq).toSeq
    val b = model.embedTextMulti("alpha beta").map(_.toSeq).toSeq
    assert(a == b)
    assert(a.head != a(1), "distinct tokens get distinct vectors")
  }
}

object ColpaliRenderingSpec {
  private def png(color: Int): Array[Byte] = {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if ((x + y) % 2 == 0) color else color ^ 0x404040)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  private def blankPng(): Array[Byte] = {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0xffffff)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // `test_render_pdf_with_pymupdf_skips_blank_and_failed_pages`: pages =
  // [good, failing, blank, good] -> exactly the two good pages survive.
  object FakeRenderer extends Multimodal.PageRenderer {
    def pageCount(doc: Array[Byte]): Int =
      if (doc.isEmpty) throw new RuntimeException("cannot open") else 4
    def render(doc: Array[Byte], page: Int): Array[Byte] = page match {
      case 0 => png(0x2040c0)
      case 1 => throw new RuntimeException("bad embedded image")
      case 2 => blankPng()
      case 3 => png(0x80ff20)
      case _ => throw new IllegalArgumentException(s"page $page")
    }
  }
}
