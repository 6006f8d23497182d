package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.Base64
import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ImageCodec

/** Real-image S9 path: PNG in, resized JPEG-q70 data URI out, PIL-faithful
  * geometry, fallback on undecodable bytes, distributed form. */
class ImageCodecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic gradient PNG. */
  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 7) % 256 << 16) | ((y * 13) % 256 << 8) | ((x + y) % 256))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def decodeJpeg(uri: String): BufferedImage = {
    assert(uri.startsWith("data:image/jpeg;base64,"))
    ImageIO.read(new ByteArrayInputStream(
      Base64.getDecoder.decode(uri.stripPrefix("data:image/jpeg;base64,"))))
  }

  test("wide image resizes to 256px with truncated PIL-style height") {
    val n = ImageCodec.normalize(png(512, 300), "image/png")
    assert(n.decoded && n.resized)
    assert(n.width == 256 && n.height == 150) // int(300 * 256/512)
    val out = decodeJpeg(n.dataUri)
    assert(out.getWidth == 256 && out.getHeight == 150)
  }

  test("narrow image is re-encoded but not resized") {
    val n = ImageCodec.normalize(png(100, 40), "image/png")
    assert(n.decoded && !n.resized && n.width == 100 && n.height == 40)
    val out = decodeJpeg(n.dataUri)
    assert(out.getWidth == 100 && out.getHeight == 40)
  }

  test("undecodable bytes fall back to original-bytes data URI") {
    val junk = Array[Byte](1, 2, 3, 4)
    val n = ImageCodec.normalize(junk, "image/heic")
    assert(!n.decoded && n.dataUri ==
      "data:image/heic;base64," + Base64.getEncoder.encodeToString(junk))
  }

  /** Flat PNG with one pixel raised by `spread` luma steps. */
  private def flatPng(base: Int, spread: Int, w: Int = 6, h: Int = 6): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val v = if (x == 0 && y == 0) base + spread else base
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("isBlank: uniform and within-tolerance images are blank, spread 3 is not") {
    assert(ImageCodec.isBlankBytes(flatPng(200, 0)))
    assert(ImageCodec.isBlankBytes(flatPng(200, 2)))   // exactly at tolerance
    assert(!ImageCodec.isBlankBytes(flatPng(200, 3)))  // one past tolerance
    assert(ImageCodec.isBlankBytes(flatPng(200, 3), tolerance = 5))
  }

  test("isBlank: luma uses PIL's 16.16 ITU-R 601-2 weights, not channel extrema") {
    // R=10,G=0,B=0 vs R=0,G=0,B=26: channel spreads are large but the
    // lumas are (10*19595)>>16 = 2 and (26*7471)>>16 = 2 → blank
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 10 << 16)
    img.setRGB(1, 0, 26)
    assert(ImageCodec.isBlank(img))
    // G=6 alone → luma (6*38470)>>16 = 3 vs 0 → spread 3 → not blank
    val img2 = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img2.setRGB(0, 0, 0)
    img2.setRGB(1, 0, 6 << 8)
    assert(!ImageCodec.isBlank(img2))
  }

  test("isBlankBytes: empty bytes blank; undecodable bytes kept (not blank)") {
    assert(ImageCodec.isBlankBytes(Array.emptyByteArray))
    assert(ImageCodec.isBlankBytes(null))
    assert(!ImageCodec.isBlankBytes(Array[Byte](9, 9, 9, 9)))
  }

  test("dropBlankPages removes blank renders and keeps uninspectable ones") {
    import spark.implicits._
    val df = Seq(
      (1L, flatPng(128, 0)),            // blank
      (2L, flatPng(128, 4)),            // content
      (3L, Array.emptyByteArray),       // empty render → blank
      (4L, Array[Byte](7, 7, 7)))       // undecodable → kept
      .toDF("page_id", "png")
    val kept = ImageCodec.dropBlankPages(df, "png")
      .select("page_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 4L))
  }

  /** 9x8 grayscale staircase encoding `bits` in horizontal comparisons —
    * the m5 fixture construction, scaled by `scale` to exercise the
    * area-average downsample. */
  private def staircase(bits: Long, scale: Int = 1): Array[Byte] = {
    val img = new BufferedImage(9 * scale, 8 * scale, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8) {
      var v = 128
      val vals = Array.tabulate(9) { x =>
        if (x > 0) v += (if (((bits >> (y * 8 + (x - 1))) & 1L) == 1L) 10 else -10)
        v
      }
      for (x <- 0 until 9; sy <- 0 until scale; sx <- 0 until scale)
        img.setRGB(x * scale + sx, y * scale + sy,
          (vals(x) << 16) | (vals(x) << 8) | vals(x))
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash recovers the encoded bit pattern from real PNG round trip") {
    val bits = 0x0badf00ddeadbeeL // 60-bit pattern
    assert(ImageCodec.dHash(staircase(bits)) == Some(bits))
    assert(ImageCodec.dHash(staircase(0L)) == Some(0L))
  }

  test("dHash is downsample-invariant: a 4x-scaled image hashes identically") {
    val bits = 0x123456789abcdefL
    assert(ImageCodec.dHash(staircase(bits, scale = 4)) ==
      ImageCodec.dHash(staircase(bits)))
  }

  test("dHash: undecodable or empty bytes hash to None") {
    assert(ImageCodec.dHash(Array.emptyByteArray).isEmpty)
    assert(ImageCodec.dHash("not an image".getBytes).isEmpty)
    assert(ImageCodec.dHash(null).isEmpty)
  }

  test("normalizeColumn runs the codec per partition over binary columns") {
    import spark.implicits._
    val df = Seq(
      (1L, "image/png", png(512, 300)),
      (2L, "image/png", png(64, 64)),
      (3L, "image/webp", Array[Byte](0, 1, 2)))
      .toDF("id", "mime", "bytes")
    val out = ImageCodec.normalizeColumn(df, "bytes", "mime")
      .select("id", "img_width", "img_height", "img_resized", "img_decoded")
      .as[(Long, Int, Int, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 256, 150, true, true),
      (2L, 64, 64, false, true),
      (3L, -1, -1, false, false)))
  }

  test("imageEntropy: two-tone reads exactly ln 2; flat fill reads 0 and " +
    "low_info; junk drops; the float chain replays independently") {
    import spark.implicits._
    def gray(vs: Seq[Int], w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < w * h) {
        val v = vs(i % vs.size)
        img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v); i += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos); bos.toByteArray
    }
    val rows = Seq(
      (1L, gray(Seq(0, 200), 8, 8)),   // 32/32 two-tone: H = ln 2
      (2L, gray(Seq(77), 8, 8)),       // flat: H = 0
      (3L, "junk".getBytes("UTF-8"))
    ).toDF("id", "bytes")
    val out = graft.operators.Multimodal
      .imageEntropy(rows, "id", "bytes")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L), "junk contributes no rows")
    // independent replay of the stated chain: two equal 32·ln32 terms
    val s = { val t = 32.0 * StrictMath.log(32.0); t + t }
    val expect = math.floor(
      (StrictMath.log(64.0) - s / 64.0) * 1e6).toLong
    assert(out(1L) == ((1L, 64L, 2L, expect, true)) && expect == 693147L,
      "two-tone: exactly ln 2 nats, under the 2.0 threshold")
    assert(out(2L) == ((2L, 64L, 1L, 0L, true)), "flat fill: zero entropy")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Multimodal.imageEntropy(rows, "id", "bytes",
        lowInfoMicro = -1L)
    }
    assert(e.getMessage.contains("lowInfoMicro >= 0"))
  }
}
