package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.Base64
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** REAL image normalization (S9, `ingestion_service.py:1491-1522`) on pure
  * JDK ImageIO — no native codecs needed for PNG/JPEG/BMP/GIF/WBMP:
  * decode → if width > 256 resize to (256, trunc(h·256/w)) → RGB →
  * JPEG quality 0.70 → `data:image/jpeg;base64,...` URI. Failures fall
  * back to the original bytes base64'd under the original MIME, exactly
  * like the reference's exception path (`:1512-1522`).
  *
  * Audio/video decoding genuinely needs native libraries the container
  * lacks, so [[Multimodal.StubCodec]] remains the stand-in for those
  * kinds; images are fully real from here on.
  */
object ImageCodec {

  System.setProperty("java.awt.headless", "true")
  // ImageIO's DEFAULT stream cache is a temp FILE per read/write — at
  // millions of frames per executor that is one disk round-trip per image
  // and a measured order-of-magnitude drag on the decode-heavy operators
  // (m9's 2M-frame x64 probe surfaced it). All our sources are in-memory
  // byte arrays; cache in memory. JVM-global, set once at class load.
  ImageIO.setUseCache(false)

  case class Normalized(dataUri: String, width: Int, height: Int,
                        resized: Boolean, decoded: Boolean)

  /** PIL-faithful single-image path; None only if even the fallback could
    * not be produced (never, in practice). */
  def normalize(bytes: Array[Byte], mime: String = "application/octet-stream",
                maxWidth: Int = 256): Normalized =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) fallback(bytes, mime)
      else {
        val (w0, h0) = (img.getWidth, img.getHeight)
        val (tw, th, resized) =
          if (w0 > maxWidth) {
            val ratio = maxWidth.toDouble / w0
            (maxWidth, math.max(1, (h0 * ratio).toInt), true)
          } else (w0, h0, false)
        val rgb = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
        val g = rgb.createGraphics()
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, tw, th, null)
        g.dispose()
        Normalized(jpegDataUri(rgb, 0.70f), tw, th, resized, decoded = true)
      }
    } catch { case _: Exception => fallback(bytes, mime) }

  /** `_is_blank_image` (`ingestion_service.py:1396-1403`): grayscale via
    * PIL's "L" luma — the EXACT fixed-point integer form PIL's convert.c
    * uses, `(R·19595 + G·38470 + B·7471) >> 16` (ITU-R 601-2 weights in
    * 16.16, truncating) — blank iff `lightest - darkest <= tolerance`.
    * A zero-pixel image (PIL getextrema → None) is blank. Early-exits the
    * pixel walk the moment the spread exceeds the tolerance — on real page
    * renders (mostly non-blank) this touches a handful of pixels, not W×H. */
  def isBlank(img: BufferedImage, tolerance: Int = 2): Boolean = {
    val (w, h) = (img.getWidth, img.getHeight)
    if (w == 0 || h == 0) return true
    var min = 255; var max = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val l = (((rgb >> 16) & 0xff) * 19595 + ((rgb >> 8) & 0xff) * 38470 +
          (rgb & 0xff) * 7471) >> 16
        if (l < min) min = l
        if (l > max) max = l
        if (max - min > tolerance) return false
        x += 1
      }
      y += 1
    }
    true
  }

  /** `_is_blank_image_bytes` (`ingestion_service.py:1405-1414`): empty
    * bytes are blank; bytes that fail to decode are NOT blank (the
    * reference warns and keeps the page rather than silently dropping
    * content it could not inspect). */
  def isBlankBytes(bytes: Array[Byte], tolerance: Int = 2): Boolean = {
    if (bytes == null || bytes.isEmpty) return true
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) false else isBlank(img, tolerance)
    } catch { case _: Exception => false }
  }

  /** Difference hash (dHash) — the standard perceptual fingerprint for
    * image near-dup detection at corpus scale (the LAION-style dedup pass;
    * pHash-family, Krawetz 2013): grayscale the image, downsample to 9×8 by
    * integer AREA AVERAGE (deterministic: no filter kernels, no float
    * accumulation — sums of integer luma over exact pixel boxes), then one
    * bit per horizontally-adjacent pair, set iff the right cell is
    * BRIGHTER. 64 bits; near-duplicates land within a few bits of Hamming
    * distance regardless of re-encode, resize, or mild brightness shifts.
    * Luma is the same ITU-R 601-2 16.16 fixed point as [[isBlank]]. A 9×8
    * input hashes its own pixels (identity downsample) — what pins the m5
    * oracle. None for undecodable/empty-dimension bytes. */
  def dHash(bytes: Array[Byte]): Option[Long] = {
    val img =
      if (bytes == null || bytes.isEmpty) null
      else
        try ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) return None
    val cell = lumaCells(img, cols = 9, rows = 8)
    var hash = 0L
    var k = 0
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (cell(cy * 9 + cx + 1) > cell(cy * 9 + cx)) hash |= 1L << k
        k += 1
        cx += 1
      }
      cy += 1
    }
    Some(hash)
  }

  /** Integer area-average luma downsample to a `cols`×`rows` grid,
    * row-major — the dHash kernel's arithmetic, exposed for the
    * patch-shaped image embedders (a CI stand-in derives one vector per
    * grid cell). Cell (cx, cy) averages the pixel box
    * [cx·w/cols, (cx+1)·w/cols) × [cy·h/rows, (cy+1)·h/rows); luma is the
    * ITU-R 601-2 16.16 fixed point shared with [[isBlank]]/[[dHash]] —
    * all integer, so the grid is bit-deterministic across JVMs. */
  def lumaCells(img: BufferedImage, cols: Int, rows: Int): Array[Long] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val cell = new Array[Long](rows * cols)
    var cy = 0
    while (cy < rows) {
      var cx = 0
      while (cx < cols) {
        val x0 = cx * w / cols; val x1 = math.max((cx + 1) * w / cols, x0 + 1)
        val y0 = cy * h / rows; val y1 = math.max((cy + 1) * h / rows, y0 + 1)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 19595 + ((rgb >> 8) & 0xff) * 38470 +
              (rgb & 0xff) * 7471) >> 16
            x += 1
          }
          y += 1
        }
        cell(cy * cols + cx) = sum / ((x1 - x0).toLong * (y1 - y0))
        cx += 1
      }
      cy += 1
    }
    cell
  }

  /** 256-bin luma histogram from raw encoded bytes (the same ITU-R 601-2
    * 16.16 fixed-point luma as [[dHash]]/[[isBlank]] — on grayscale
    * pixels it is the pixel value exactly); None when undecodable. One
    * pixel pass, all integer. */
  def lumaHistogram(bytes: Array[Byte]): Option[Array[Long]] = {
    val img =
      if (bytes == null || bytes.isEmpty) null
      else
        try ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) return None
    val h = new Array[Long](256)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val l = (((rgb >> 16) & 0xff) * 19595 + ((rgb >> 8) & 0xff) * 38470 +
          (rgb & 0xff) * 7471) >> 16
        h(l) += 1L
        x += 1
      }
      y += 1
    }
    Some(h)
  }

  /** [[lumaCells]] from raw encoded bytes; None when undecodable. */
  def lumaGrid(bytes: Array[Byte], cols: Int, rows: Int): Option[Array[Long]] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) None
    else Some(lumaCells(img, cols, rows))
  }

  private def fallback(bytes: Array[Byte], mime: String): Normalized =
    Normalized(s"data:$mime;base64," + Base64.getEncoder.encodeToString(bytes),
      -1, -1, resized = false, decoded = false)

  private def jpegDataUri(img: BufferedImage, quality: Float): String = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    "data:image/jpeg;base64," + Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  /** Distributed form: adds (data_uri, img_width, img_height, img_resized,
    * img_decoded) from a binary column via mapPartitions. */
  def normalizeColumn(df: DataFrame, bytesCol: String, mimeCol: String,
                      maxWidth: Int = 256): DataFrame = {
    val schema = df.schema
      .add("data_uri", StringType).add("img_width", IntegerType)
      .add("img_height", IntegerType).add("img_resized", BooleanType)
      .add("img_decoded", BooleanType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val bIdx = df.schema.fieldIndex(bytesCol)
    val mIdx = df.schema.fieldIndex(mimeCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val n = normalize(r.getAs[Array[Byte]](bIdx), r.getString(mIdx), maxWidth)
        Row.fromSeq(r.toSeq ++ Seq(n.dataUri, n.width, n.height, n.resized, n.decoded))
      }
    }(enc)
  }

  /** Distributed blank-page gate — the ColPali ingest chain's
    * pre-embedding filter (`ingestion_service.py:1435-1437,1617,1677`:
    * every rendered page is blank-checked before it reaches the embedder;
    * a blank page would waste a GPU batch slot AND plant a junk vector in
    * the index). Adds `is_blank` from a binary column. */
  def flagBlankColumn(df: DataFrame, bytesCol: String, tolerance: Int = 2): DataFrame = {
    val schema = df.schema.add("is_blank", BooleanType, nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ isBlankBytes(r.getAs[Array[Byte]](bIdx), tolerance))
      }
    }(enc)
  }

  /** Drop-the-blanks form for the S10/S11 page-image chunk path. */
  def dropBlankPages(df: DataFrame, bytesCol: String, tolerance: Int = 2): DataFrame = {
    import org.apache.spark.sql.functions.col
    flagBlankColumn(df, bytesCol, tolerance).filter(!col("is_blank")).drop("is_blank")
  }
}
