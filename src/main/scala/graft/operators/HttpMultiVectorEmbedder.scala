package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** E3/E4 multivector (ColPali-style) embedding contract + HTTP client
  * (`colpali_embedding_model.py:66-218`): one input produces MANY vectors
  * (one per image patch / text token), so the wire shape is
  * `{"data":[{"embedding": [[...],[...]]}]}` — each item an
  * `array<array<float>>`. Batching mirrors the reference's
  * `colpali_store_batch_size=16` (`morphik.toml:134`). */
trait MultiVectorEmbedder extends Serializable {
  def dim: Int
  /** Adds `outCol: array<array<float>>` from `textCol`. */
  def embedMulti(df: DataFrame, textCol: String, outCol: String): DataFrame
  /** Query-side: one multivector for the query text/image. */
  def embedTextMulti(s: String): Array[Array[Float]]
  /** Query-side IMAGE embedding — the `query_image` retrieval arm
    * (`request.py:114-182` `query_image`; `document_service.py:278-296`
    * dispatches image queries to the ColPali model's image path instead
    * of `embed_for_query`). One multivector (one vector per patch) for
    * the raw encoded image bytes. */
  def embedImageMulti(bytes: Array[Byte]): Array[Array[Float]]
}

case class HttpMultiVectorEmbedder(endpoint: String, dim: Int,
                                   model: String = "colpali",
                                   batchSize: Int = 16, numRetries: Int = 3,
                                   timeoutSec: Int = 60)
    extends MultiVectorEmbedder {

  private def requestBody(texts: Seq[String]): String =
    texts.map(t => "\"" + HttpWire.jsonEscape(if (t == null) "" else t) + "\"")
      .mkString(s"""{"model":"${HttpWire.jsonEscape(model)}","input":[""", ",", "]}")

  private def num(v: JValue): Float = v match {
    case JDouble(d)  => d.toFloat
    case JInt(i)     => i.toFloat
    case JLong(l)    => l.toFloat
    case JDecimal(d) => d.toFloat
    case other       => sys.error(s"non-numeric embedding component: $other")
  }

  private def parse(body: String, expected: Int): Seq[Array[Array[Float]]] = {
    val data = JsonMethods.parse(body) \ "data" match {
      case JArray(items) => items
      case other => sys.error(s"embedding response missing 'data': $other")
    }
    require(data.length == expected,
      s"multivector response has ${data.length} items for $expected inputs")
    data.map { item =>
      item \ "embedding" match {
        case JArray(vs) => vs.map {
          case JArray(xs) => xs.map(num).toArray
          case other      => sys.error(s"expected vector array, got: $other")
        }.toArray
        case other => sys.error(s"item missing 'embedding': $other")
      }
    }
  }

  private def embedBatch(client: java.net.http.HttpClient,
                         texts: Seq[String]): Seq[Array[Array[Float]]] =
    parse(HttpWire.postWithRetry(client, endpoint, requestBody(texts),
      numRetries, timeoutSec), texts.length)

  override def embedMulti(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(ArrayType(FloatType)), nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    val bs = batchSize
    graft.Tables.scaled(df).mapPartitions { rows =>
      val client = HttpWire.newClient(timeoutSec)
      rows.grouped(bs).flatMap { batch =>
        val mvs = embedBatch(client, batch.map(_.getString(idx)))
        batch.iterator.zip(mvs.iterator).map { case (r, mv) =>
          Row.fromSeq(r.toSeq :+ mv.map(_.toSeq).toSeq)
        }
      }
    }(enc)
  }

  /** Query side degrades to an empty multivector on failure (the serving
    * analog of embed_query's zero vector). */
  override def embedTextMulti(s: String): Array[Array[Float]] =
    try embedBatch(HttpWire.newClient(timeoutSec), Seq(s)).head
    catch { case _: Exception => Array.empty }

  /** Image query embedding. The reference's image path
    * (`colpali_api_embedding_model.py:286`) posts
    * `{"input_type": "image", "inputs": [<base64>, ...]}` and parses an
    * `.npz` binary back; this engine instead keeps its OWN uniform wire
    * protocol — the text path's OpenAI-style
    * `{"model", "input_type", "input": [...]}` request with a JSON
    * `{"data":[{"embedding": [[...]]}]}` response — so one server shape
    * (and one CI stub) serves both modalities. The payload is the base64
    * of the raw encoded image; same response parse as the text path, same
    * empty-on-failure degradation. */
  override def embedImageMulti(bytes: Array[Byte]): Array[Array[Float]] = {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      if (bytes == null) Array.emptyByteArray else bytes)
    val body =
      s"""{"model":"${HttpWire.jsonEscape(model)}","input_type":"image","input":["$b64"]}"""
    try parse(HttpWire.postWithRetry(HttpWire.newClient(timeoutSec), endpoint,
      body, numRetries, timeoutSec), 1).head
    catch { case _: Exception => Array.empty }
  }
}

/** Deterministic fixture/CI embedder: a fixed query multivector (oracle
  * queries and specs drive the retrieval pipeline with it — the GPU model
  * server is external by design). Column embedding attaches the same
  * literal. */
case class FixedMultiVectorEmbedder(vecs: Seq[Seq[Float]]) extends MultiVectorEmbedder {
  override def dim: Int = vecs.headOption.map(_.length).getOrElse(0)
  override def embedMulti(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, org.apache.spark.sql.functions.typedLit(vecs))
  override def embedTextMulti(s: String): Array[Array[Float]] =
    vecs.map(_.toArray).toArray
  override def embedImageMulti(bytes: Array[Byte]): Array[Array[Float]] =
    vecs.map(_.toArray).toArray
}

/** Token-shaped deterministic stand-in: one `dim`-wide vector PER
  * WHITESPACE TOKEN of the input — the shape contract of the real ColPali
  * model (`colpali_embedding_model.py`: (tokens, 128) per input, more
  * tokens for longer queries), with md5-derived components so every engine
  * and every run agrees. Lets specs port the reference's
  * `test_colpali_embedding.py` shape table without a GPU. */
case class HashMultiVectorEmbedder(dim: Int = 128) extends MultiVectorEmbedder {
  private def tokenVec(tok: String): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Array.tabulate(dim)(i => ((md(i % md.length) & 0xff) - 128) / 128f)
  }
  override def embedTextMulti(s: String): Array[Array[Float]] = {
    val toks = Option(s).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
    // the real model never returns zero vectors for an input: an empty
    // string still carries special tokens, so fall back to one vector
    if (toks.isEmpty) Array(tokenVec("")) else toks.map(tokenVec)
  }
  override def embedMulti(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(ArrayType(FloatType)), nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(
        r.toSeq :+ embedTextMulti(r.getString(idx)).map(_.toSeq).toSeq))
    }(enc)
  }

  /** Image stand-in, patch-shaped like the real model ((patches, dim)
    * per image): REALLY decode the bytes, integer area-average to a 4×4
    * luma grid ([[ImageCodec.lumaCells]] — the dHash kernel), then one
    * md5-derived vector per cell from the token `px:<cell>:<luma>` — so
    * the vectors respond to pixel CONTENT deterministically, the image
    * analog of the per-token text hash above. Undecodable bytes fall
    * back to one vector hashing the raw bytes (never empty, matching the
    * text path's contract). */
  override def embedImageMulti(bytes: Array[Byte]): Array[Array[Float]] =
    ImageCodec.lumaGrid(bytes, cols = 4, rows = 4) match {
      case Some(cells) =>
        cells.zipWithIndex.map { case (l, i) => tokenVec(s"px:$i:$l") }
      case None =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(if (bytes == null) Array.emptyByteArray else bytes)
          .map(b => f"$b%02x").mkString
        Array(tokenVec(s"img:$hex"))
    }
}
