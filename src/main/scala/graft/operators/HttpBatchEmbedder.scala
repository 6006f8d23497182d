package graft.operators

import java.net.http.HttpClient

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** HTTP-batched embedding client (E1/E2 real-model integration point,
  * `litellm_embedding.py:60-141`): one executor partition streams its rows
  * through `POST endpoint` in `batchSize` groups — 100 for remote providers,
  * 5 for local ones (`_determine_batch_size`, `:136-141`) — with
  * `numRetries` retries on transient failures (`:80`, `num_retries=3`).
  *
  * Wire format is the OpenAI-style embeddings contract LiteLLM speaks:
  * request `{"input": [texts...], "model": "..."}`, response
  * `{"data": [{"embedding": [floats...]}, ...]}` in input order.
  *
  * Failure semantics mirror the reference: a document batch that still
  * fails after retries raises (Spark then retries the task — the analog of
  * the ingestion worker's retry/requeue); the query-side [[embedText]]
  * returns the zero vector (`embed_query`, `:108-111`) so serving degrades
  * instead of erroring.
  *
  * The client is built per partition, NOT serialized with the closure —
  * `HttpClient` holds a connection pool and an executor, neither of which
  * survives a network hop.
  */
case class HttpBatchEmbedder(endpoint: String, dim: Int, model: String = "default",
                             localProvider: Boolean = false, numRetries: Int = 3,
                             timeoutSec: Int = 60) extends Embedder {

  def batchSize: Int = if (localProvider) 5 else 100

  private def requestBody(texts: Seq[String]): String =
    texts.map(t => "\"" + HttpWire.jsonEscape(if (t == null) "" else t) + "\"")
      .mkString(s"""{"model":"${HttpWire.jsonEscape(model)}","input":[""", ",", "]}")

  private def parseResponse(body: String, expected: Int): Seq[Array[Float]] = {
    val data = JsonMethods.parse(body) \ "data" match {
      case JArray(items) => items
      case other => sys.error(s"embedding response missing 'data' array: $other")
    }
    require(data.length == expected,
      s"embedding response has ${data.length} vectors for $expected inputs")
    data.map { item =>
      item \ "embedding" match {
        case JArray(xs) => xs.map {
          case JDouble(d)  => d.toFloat
          case JInt(i)     => i.toFloat
          case JLong(l)    => l.toFloat
          case JDecimal(d) => d.toFloat
          case other       => sys.error(s"non-numeric embedding component: $other")
        }.toArray
        case other => sys.error(s"embedding item missing 'embedding': $other")
      }
    }
  }

  /** One batch round trip with retry; returns vectors in input order. */
  private def embedBatch(client: HttpClient, texts: Seq[String]): Seq[Array[Float]] =
    parseResponse(HttpWire.postWithRetry(client, endpoint, requestBody(texts),
      numRetries, timeoutSec), texts.length)

  private def newClient(): HttpClient = HttpWire.newClient(timeoutSec)

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType), nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    val bs = batchSize
    graft.Tables.scaled(df).mapPartitions { rows =>
      val client = newClient()
      rows.grouped(bs).flatMap { batch =>
        val vecs = embedBatch(client, batch.map(_.getString(idx)))
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(enc)
  }

  override def embedText(s: String): Array[Float] =
    try embedBatch(newClient(), Seq(s)).head
    catch { case _: Exception => new Array[Float](dim) }
}
