package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Q6 rerank model contract (`flag_reranker.py:30-60`): score (query,
  * passage) pairs, update chunk scores, sort desc. The model stage is an
  * interface so CI stays deterministic while production plugs a
  * cross-encoder. */
trait RerankModel extends Serializable {
  /** Relevance scores for (query, passage_i), in passage order. */
  def scoreBatch(query: String, passages: Seq[String]): Seq[Double]
}

/** Deterministic CI stand-in: |q ∩ p| / |q| token overlap (the same
  * function `Serving.rerank` evaluates as a Column for the oracle path). */
case class TokenOverlapModel() extends RerankModel {
  def scoreBatch(query: String, passages: Seq[String]): Seq[Double] = {
    val q = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
    passages.map { p =>
      if (q.isEmpty) 0.0
      else {
        val toks = Option(p).getOrElse("").toLowerCase
          .split("\\s+").filter(_.nonEmpty).toSet
        q.count(toks.contains).toDouble / q.length
      }
    }
  }
}

/** HTTP cross-encoder client speaking the public rerank wire shape
  * (Cohere/Jina-style): request `{"model","query","documents":[...]}`,
  * response `{"results":[{"index":i,"relevance_score":s}]}`. Retries and
  * per-partition client reuse as in the embedding client. */
case class HttpReranker(endpoint: String, model: String = "reranker",
                        batchSize: Int = 32, numRetries: Int = 3,
                        timeoutSec: Int = 60) extends RerankModel {

  private def requestBody(query: String, passages: Seq[String]): String = {
    val docs = passages.map(p =>
      "\"" + HttpWire.jsonEscape(if (p == null) "" else p) + "\"").mkString(",")
    s"""{"model":"${HttpWire.jsonEscape(model)}","query":"${
      HttpWire.jsonEscape(query)}","documents":[$docs]}"""
  }

  override def scoreBatch(query: String, passages: Seq[String]): Seq[Double] = {
    val client = HttpWire.newClient(timeoutSec)
    passages.grouped(batchSize).flatMap { batch =>
      val body = HttpWire.postWithRetry(client, endpoint,
        requestBody(query, batch), numRetries, timeoutSec)
      val out = new Array[Double](batch.length)
      JsonMethods.parse(body) \ "results" match {
        case JArray(items) =>
          require(items.length == batch.length,
            s"rerank response has ${items.length} scores for ${batch.length} docs")
          items.foreach { item =>
            val idx = item \ "index" match {
              case JInt(i) => i.toInt; case JLong(l) => l.toInt
              case other   => sys.error(s"bad rerank index: $other")
            }
            val score = item \ "relevance_score" match {
              case JDouble(d) => d; case JInt(i) => i.toDouble
              case JLong(l)   => l.toDouble; case JDecimal(d) => d.toDouble
              case other      => sys.error(s"bad relevance_score: $other")
            }
            out(idx) = score
          }
        case other => sys.error(s"rerank response missing 'results': $other")
      }
      out
    }.toSeq
  }
}

object ModelRerank {
  /** Distributed model rerank: score passages per partition in batches,
    * then global top-k by (score desc, id asc) — the Spark form of
    * `FlagReranker.rerank`. The sort is on (double, id) pairs only; the
    * passage text never enters the ordering exchange. */
  def rerank(candidates: DataFrame, idCol: String, passageCol: String,
             queryText: String, k: Int, model: RerankModel): DataFrame = {
    import org.apache.spark.sql.functions.col
    val schema = candidates.schema.add("rerank_score", DoubleType, nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val pIdx = candidates.schema.fieldIndex(passageCol)
    val scored = candidates.mapPartitions { rows =>
      val buf = rows.toVector
      if (buf.isEmpty) Iterator.empty
      else {
        val scores = model.scoreBatch(queryText, buf.map(_.getString(pIdx)))
        buf.iterator.zip(scores.iterator).map { case (r, s) =>
          Row.fromSeq(r.toSeq :+ s)
        }
      }
    }(enc)
    scored.orderBy(col("rerank_score").desc, col(idCol).asc).limit(k)
  }
}
