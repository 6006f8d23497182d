package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Shared plumbing for the HTTP model clients (embedding single/multi
  * vector, rerank): JSON string escaping, client construction, and the
  * retry-with-backoff POST the reference applies to every provider call
  * (`litellm_embedding.py:80` num_retries). Kept deliberately tiny — the
  * wire formats live with their operators. */
private[operators] object HttpWire {

  def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def newClient(timeoutSec: Int): HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(timeoutSec)).build()

  /** POST json, retrying transient failures; throws after `numRetries`. */
  def postWithRetry(client: HttpClient, endpoint: String, body: String,
                    numRetries: Int, timeoutSec: Int): String = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofSeconds(timeoutSec))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= numRetries) {
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 == 2) return resp.body()
        lastErr = new RuntimeException(s"model endpoint HTTP ${resp.statusCode()}")
      } catch { case e: Exception => lastErr = e }
      attempt += 1
      if (attempt <= numRetries) Thread.sleep(math.min(1000L << (attempt - 1), 4000L))
    }
    throw new RuntimeException(s"model call failed after $numRetries retries", lastErr)
  }
}
