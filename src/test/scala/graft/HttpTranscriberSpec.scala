package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HttpTranscriber

/** The STT wire client against a local AssemblyAI-shaped stub server:
  * upload → job submit → queued/processing poll → completed utterances
  * (and the error/timeout paths). The deterministic-seat semantics around
  * the transcriber (transcriptChunks explode, as-of composition) are gated
  * by the m4 oracle and EndToEndSpec. */
class HttpTranscriberSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  // per-job poll countdown: jobs complete on the 3rd poll to prove the
  // client actually loops through queued/processing states
  private val polls = new ConcurrentHashMap[String, AtomicInteger]()
  private val jobAudio = new ConcurrentHashMap[String, String]()
  private val uploads = new ConcurrentHashMap[String, Array[Byte]]()
  private val nextId = new AtomicInteger(0)

  private def respond(ex: HttpExchange, code: Int, resp: String): Unit = {
    val bytes = resp.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/stt/upload", (ex: HttpExchange) => {
      val bytes = ex.getRequestBody.readAllBytes()
      val key = s"mem://${nextId.incrementAndGet()}"
      uploads.put(key, bytes)
      respond(ex, 200, s"""{"upload_url":"$key"}""")
    })
    server.createContext("/stt/transcript", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      if (ex.getRequestMethod == "POST") {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val url = """"audio_url"\s*:\s*"([^"]+)"""".r
          .findFirstMatchIn(body).get.group(1)
        val id = s"job${nextId.incrementAndGet()}"
        polls.put(id, new AtomicInteger(0))
        jobAudio.put(id, url)
        respond(ex, 200, s"""{"id":"$id"}""")
      } else {
        val id = path.substring(path.lastIndexOf('/') + 1)
        val audio = new String(uploads.get(jobAudio.get(id)), StandardCharsets.UTF_8)
        if (audio == "broken")
          respond(ex, 200, """{"status":"error","error":"unsupported codec"}""")
        else polls.get(id).incrementAndGet() match {
          case 1 => respond(ex, 200, """{"status":"queued"}""")
          case 2 => respond(ex, 200, """{"status":"processing"}""")
          case _ =>
            // utterances derived from the uploaded bytes: one per word,
            // 1500ms apart — proves bytes round-trip through upload
            val words = audio.split(" ").zipWithIndex.map { case (w, i) =>
              s"""{"start":${i * 1500},"text":"$w"}"""
            }
            respond(ex, 200,
              s"""{"status":"completed","utterances":[${words.mkString(",")}]}""")
        }
      }
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}/stt"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  test("upload -> submit -> poll through queued/processing -> timestamped utterances") {
    val t = HttpTranscriber(base, pollIntervalMs = 10)
    val segs = t.transcribe("hello spark world".getBytes(StandardCharsets.UTF_8))
    assert(segs.map(s => (s.startSec, s.text)) ==
      Seq((0.0, "hello"), (1.5, "spark"), (3.0, "world")))
  }

  test("a failed transcript job raises with the service error, not empty output") {
    val t = HttpTranscriber(base, pollIntervalMs = 10)
    val e = intercept[RuntimeException](
      t.transcribe("broken".getBytes(StandardCharsets.UTF_8)))
    assert(e.getMessage.contains("unsupported codec"))
  }

  test("polling past maxPollMs times out instead of hanging the task") {
    // maxPollMs=0: the first non-terminal poll (a fresh job answers
    // "queued") is already past the deadline — deterministic timeout
    val t = HttpTranscriber(base, pollIntervalMs = 5, maxPollMs = 0)
    val e = intercept[RuntimeException](
      t.transcribe("a b c".getBytes(StandardCharsets.UTF_8)))
    assert(e.getMessage.contains("timed out"))
  }
}
