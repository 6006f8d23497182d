package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HttpBatchEmbedder

/** HttpBatchEmbedder against a local OpenAI-wire-format stub server:
  * batching (5-per-request for local providers), order preservation,
  * retry-on-500, zero-vector query fallback, and end-to-end retrieveChunks
  * with a non-Hash embedder (the contract the serving planner needs). */
class HttpBatchEmbedderSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val Dim = 8

  /** Deterministic stand-in model: md5-byte embedding (shared by server and
    * assertions). */
  def fakeVec(text: String): Array[Float] = {
    val h = MessageDigest.getInstance("MD5")
      .digest(text.getBytes(StandardCharsets.UTF_8))
    Array.tabulate(Dim)(i => (h(i) & 0xff).toFloat / 255f)
  }

  private var server: HttpServer = _
  private var port: Int = _
  val requestCount = new AtomicInteger(0)
  val maxBatchSeen = new AtomicInteger(0)
  val failFirstN = new AtomicInteger(0)

  /** Minimal JSON plumbing: extract the "input" string array, emit the
    * OpenAI-shaped data/embedding response. */
  private def handle(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    requestCount.incrementAndGet()
    if (failFirstN.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      ex.sendResponseHeaders(500, -1); ex.close(); return
    }
    import org.json4s._
    val texts = (org.json4s.jackson.JsonMethods.parse(body) \ "input") match {
      case JArray(xs) => xs.map { case JString(s) => s; case o => o.toString }
      case o          => sys.error(s"bad request body: $o")
    }
    maxBatchSeen.getAndUpdate(m => math.max(m, texts.length))
    val resp = texts.map { t =>
      fakeVec(t).map(v => f"$v%.6f").mkString("""{"embedding":[""", ",", "]}")
    }.mkString("""{"data":[""", ",", "]}")
    val bytes = resp.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/embeddings", (ex: HttpExchange) => handle(ex))
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def embedder(retries: Int = 3) = HttpBatchEmbedder(
    s"http://127.0.0.1:$port/v1/embeddings", dim = Dim,
    localProvider = true, numRetries = retries)

  test("embed() matches the model server exactly, order-preserved") {
    import spark.implicits._
    val df = (0 until 24).map(i => (i.toLong, s"text number $i"))
      .toDF("id", "text")
    requestCount.set(0)
    maxBatchSeen.set(0)
    val out = embedder().embed(df, "text", "emb")
      .select($"id", $"emb").collect().sortBy(_.getLong(0))
    assert(out.length == 24)
    out.foreach { r =>
      val want = fakeVec(s"text number ${r.getLong(0)}")
      val got = r.getSeq[Float](1)
      assert(got.length == Dim)
      want.zip(got).foreach { case (w, g) => assert(math.abs(w - g) < 1e-5f) }
    }
    // local-provider batch size is 5 (litellm _determine_batch_size).
    // 24 rows across <=4 partitions: between ceil(24/5)=5 requests (all in
    // one partition) and 8 (sum of per-partition ceils) — never 24
    // one-per-row calls, and no request above the batch cap.
    assert(requestCount.get() >= 5 && requestCount.get() <= 8)
    assert(maxBatchSeen.get() == 5)
  }

  test("transient 500s are retried; batch still succeeds") {
    import spark.implicits._
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text").repartition(1)
    failFirstN.set(1)
    val out = embedder().embed(df, "text", "emb").collect()
    assert(out.length == 2)
    failFirstN.set(0)
  }

  test("embedText returns the zero vector when the endpoint is unreachable") {
    val dead = HttpBatchEmbedder(s"http://127.0.0.1:1/v1/embeddings", dim = Dim,
      numRetries = 0, timeoutSec = 1)
    assert(dead.embedText("q").toSeq == Seq.fill(Dim)(0f))
  }

  test("retrieveChunks works with a non-Hash embedder end to end") {
    import spark.implicits._
    val chunks = (1 to 4).flatMap(d => (0 until 2).map(n =>
      (s"doc$d", n, s"content $d $n", fakeVec(s"content $d $n").toSeq,
        Map("k" -> "v"), Map("k" -> "string"), "app1", "u1", "/f")))
      .toDF("document_id", "chunk_number", "content", "embedding",
        "metadata", "metadata_types", "app_id", "end_user_id", "folder_path")
    val t = GraftService.ChunkTable(chunks)
    val hits = GraftService.retrieveChunks(
      GraftService.RetrieveRequest("content 2 1", k = 3, appId = Some("app1")),
      t, embedder())
    val top = hits.select("document_id", "chunk_number").as[(String, Int)].collect()
    assert(top.length == 3)
    // the query text IS a chunk's content: identical fake embedding => top hit
    assert(top.head == ("doc2", 1))
  }
}
