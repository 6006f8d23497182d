package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftService._
import graft.operators.HashEmbedder
import graft.sources.{IndexStore, OfficeFixtures}
import graft.streaming.IngestPipeline

/** The full product loop in one spec — what "a reference user could
  * switch" means operationally: raw files (txt + real xlsx + an
  * unparseable binary) → graded parse ladder → chunk + embed →
  * partitioned index store on disk → scoped retrieval over the store,
  * through the dense, hybrid, and status surfaces. Every stage is the
  * same code the oracle queries gate; this gates the seams between them. */
class EndToEndSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("files -> parse ladder -> chunk+embed -> store -> scoped retrieval") {
    val xlsxBytes = OfficeFixtures.xlsx(Seq(
      ("Sheet1", Seq(Seq("region", "revenue"), Seq("emea", "42")))))
    val files = Seq(
      (1L, "notes.txt",
        "the zebra milkshake protocol synchronizes replicated milkshakes".getBytes("UTF-8"),
        """{"dept":"eng","year":2024}""", "app1", "u1", "/proj/a"),
      (2L, "sales.xlsx", xlsxBytes, """{"dept":"sales"}""", "app1", "u2", "/proj/b"),
      // a broken pdf container: the native parser throws, the text rung's
      // looksLikeText gate rejects the bytes, no deep stage -> accept+mark
      (3L, "junk.pdf", Array.tabulate[Byte](64)(i => (i * 7 + 128).toByte),
        "{}", "app2", "u3", "/other"))
      .toDF("doc_id", "filename", "bytes", "metadata_json",
        "app_id", "end_user_id", "folder_path")

    // 1. graded parse ladder + chunk + embed (small chunks to force >1/doc);
    // both outputs are consumed, so follow processFilesWithFallback's
    // documented caveat and cut the shared ladder lineage once
    val cfg = IngestPipeline.Config(chunkSize = 40, overlap = 10)
    val (chunksRaw, statusRaw) = IngestPipeline.processFilesWithFallback(files, cfg)
    val (chunks, status) = (chunksRaw.localCheckpoint(), statusRaw.localCheckpoint())

    // 2. serving-shaped index rows: chunk text + scope + typed metadata
    val indexed = IngestPipeline.normalizeMetadata(
      chunks.join(files.select("doc_id", "metadata_json", "app_id",
        "end_user_id", "folder_path"), "doc_id"))
      .select(col("doc_id").as("document_id"), col("chunk_number"),
        col("chunk").as("content"), col("embedding"),
        col("metadata"), col("metadata_types"),
        col("app_id"), col("end_user_id"), col("folder_path"))

    // 3. partitioned store write + read-back (scope column prunes dirs)
    val dir = Files.createTempDirectory("graft_e2e").toString
    IndexStore.writePartitioned(indexed, dir, "app_id", SaveMode.Overwrite)
    val store = ChunkTable(spark.read.parquet(dir))

    // 4a. dense retrieval, scoped + metadata-filtered, finds the planted text
    val req = RetrieveRequest("zebra milkshake protocol", k = 3,
      appId = Some("app1"), filters = Some("""{"dept":"eng"}"""))
    val hit = retrieveChunks(req, store).select("document_id", "content")
      .as[(Long, String)].collect()
    assert(hit.nonEmpty && hit.head._1 == 1L)
    assert(hit.head._2.contains("zebra"))
    assert(hit.forall(_._1 != 3L), "app2's junk never surfaces")

    // 4b. the xlsx round-trips: its markdown chunk is retrievable by content
    val x = retrieveChunksHybrid(
      RetrieveRequest("emea revenue", k = 3, appId = Some("app1")), store)
      .select("document_id").as[Long].collect()
    assert(x.contains(2L), "spreadsheet content searchable after the loop")

    // 4b2. diversified retrieval over the same store: same scope, MMR rank
    // is dense 1..k, the pure-relevance winner still leads
    val div = retrieveChunksDiverse(
      RetrieveRequest("zebra milkshake protocol", k = 3, appId = Some("app1")),
      store)
      .select("document_id", "mmr_rank").as[(Long, Long)].collect().toSeq
    assert(div.map(_._2) == (1L to div.size).toSeq)
    assert(div.head._1 == 1L)

    // 4b3. snippet decoration composes on any hit slice: every snippet row
    // that matched carries the term and a window containing it
    val snip = operators.FullText.snippets(
      retrieveChunks(req, store), "content", Seq("zebra", "milkshake"), width = 30)
      .select("matched_term", "snippet").as[(Option[String], String)].collect()
    assert(snip.exists(_._1.contains("zebra")))
    assert(snip.filter(_._1.nonEmpty).forall(s => s._2.contains(s._1.get)))

    // 4c. the unparseable doc completed with the accept-but-mark status
    val marks = status.select("doc_id", "extraction_status", "status")
      .as[(Long, Option[String], String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(marks(3L)._1.contains("no_content_extracted"))
    assert(marks.values.forall(_._2 == "completed"), "every doc completes")
    // ...and contributed zero chunks rather than failing the batch (read
    // from the on-disk store — no pipeline re-execution)
    assert(store.df.filter(col("document_id") === 3L).count() == 0)
  }

  test("videos -> frame decode seat -> multivector embed -> colpali retrieval") {
    import graft.operators.{HashMultiVectorEmbedder, Multimodal}
    // deterministic decode seat: each (video, ts) renders distinct pixels,
    // so every frame chunk gets a distinct data-URI and multivector — the
    // same role the JCodec binding fills in a deployment
    object Decoder extends Multimodal.FrameDecoder {
      override def durationSec(b: Array[Byte]): Double = 40.0 + b.length
      override def frameAt(b: Array[Byte], ts: Double): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(64, 64,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try {
          g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 64, 64)
          g.setColor(java.awt.Color.BLACK)
          g.fillRect((b.length * 7 + ts.toInt) % 48 + 4, 8, 8, 8)
        } finally g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out); out.toByteArray
      }
    }
    val vids = Seq((100L, "va".getBytes), (200L, "video-b".getBytes))
      .toDF("doc_id", "bytes")
    // 1. decode seat -> frame chunks (dense numbering, data-URI content)
    val frames = Multimodal.videoFrameChunks(vids, "doc_id", "bytes",
      Decoder, stepSec = 30).localCheckpoint()
    val byDoc = frames.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byDoc == Map(100L -> 2L, 200L -> 2L), // durations 42/47 -> ts 0,30
      s"one frame per stepSec per video: $byDoc")

    // 2. embed each frame like the colpali ingestion arm embeds page images
    val model = HashMultiVectorEmbedder(dim = 32)
    val emb = model.embedMulti(frames, "content", "mv")
      .withColumnRenamed("doc_id", "document_id")
      .withColumn("metadata", typedLit(Map.empty[String, String]))

    // 3. retrieve by one frame's exact content: maxsim against the same
    // deterministic embedder must surface exactly that (video, frame)
    val target = frames.filter(col("doc_id") === 200L && col("ts") === 30.0)
      .select("content").as[String].head()
    val top = retrieveChunksMultivector(
      RetrieveRequest(target, k = 1), ChunkTable(emb), "mv", model)
      .select("document_id", "chunk_number").as[(Long, Int)].collect().toSeq
    assert(top == Seq((200L, 1)),
      s"the decoded frame itself must be the top maxsim hit: $top")
  }

  test("videos -> frames + transcript seat -> as-of -> augmented content (S8 both halves)") {
    import graft.operators.{AsOfJoin, Multimodal, Transcriber}
    // pixel half: deterministic frame descriptions per (video, step)
    object Decoder extends Multimodal.FrameDecoder {
      override def durationSec(b: Array[Byte]): Double = 65.0
      override def frameAt(b: Array[Byte], ts: Double): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(32, 32,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try {
          g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 32, 32)
          g.setColor(java.awt.Color.BLACK); g.fillRect(ts.toInt % 24 + 2, 4, 6, 6)
        } finally g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out); out.toByteArray
      }
    }
    // audio half: a seat emitting one utterance per 20s, text tied to (doc, k)
    object Stt extends Transcriber.SpeechTranscriber {
      override def transcribe(b: Array[Byte]): Seq[Transcriber.Segment] =
        (0 to 3).map(k => Transcriber.Segment(k * 20.0, s"utterance ${b.length} $k"))
    }
    val vids = Seq((1L, "clip-one".getBytes), (2L, "clip-number-two".getBytes))
      .toDF("doc_id", "bytes")
    val frames = Multimodal.videoFrameChunks(vids, "doc_id", "bytes",
      Decoder, stepSec = 30)
      .select(col("doc_id").as("media_id"), col("ts").cast("long").as("ts"),
        concat_ws(" ", lit("frame"), col("doc_id"), col("chunk_number")).as("frame_desc"))
    val speech = Transcriber.transcriptChunks(
      vids.withColumnRenamed("doc_id", "media_id"), "media_id", "bytes", Stt)
      .select(col("media_id"), col("ts").cast("long").as("ts"),
        col("text").as("speech_txt"))
    // a retrieval hit at t=31s on video 2: nearest frame is 30s, nearest
    // utterance is 40s — the r3 augmented-content composition
    val hits = Seq((2L, 31L)).toDF("media_id", "ts")
    val withFrame = AsOfJoin.nearest(hits, frames, "media_id", "ts",
      Seq("frame_desc"), toleranceSec = 1e12)
      .select(col("media_id"), col("ts"), col("near_frame_desc"))
    val augmented = AsOfJoin.nearest(withFrame, speech, "media_id", "ts",
      Seq("speech_txt"), toleranceSec = 1e12)
      .select(concat(lit("Frame description: "), col("near_frame_desc"),
        lit(" \n \n Transcript: "), col("near_speech_txt")).as("augmented"))
      .as[String].collect().toSeq
    assert(augmented == Seq(
      "Frame description: frame 2 1 \n \n Transcript: utterance 15 2"),
      s"nearest frame (30s) + nearest utterance (40s) assemble the r3 format: $augmented")
  }

  test("incremental re-embed plan: added docs embed everything, edits reuse chunks") {
    val out = graft.queries.PipelineQueries
      .incrementalReembed(spark, "/root/testdata/sf0.001")
      .select("status", "n_chunks", "n_embed", "n_reused")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall { case (_, c, e, r) => e + r == c && e >= 0 && r >= 0 })
    val added = out.filter(_._1 == "added")
    assert(added.nonEmpty && added.forall(r => r._3 == r._2),
      "an added doc has no previous chunks to reuse")
    val changed = out.filter(_._1 == "changed")
    assert(changed.nonEmpty)
    // content-defined boundaries re-synchronize after a prepend edit, so
    // edits reuse a substantial share of their chunks — the c4 payoff
    val reuse = changed.map(_._4).sum.toDouble /
      math.max(changed.map(_._2).sum, 1L)
    assert(reuse > 0.2, f"changed-doc chunk reuse $reuse%.2f should be material")
    // and an edit is never free: every changed doc re-embeds something
    assert(changed.forall(_._3 >= 1))
  }
}
