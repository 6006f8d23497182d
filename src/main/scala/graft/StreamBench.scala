package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-arm throughput bench (round-10 verdict ask #6): the shipped
  * streaming arms are equivalence-gated by their specs but were never
  * MEASURED. This drives four of them over a rate-limited source and
  * reports, per arm, one JSON line: rows ingested, wall seconds, mean
  * processed rows/sec, micro-batch count, and the state operator's
  * rows/bytes at the end of the run — the state-size growth-law evidence
  * (laws documented in ARCHITECTURE.md "Streaming state growth laws").
  *
  * Arms:
  *  - context_windows: [[streaming.StreamingContextWindows]] — state is
  *    one open block per shard (O(shards × blockTokens) tokens, corpus-
  *    size-independent).
  *  - changelog: [[streaming.StreamingChangelog]] — state is one
  *    (present, payload, seq) per DISTINCT key (the materialized view
  *    itself; grows with key cardinality, never with log length).
  *  - scene_cuts: [[streaming.StreamingSceneCuts]] — state is one
  *    (ts, hash, ok) per video (~17 B); decode is map-only before the
  *    stateful stage, so state traffic is 8-byte fingerprints.
  *  - paragraph_dedup: the foreachBatch arm
  *    ([[operators.Dedup.paragraphDedupAgainst]] + index delta) — state
  *    is the ownership INDEX table: one row per distinct paragraph
  *    (grows with novelty, not with ingest volume; the bench's planted
  *    ~1/3 duplicate ratio shows index rows < paragraph rows).
  *
  * Usage: runMain graft.StreamBench [durationSecPerArm] — defaults to 12.
  * Prints one JSON line per arm; redirect to STREAMBENCH_r{N}.json.
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val durSec = args.headOption.map(_.toInt).getOrElse(12)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    runStateful(spark, "context_windows", durSec, rowsPerSec = 20000,
      build = src => {
        val docs = src.select((col("value") % 64).as("shard"),
          col("value").as("doc_id"),
          concat(lit(("the quick brown fox jumps over a lazy dog and " * 4)
            .trim + " doc "), col("value").cast("string")).as("text"))
        streaming.StreamingContextWindows.contextWindows(
          docs, "doc_id", "shard", "text", blockTokens = 512)
      }, outputMode = "append")

    runStateful(spark, "changelog", durSec, rowsPerSec = 50000,
      build = src => {
        val log = src.select(pmod(col("value"), lit(200000)).as("key"),
          col("value").as("seq"),
          when(pmod(col("value"), lit(20)) === 0, "D").otherwise("U").as("op"),
          concat(lit("payload-"), col("value").cast("string")).as("payload"))
        streaming.StreamingChangelog.applyChangelog(
          log, "key", "seq", "op", "payload")
      }, outputMode = "update")

    val sceneA = twoTonePng(10, 200); val sceneB = twoTonePng(200, 10)
    runStateful(spark, "scene_cuts", durSec, rowsPerSec = 10000,
      build = src => {
        val frames = src.select(
          expr("value div 1000").as("video_id"),
          (col("value") % 1000).as("ts"),
          when(pmod(expr("value div 100"), lit(2)) === 0, lit(sceneA))
            .otherwise(lit(sceneB)).as("bytes"))
        streaming.StreamingSceneCuts.sceneCuts(
          frames, "video_id", "ts", "bytes", maxHamming = 3)
      }, outputMode = "append")

    runParagraphDedup(spark, durSec)
    spark.stop()
  }

  /** Drive one stateful-streaming arm over the rate source for ~durSec,
    * then summarize its progress events. */
  private def runStateful(spark: SparkSession, arm: String, durSec: Int,
                          rowsPerSec: Int, build: DataFrame => DataFrame,
                          outputMode: String): Unit = {
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSec)
      .option("numPartitions", 4).load()
    val q = build(src).writeStream.format("noop")
      .outputMode(outputMode)
      .trigger(Trigger.ProcessingTime("1 second"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft_sb_$arm").toString)
      .start()
    val t0 = System.nanoTime()
    // NOTE: never processAllAvailable() on a rate source — it can't drain
    Thread.sleep(durSec * 1000L)
    val progress = q.recentProgress.toSeq
    q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val rows = progress.map(_.numInputRows).sum
    val procRates = progress.map(_.processedRowsPerSecond).filter(!_.isNaN)
    val meanRate = if (procRates.isEmpty) 0.0 else procRates.sum / procRates.size
    val st = progress.reverse.flatMap(_.stateOperators.headOption).headOption
    val stateRows = st.map(_.numRowsTotal).getOrElse(0L)
    val stateBytes = st.map(_.memoryUsedBytes).getOrElse(0L)
    println(f"""{"arm":"$arm","rows":$rows,"wall_s":$wall%.1f,""" +
      f""""mean_processed_rows_per_s":$meanRate%.0f,""" +
      f""""batches":${progress.size},"state_rows":$stateRows,""" +
      f""""state_bytes":$stateBytes,"input_rows_per_s":$rowsPerSec}""")
  }

  /** The foreachBatch paragraph-dedup arm: per micro-batch, dedup the
    * shard against the accumulated ownership index, extend the index by
    * the shard's novel paragraphs, checkpoint the lineage. State = the
    * index table itself. */
  private def runParagraphDedup(spark: SparkSession, durSec: Int): Unit = {
    import graft.operators.Dedup
    val paras = (c: org.apache.spark.sql.Column) => split(c, "\n")
    // ~1/3 viral, ~1/3 per-100-doc shared, ~1/3 unique paragraphs
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", 20000).option("numPartitions", 4).load()
    val docs = src.select(col("value").as("doc_id"),
      concat(
        lit("the shared viral boilerplate paragraph\nshard paragraph "),
        expr("value div 100").cast("string"),
        lit("\nunique paragraph "), col("value").cast("string")).as("text"))
    var index = Dedup.paragraphIndex(
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))),
      "doc_id", "text", paras).localCheckpoint()
    val totals = new java.util.concurrent.atomic.AtomicLong
    val batches = new java.util.concurrent.atomic.AtomicLong
    val q = docs.writeStream
      .trigger(Trigger.ProcessingTime("1 second"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sb_paradedup").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.localCheckpoint()
        Dedup.paragraphDedupAgainst(b, index, "doc_id", "text", paras)
          .write.mode("overwrite").format("noop").save()
        index = index.unionByName(
          Dedup.paragraphIndexDelta(b, index, "doc_id", "text", paras))
          .localCheckpoint()
        totals.addAndGet(b.count())
        batches.incrementAndGet()
        ()
      }
      .start()
    val t0 = System.nanoTime()
    Thread.sleep(durSec * 1000L)
    q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val idxRows = index.count()
    // (32-hex md5) + two longs per index row, plus row overhead
    val rows = totals.get()
    println(f"""{"arm":"paragraph_dedup","rows":$rows,"wall_s":$wall%.1f,""" +
      f""""mean_processed_rows_per_s":${rows / math.max(wall, 0.001)}%.0f,""" +
      f""""batches":${batches.get()},"state_rows":$idxRows,""" +
      f""""state_bytes":${idxRows * 56},"input_rows_per_s":20000}""")
  }

  private def twoTonePng(l: Int, r: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 16) {
        val v = if (x < 8) l else r
        img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }
}
