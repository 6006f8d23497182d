package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

/** Incremental heavy hitters (t16's incremental-crawl arm): an ingest
  * stream appends each micro-batch's partial (stratum, token, cnt) counts
  * ([[Corpus.heavyHittersDelta]]); the vocabulary leaderboard is derived
  * from the accumulated parts ([[Corpus.heavyHittersFromCounts]]) — never
  * a re-tokenization of the corpus. Gated by REBUILD EQUIVALENCE: the
  * parts-derived top-k must equal the batch [[Corpus.heavyHitters]] over
  * everything ingested so far, rank for rank. Parts are written
  * batchId-partitioned with dynamic overwrite (heavyHittersDelta's sink
  * contract) so a REPLAYED micro-batch — foreachBatch's failure semantics
  * — replaces its own partition instead of double-counting; the replay
  * case is exercised explicitly below. */
class StreamingHeavyHittersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("streamed count parts answer identically to a from-scratch rerun") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_incr_hh").toString
    val base = Seq(("en", "spark spark engine"), ("de", "daten daten bank"))
      .toDF("lang", "text")
    // the idempotent sink shape from heavyHittersDelta's scaladoc: one
    // partition per batch, dynamic overwrite — a replay rewrites in place
    def writePart(df: DataFrame, batchId: Long): Unit =
      Corpus.heavyHittersDelta(df, "lang", "text")
        .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(s"$dir/counts")
    writePart(base, -1L) // the pre-stream backfill part

    val input = MemoryStream[(String, String)]
    val q = input.toDF().toDF("lang", "text").writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writePart(batch, batchId)
      }.start()
    val all = try {
      input.addData(("en", "engine engine engine room"), ("de", "bank bank"))
      q.processAllAvailable()
      // a token first seen in the LAST batch must still be able to take
      // the top rank — the accumulated merge is a true re-sum, not a max
      input.addData(("en", "spark spark spark spark cluster"))
      q.processAllAvailable()
      base.unionByName(Seq(("en", "engine engine engine room"),
        ("de", "bank bank"),
        ("en", "spark spark spark spark cluster")).toDF("lang", "text"))
    } finally q.stop()

    def top3: Set[(String, String, Long, Int)] = Corpus.heavyHittersFromCounts(
      spark.read.parquet(s"$dir/counts").drop("batch_id"), k = 3)
      .as[(String, String, Long, Int)].collect().toSet
    val streamed = top3
    val rebuilt = Corpus.heavyHitters(all, "lang", "text", k = 3)
      .as[(String, String, Long, Int)].collect().toSet
    assert(streamed == rebuilt, "parts-derived top-k == batch rerun")
    // cross-batch sum: spark = 2 (base) + 4 (last batch) = 6, en rank 1
    assert(streamed.contains(("en", "spark", 6L, 1)),
      s"cross-batch counts must merge: $streamed")
    // REPLAY: foreachBatch re-delivers batch 1 after a simulated failure;
    // the dynamic-overwrite part write must leave the totals unchanged
    // (a plain append would have pushed en/spark to 10 here)
    writePart(Seq(("en", "spark spark spark spark cluster"))
      .toDF("lang", "text"), 1L)
    assert(top3 == streamed, "a replayed micro-batch must not double-count")
  }
}
