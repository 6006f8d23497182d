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
  * everything ingested so far, rank for rank. */
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
    Corpus.heavyHittersDelta(base, "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/counts")

    val input = MemoryStream[(String, String)]
    val q = input.toDF().toDF("lang", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Corpus.heavyHittersDelta(batch, "lang", "text")
          .write.mode("append").parquet(s"$dir/counts")
        ()
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

    val streamed = Corpus.heavyHittersFromCounts(
      spark.read.parquet(s"$dir/counts"), k = 3)
      .as[(String, String, Long, Int)].collect().toSet
    val rebuilt = Corpus.heavyHitters(all, "lang", "text", k = 3)
      .as[(String, String, Long, Int)].collect().toSet
    assert(streamed == rebuilt, "parts-derived top-k == batch rerun")
    // cross-batch sum: spark = 2 (base) + 4 (last batch) = 6, en rank 1
    assert(streamed.contains(("en", "spark", 6L, 1)),
      s"cross-batch counts must merge: $streamed")
  }
}
