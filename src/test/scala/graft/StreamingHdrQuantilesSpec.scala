package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingHdrQuantiles

/** Rebuild equivalence for the streaming HDR quantile sketch: after any
  * prefix of rows, the LATEST emission per (key, q) must equal the batch
  * operator's rows over the same prefix — including across a micro-batch
  * seam (the bucket map must accumulate, never re-seed), and for a key
  * untouched by the second batch (its state persists silently). */
class StreamingHdrQuantilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private type Row5 = (String, Long, Long, Long, Long)

  private def batchRows(rows: Seq[(String, Long)]): Set[Row5] =
    graft.operators.Sketches.hdrQuantiles(
        rows.toDF("k", "v"), "k", "v")
      .as[Row5].collect().toSet

  test("latest stream emission per (key, q) equals the batch sketch over " +
    "every prefix; the seam lands mid-key and buckets accumulate") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = (1L to 40L).map(v => ("a", v * v % 3000)) ++
      (1L to 25L).map(v => ("b", v * 977 % 100000))
    val b2 = (41L to 70L).map(v => ("a", v * v % 3000)) // b untouched
    val input = MemoryStream[(String, Long)]
    val q = StreamingHdrQuantiles.quantiles(
        input.toDF().toDF("k", "v"), "k", "v")
      .writeStream.outputMode("update").format("memory")
      .queryName("hdr_out").start()
    // memory sink in update mode APPENDS rows per batch: "latest per
    // (key,q)" = the row from the highest batch that touched the key
    def latest(): Set[Row5] = {
      val all = spark.sql(
        "SELECT key, q_pct, n, est, max_err FROM hdr_out")
        .as[Row5].collect()
      // n grows monotonically per key, so max-n is the latest emission
      all.groupBy(r => (r._1, r._2))
        .map { case (_, rs) => rs.maxBy(_._3) }.toSet
    }
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(latest() == batchRows(b1), "prefix-1 rebuild equivalence")
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(latest() == batchRows(b1 ++ b2),
        "post-seam equivalence incl. the untouched key's persisted state")
      // fixture sanity: the second batch genuinely moved key a's sketch
      assert(batchRows(b1) != batchRows(b1 ++ b2))
    } finally q.stop()
  }

  test("negative values raise loudly; guards match the batch operator") {
    val neg = intercept[Exception] {
      StreamingHdrQuantiles.quantiles(
        Seq(("a", -5L)).toDF("k", "v"), "k", "v").collect()
    }
    assert(neg.getMessage.contains("negative"))
    val e = intercept[IllegalArgumentException] {
      StreamingHdrQuantiles.quantiles(
        Seq(("a", 1L)).toDF("k", "v"), "k", "v", precisionBits = 21)
    }
    assert(e.getMessage.contains("precisionBits"))
  }
}
