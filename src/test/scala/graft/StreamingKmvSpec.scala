package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingKmv

/** Rebuild equivalence for the streaming KMV sketch: after any prefix of
  * rows, the LATEST emission per corpus must equal an independent
  * MessageDigest bottom-k replay of that prefix — including across a
  * micro-batch seam (the bottom-k set must accumulate, never re-seed),
  * for a corpus untouched by the second batch (state persists), and on
  * both estimate branches (exhaustive < k and kth-division ≥ k). */
class StreamingKmvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val K = 16

  private def kmvHash(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"kmv:$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Independent replay: (corpus, sk_n, kth, est) over a full prefix. */
  private def replay(rows: Seq[(String, String)]): Set[(String, Long, Long, Long)] =
    rows.groupBy(_._1).map { case (c, rs) =>
      val hs = rs.map(r => kmvHash(r._2)).distinct.sorted.take(K).toVector
      val est = if (hs.length < K) hs.length.toLong
        else ((BigInt(K - 1) * (BigInt(1) << 60)) / hs.max).toLong
      (c, hs.length.toLong, if (hs.isEmpty) 0L else hs.max, est)
    }.toSet

  test("latest stream emission per corpus equals the bottom-k replay over " +
    "every prefix; the seam accumulates and untouched state persists") {
    implicit val sqlCtx = spark.sqlContext
    // A rides the estimation branch (300 distinct >> k), B the
    // exhaustive one (10 distinct < k); batch 2 touches only A
    val b1 = (1 to 300).map(i => ("A", s"a$i")) ++
      (1 to 10).map(i => ("B", s"b$i"))
    val b2 = (250 to 420).map(i => ("A", s"a$i"))
    val input = MemoryStream[(String, String)]
    val q = StreamingKmv.distinctEstimate(
        input.toDF().toDF("corpus", "key"), "corpus", "key", k = K)
      .writeStream.outputMode("update").format("memory")
      .queryName("kmv_out").start()
    // memory sink in update mode appends per batch: sk_n grows
    // monotonically and kth shrinks once the sketch is full, so the
    // latest emission per corpus is maxBy (sk_n, -kth)
    def latest(): Set[(String, Long, Long, Long)] =
      spark.sql("SELECT corpus, sk_n, kth, est FROM kmv_out")
        .as[(String, Long, Long, Long)].collect()
        .groupBy(_._1)
        .map { case (_, rs) => rs.maxBy(r => (r._2, -r._3)) }.toSet
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(latest() == replay(b1), "prefix-1 rebuild equivalence")
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(latest() == replay(b1 ++ b2),
        "post-seam equivalence incl. the untouched corpus B")
      // fixture sanity: batch 2 genuinely moved A's sketch, and both
      // branches are live in the final state
      assert(replay(b1) != replay(b1 ++ b2))
      val fin = latest().map { case (c, n, _, e) => c -> ((n, e)) }.toMap
      assert(fin("B") == ((10L, 10L)), "B exhaustive: est == exact")
      assert(fin("A")._1 == K.toLong, "A saturated at k")
    } finally q.stop()
  }

  test("guards match the batch operator and are loud") {
    val badK = intercept[IllegalArgumentException] {
      StreamingKmv.distinctEstimate(
        Seq(("a", "x")).toDF("corpus", "key"), "corpus", "key", k = 5000)
    }
    assert(badK.getMessage.contains("k in [16, 4096]"))
    val badType = intercept[IllegalArgumentException] {
      StreamingKmv.distinctEstimate(
        Seq(("a", 1L)).toDF("corpus", "key"), "corpus", "key")
    }
    assert(badType.getMessage.toLowerCase.contains("string"))
  }
}
