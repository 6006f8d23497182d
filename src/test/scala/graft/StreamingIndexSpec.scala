package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Clustering, FullText, KnnSearch}

/** Incremental index maintenance: a serving index is built once and then
  * kept current by streaming appends — never a global rebuild. Both arms
  * are gated by REBUILD EQUIVALENCE: the incrementally-maintained index
  * must answer queries value-identically to an index built from scratch
  * over everything ingested so far.
  *
  *  - BM25: each micro-batch appends its postings + doc-length deltas
  *    (parquet append — the lakehouse shape); df/N/avgdl derive from the
  *    accumulated parts ([[FullText.indexFromParts]]).
  *  - Vector/IVF: each batch is assigned to the EXISTING centroids (a
  *    narrow map) and appended to the cluster-partitioned corpus; a probed
  *    query over the merged table equals brute force over the union.
  */
class StreamingIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("streamed BM25 postings answer identically to a from-scratch rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_incr_bm25").toString
    val base = Seq((0L, "spark engine basics"), (1L, "cooking pasta tonight"))
      .toDF("doc_id", "text")
    val (p0, l0) = FullText.indexDelta(base, "doc_id", "text")
    p0.write.mode("overwrite").parquet(s"$dir/postings")
    l0.write.mode("overwrite").parquet(s"$dir/lens")

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (p, l) = FullText.indexDelta(batch, "doc_id", "text")
        p.write.mode("append").parquet(s"$dir/postings")
        l.write.mode("append").parquet(s"$dir/lens")
        ()
      }.start()
    val all = try {
      input.addData((2L, "spark cluster tuning"), (3L, "gardening in spring"))
      q.processAllAvailable()
      input.addData((4L, "spark spark spark everywhere"))
      q.processAllAvailable()
      base.unionByName(Seq((2L, "spark cluster tuning"), (3L, "gardening in spring"),
        (4L, "spark spark spark everywhere")).toDF("doc_id", "text"))
    } finally q.stop()

    val incremental = FullText.queryIndex(
      FullText.indexFromParts(spark.read.parquet(s"$dir/postings"),
        spark.read.parquet(s"$dir/lens")),
      Seq("spark", "pasta"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toSet
    val rebuilt = FullText.queryIndex(
      FullText.buildIndex(all, "doc_id", "text"), Seq("spark", "pasta"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toSet
    assert(incremental == rebuilt)
    assert(incremental.map(_._1).contains(4L), "streamed doc is searchable")
  }

  test("streamed IVF appends: probed query over merged table equals brute force") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_incr_ivf").toString
    def v(c: Float, bump: Int): Array[Float] =
      Array.tabulate(8)(j => if (j == bump) c + 0.05f else c)
    // ids interleaved across blobs so the seeds (two lowest ids) start
    // one-per-blob and the fitted clusters are the blobs
    val base = Seq((0L, v(1f, 0)), (1L, v(-1f, 0)), (2L, v(1f, 1)), (3L, v(-1f, 1)))
      .toDF("vec_id", "embedding")
    val model = Clustering.fit(base, "embedding", "vec_id", k = 2, iters = 2)
    Clustering.assign(base, "embedding", model)
      .write.mode("overwrite").partitionBy("cluster_id").parquet(dir)

    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // assignment against FROZEN centroids: a narrow map, so the append
        // lands in the right cluster partition with no shuffle
        Clustering.assign(batch, "embedding", model)
          .write.mode("append").partitionBy("cluster_id").parquet(dir)
        ()
      }.start()
    try {
      input.addData((10L, v(1f, 2)), (11L, v(-1f, 2)))
      q.processAllAvailable()
    } finally q.stop()

    val merged = spark.read.parquet(dir)
    val query = v(1f, 3)
    // probe only the cluster the query lands in (nprobe=1) — the planted
    // geometry puts every +1-blob vector there, so pruned == brute force
    val probed = Clustering.assign(
      Seq((99L, query)).toDF("vec_id", "embedding"), "embedding", model)
      .select("cluster_id").as[Long].head()
    val pruned = KnnSearch.topK(merged.filter(col("cluster_id") === probed),
      "embedding", "vec_id", query, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    val brute = KnnSearch.topK(merged, "embedding", "vec_id", query, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(pruned == brute, "cluster-pruned scan loses nothing here")
    assert(pruned.contains(10L), "streamed vector is retrievable")
  }
}
