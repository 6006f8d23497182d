package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering

/** Streaming semantic dedup: a k-means model fit offline partitions the
  * corpus index; each arriving micro-batch is ASSIGNED (a narrow map —
  * centroids are plan literals, so the streaming side needs no state and
  * no shuffle) and compared only against same-cluster corpus vectors.
  * The k2 oracle gates the batch semantics; this gates the streaming
  * drive — the SemDeDup shape of an incremental ingest pipeline. */
class StreamingSemanticDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("micro-batches flag near-dups within their assigned cluster only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def v(c: Float, bump: Int): Array[Float] =
      Array.tabulate(8)(j => if (j == bump) c + 0.01f else c)
    val corpus = Seq(
      (100L, v(1f, 0)), (101L, v(1f, 1)), (102L, v(1f, 2)),
      (200L, v(-1f, 0)), (201L, v(-1f, 1)))
      .toDF("vec_id", "embedding")
    val model = Clustering.fit(corpus, "embedding", "vec_id", k = 2, iters = 2)
    val index = Clustering.assign(corpus, "embedding", model)
      .select(col("vec_id").as("corpus_id"), col("cluster_id"),
        col("embedding").as("corpus_vec"))
      .cache()
    index.count()

    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val assigned = Clustering.assign(batch, "embedding", model)
        hits ++= assigned.join(index, Seq("cluster_id"))
          .filter(graft.functions.vec.cosine_sim(
            col("embedding"), col("corpus_vec")) >= 0.9999)
          .select("vec_id", "corpus_id").as[(Long, Long)].collect()
        ()
      }.start()
    try {
      // batch 1: a near-copy of corpus vec 100 + a novel direction
      input.addData((1L, v(1f, 0)), (2L, Array.tabulate(8)(j => if (j < 4) 1f else -1f)))
      q.processAllAvailable()
      // batch 2: a near-copy in the OTHER cluster
      input.addData((3L, v(-1f, 1)))
      q.processAllAvailable()
      assert(hits.exists(h => h._1 == 1L && h._2 == 100L))
      assert(hits.exists(h => h._1 == 3L && h._2 == 201L))
      assert(!hits.exists(_._1 == 2L), "novel vector matches nothing")
      // anti-parallel vectors (cosine -1) never cross clusters
      assert(hits.forall(h => (h._1 == 3L) == (h._2 >= 200L)))
    } finally q.stop()
  }
}
