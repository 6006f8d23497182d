package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mutations
import graft.streaming.StreamingChangelog

/** [[StreamingChangelog]] rebuild equivalence: the keyed view after all
  * micro-batches must equal the batch
  * [[Mutations.applyChangelog]] fold over the full log — including a
  * cross-batch delete→insert resurrection and an at-least-once REPLAY of
  * an already-applied seq (must be dropped, not re-applied). */
class StreamingChangelogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("streamed keyed view equals the batch fold; replayed seqs are idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq((1L, 1L, "U", "a1"), (2L, 1L, "I", "b1"), (3L, 1L, "D", ""))
    val batch2 = Seq((3L, 2L, "I", "c2"),       // cross-batch resurrection
                     (2L, 1L, "I", "b1-REPLAY"), // duplicate seq: must drop
                     (1L, 2L, "D", ""))
    val input = MemoryStream[(Long, Long, String, String)]
    val q = StreamingChangelog.applyChangelog(
        input.toDF().toDF("k", "seq", "op", "v"), "k", "seq", "op", "v")
      .writeStream.format("memory").queryName("cdc_view")
      .outputMode("update").start()
    val streamed = try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      // Update mode re-emits per batch: the view is each key's LAST row
      spark.table("cdc_view").withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("key").orderBy(col("seq").desc)))
        .filter(col("rn") === 1).drop("rn")
        .filter(col("present"))
        .select(col("key"), col("payload"))
        .as[(Long, String)].collect().toSet
    } finally q.stop()

    // batch fold over base = {} with the same log (replay row removed by
    // the batch operator's unique-(key,seq) contract)
    val base = Seq.empty[(Long, String)].toDF("k", "v")
    val log = (batch1 ++ batch2.filterNot(_._4 == "b1-REPLAY"))
      .toDF("k", "seq", "op", "v")
    val rebuilt = Mutations.applyChangelog(base, log, "k", "seq", "op")
      .as[(Long, String)].collect().toSet
    assert(streamed == rebuilt, s"stream $streamed vs batch $rebuilt")
    assert(streamed.contains((3L, "c2")), "cross-batch resurrection")
    assert(streamed.contains((2L, "b1")), "replayed seq dropped, original kept")
    assert(!streamed.exists(_._1 == 1L), "cross-batch delete applied")
  }
}
