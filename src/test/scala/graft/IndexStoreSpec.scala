package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.IndexStore

/** The write-side scale guarantees, asserted at the plan level:
  * bucketed-by-key tables join with no Exchange; partitioned tables prune
  * directories for scoped predicates. */
class IndexStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft_wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  import spark.implicits._

  test("bucketed-by-key tables join without a shuffle") {
    // builder configs are ignored when another suite already created the
    // session (shared JVM) — force the sort-merge path at runtime
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // drop catalog entries AND stale warehouse dirs from prior JVMs (a dir
    // without a catalog entry makes saveAsTable fail LOCATION_ALREADY_EXISTS)
    Seq("chunks_b", "docs_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    val chunks = (1L to 1000L).map(i => (i % 100, i, s"chunk $i"))
      .toDF("document_id", "chunk_id", "content")
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("document_id", "title")
    IndexStore.writeBucketed(chunks, "chunks_b", "document_id", 8, Some("document_id"))
    IndexStore.writeBucketed(docs, "docs_b", "document_id", 8, Some("document_id"))
    val joined = IndexStore.readTable(spark, "chunks_b")
      .join(IndexStore.readTable(spark, "docs_b"), "document_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10485760L)
    assert(joined.count() == 1000)
  }

  test("partition pruning for scoped predicates") {
    val dir = Files.createTempDirectory("graft_part").toString + "/idx"
    val df = (1 to 300).map(i => (s"app${i % 3}", i.toLong, s"c$i"))
      .toDF("app_id", "id", "content")
    IndexStore.writePartitioned(df, dir, "app_id")
    val scoped = spark.read.parquet(dir).filter($"app_id" === "app1")
    val scan = scoped.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters (directory pruning), not in
    // the data filter
    assert(scoped.count() == 100)
    assert(scan.contains("PartitionFilters") && scan.contains("app1"),
      s"partition filter missing from scan:\n$scan")
  }
}
