package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Connectors, FileSystemConnector, SourceConnector}
import graft.streaming.IngestPipeline

/** Connector sync dataflow: incremental cursor semantics (including the
  * stamp-tie page-boundary hazard), distributed fetch, and the composed
  * connector→parse-ladder ingest. */
class ConnectorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkCorpus(): String = {
    val dir = Files.createTempDirectory("graft_conn").toString
    def write(rel: String, text: String, ms: Long): Unit = {
      val p = Paths.get(dir, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, text.getBytes("UTF-8"))
      Files.setLastModifiedTime(p, FileTime.fromMillis(ms))
    }
    write("a/one.txt", "alpha document content", 1000L)
    write("a/two.txt", "beta document content", 2000L)
    write("b/three.txt", "gamma document content", 2000L) // stamp TIE with two.txt
    write("b/four.txt", "delta document content", 3000L)
    dir
  }

  test("full backfill lists every file in deterministic order and fetches real bytes") {
    val dir = mkCorpus()
    val (rows, cursor) = Connectors.pull(spark, FileSystemConnector(dir))
    val got = rows.select("source_id", "bytes", "modified_ms")
      .collect().map(r => (r.getString(0),
        new String(r.getAs[Array[Byte]](1), "UTF-8"), r.getLong(2))).toSet
    assert(got == Set(
      ("a/one.txt", "alpha document content", 1000L),
      ("a/two.txt", "beta document content", 2000L),
      ("b/three.txt", "gamma document content", 2000L),
      ("b/four.txt", "delta document content", 3000L)))
    assert(cursor.contains("3000:b/four.txt"))
  }

  test("incremental pull: only files changed since the cursor; empty sync keeps the cursor") {
    val dir = mkCorpus()
    val (_, c1) = Connectors.pull(spark, FileSystemConnector(dir))
    // nothing changed -> empty pull, cursor unchanged
    val (empty, c2) = Connectors.pull(spark, FileSystemConnector(dir), cursor = c1)
    assert(empty.count() == 0 && c2 == c1)
    // one new + one touched file -> exactly those two
    Files.write(Paths.get(dir, "a/five.txt"), "epsilon content".getBytes("UTF-8"))
    Files.setLastModifiedTime(Paths.get(dir, "a/five.txt"), FileTime.fromMillis(4000L))
    Files.setLastModifiedTime(Paths.get(dir, "a/one.txt"), FileTime.fromMillis(5000L))
    val (delta, _) = Connectors.pull(spark, FileSystemConnector(dir), cursor = c2)
    assert(delta.select("source_id").collect().map(_.getString(0)).toSet ==
      Set("a/five.txt", "a/one.txt"))
  }

  test("pagination + budget truncation never skip a stamp-tied file") {
    val dir = mkCorpus()
    val conn = FileSystemConnector(dir)
    // pageSize=1 forces a page boundary BETWEEN the two ms=2000 files;
    // maxFiles=2 truncates the sync right at the first of the tied pair
    val (first, c1) = Connectors.pull(spark, conn, pageSize = 1, maxFiles = 2)
    val firstIds = first.select("source_id").collect().map(_.getString(0)).toSet
    assert(firstIds == Set("a/one.txt", "a/two.txt"))
    // the resumed sync starts at the OTHER tied file — nothing lost
    val (rest, _) = Connectors.pull(spark, conn, cursor = c1, pageSize = 1)
    assert(rest.select("source_id").collect().map(_.getString(0)).toSet ==
      Set("b/three.txt", "b/four.txt"))
  }

  test("connector rows feed the parse ladder front door end-to-end") {
    val dir = mkCorpus()
    val (rows, _) = Connectors.pull(spark, FileSystemConnector(dir))
    val files = rows.select(
      abs(hash(col("source_id"))).cast("long").as("doc_id"),
      col("filename"), col("bytes"))
    val (chunks, status) = IngestPipeline.processFilesWithFallback(files)
    assert(status.count() == 4)
    assert(status.filter(col("parse_path") === "native").count() == 4,
      "plain-text files parse on the native rung")
    assert(chunks.count() >= 4, "every document yields at least one chunk")
  }
}
