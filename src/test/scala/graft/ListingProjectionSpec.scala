package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Listing.Projection

/** Ports the reference's `test_document_projection.py` table to the Spark
  * projection: field→column resolution (always external_id, nested roots,
  * cheap status keys, derived summary/page_count), scan-level pruning (the
  * `system_metadata->>'status'` JSON path becomes nested-schema pruning:
  * ReadSchema must NOT contain the heavy content subfield), and row
  * reshaping (slim system_metadata, null-container normalization, nested
  * metadata subkeys).
  */
class ListingProjectionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // documents frame shaped like the reference table: struct metadata +
  // struct system_metadata whose `content` subfield is the heavy text
  private lazy val docsPath: String = {
    val p = Files.createTempDirectory("graft_proj").toString + "/docs"
    Seq(
      ("d1", "text/plain", "a.txt", ("ExampleCo", "invoice"),
        ("completed", null: String, "s3://x", "big text 1"), Seq(1L, 2L, 3L)),
      ("d2", "text/plain", "b.txt", ("OtherCo", "report"),
        ("processing", "oom", null: String, "big text 2"), null: Seq[Long]))
      .toDF("external_id", "content_type", "filename", "m", "sm", "chunk_ids")
      .select(col("external_id"), col("content_type"), col("filename"),
        struct(col("m._1").as("client"), col("m._2").as("doc_type")).as("metadata"),
        struct(col("sm._1").as("status"), col("sm._2").as("error"),
          col("sm._3").as("summary_storage_key"), col("sm._4").as("content"))
          .as("system_metadata"),
        col("chunk_ids"))
      .write.mode("overwrite").parquet(p)
    p
  }
  private def docs: DataFrame = spark.read.parquet(docsPath)

  // --- resolution table (test_document_projection.py::TestResolveProjectionFields)

  test("no fields resolves to None (project everything)") {
    assert(Projection.resolve(null) == None)
    assert(Projection.resolve(Nil) == None)
    assert(Projection.resolve(Seq("  ")) == None)
  }

  test("always includes external_id") {
    assert(Projection.resolve(Seq("metadata")) == Some(Set("external_id", "metadata")))
  }

  test("nested field resolves to its root column") {
    assert(Projection.resolve(Seq("metadata.client")) == Some(Set("external_id", "metadata")))
  }

  test("summary key requires full system_metadata") {
    assert(Projection.resolve(Seq("summary_storage_key")) ==
      Some(Set("external_id", "system_metadata")))
  }

  test("page_count requires system_metadata and chunk_ids") {
    assert(Projection.resolve(Seq("page_count")) ==
      Some(Set("external_id", "system_metadata", "chunk_ids")))
  }

  test("status resolves to a cheap subfield read, never the full column") {
    val r = Projection.resolve(Seq("status")).get
    assert(r("sm:status") && r("external_id") && !r("system_metadata"))
  }

  // --- scan pruning (TestProjectionColumns / TestStatusProjection)

  test("metadata projection never reads the heavy system_metadata content") {
    val plan = Projection.project(docs, Seq("metadata")).queryExecution
      .executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("content"), s"heavy subfield still read:\n$plan")
  }

  test("status projection prunes to the one subfield at the parquet scan") {
    val projected = Projection.project(docs, Seq("status"))
    val plan = projected.queryExecution.executedPlan.toString
    // the ->>'status' analog: ReadSchema carries system_metadata<status>
    // only — neither the text-bearing content nor the other scalars
    assert(plan.contains("status"), plan)
    assert(!plan.contains("content"), s"full blob still read:\n$plan")
    val row = projected.filter(col("external_id") === "d1").head()
    assert(row.getAs[Row]("system_metadata").getAs[String]("status") == "completed")
  }

  // --- reshaping (TestProjectionRowToDict / TestProjectDocumentFields)

  test("slim system_metadata reassembles requested status keys") {
    val out = Projection.project(docs, Seq("status", "error"))
    assert(out.schema("system_metadata").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSet == Set("status", "error"))
    val d2 = out.filter(col("external_id") === "d2").head()
      .getAs[Row]("system_metadata")
    assert(d2.getAs[String]("status") == "processing" && d2.getAs[String]("error") == "oom")
  }

  test("null chunk_ids normalizes to an empty array") {
    val out = Projection.project(docs, Seq("chunk_ids"))
      .filter(col("external_id") === "d2").head()
    assert(out.getAs[scala.collection.Seq[Long]]("chunk_ids").isEmpty)
  }

  test("summary keys derive top-level when system_metadata is projected") {
    val out = Projection.project(docs, Seq("summary_storage_key"))
      .select("external_id", "summary_storage_key")
      .as[(String, Option[String])].collect().toMap
    assert(out("d1").contains("s3://x") && out("d2").isEmpty)
  }

  test("page_count derives from chunk_ids length") {
    val out = Projection.project(docs, Seq("page_count"))
      .select("external_id", "page_count")
      .as[(String, Long)].collect().toMap
    assert(out == Map("d1" -> 3L, "d2" -> 0L))
  }

  test("projects requested fields only, id always present") {
    val out = Projection.project(docs, Seq("metadata"))
    assert(out.columns.toSet == Set("external_id", "metadata"))
  }

  test("nested projection keeps only the requested metadata subkeys") {
    val out = Projection.project(docs, Seq("metadata.client"))
      .filter(col("external_id") === "d1").head()
    val m = out.getAs[Row]("metadata")
    assert(m.schema.fieldNames.toSeq == Seq("client"))
    assert(m.getAs[String]("client") == "ExampleCo")
  }

  test("no fields returns every column unchanged") {
    assert(Projection.project(docs, Nil).columns.toSet == docs.columns.toSet)
  }

  test("requesting only nonexistent metadata subkeys drops the root entirely") {
    // the reference's dict walk sets nothing for a missing path; emitting
    // the full column would leak every other key
    val out = Projection.project(docs, Seq("metadata.zzz"))
    assert(out.columns.toSet == Set("external_id"))
  }

  test("cheap key plus summary key yields ONE full system_metadata column") {
    // summary_storage_key resolves the full column; status must ride it
    // instead of emitting a duplicate slim struct
    val out = Projection.project(docs, Seq("status", "summary_storage_key"))
    assert(out.columns.count(_ == "system_metadata") == 1)
    val d1 = out.filter(col("external_id") === "d1").head()
    assert(d1.getAs[Row]("system_metadata").getAs[String]("status") == "completed")
    assert(d1.getAs[String]("summary_storage_key") == "s3://x")
  }
}
