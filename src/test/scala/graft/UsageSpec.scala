package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Usage

/** Order-dependent clamp semantics of the usage-delta fold
  * (`record_document_storage_deltas`): GREATEST(total+delta, 0) applied
  * per event in sequence order — NOT a clamped sum — plus zero-event
  * skipping and last-writer app_id. */
class UsageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def deltas(rows: (String, String, Long, Long, Long, Long)*) =
    rows.toDF("document_id", "app_id", "seq", "raw_delta", "chunk_delta", "mv_delta")

  test("clamping is per-event: +10, -100, +5 folds to 5, not 0") {
    val out = Usage.foldDocDeltas(deltas(
      ("d1", "a", 1, 10, 0, 0),
      ("d1", "a", 2, -100, 0, 0),
      ("d1", "a", 3, 5, 0, 0)))
      .select("raw_bytes").as[Long].head()
    assert(out == 5L) // clamped sum would say max(-85,0)=0
  }

  test("all-zero delta events are skipped (and don't steal last-writer app_id)") {
    val out = Usage.foldDocDeltas(deltas(
      ("d1", "app_old", 1, 7, 3, 0),
      ("d1", "app_zero", 2, 0, 0, 0),   // skipped entirely
      ("d1", "app_new", 3, 1, 0, 2)))
      .select("app_id", "raw_bytes", "chunk_bytes", "multivector_bytes")
      .as[(String, Long, Long, Long)].head()
    assert(out == (("app_new", 8L, 3L, 2L)))
  }

  test("app-level fold concentrates correctly; doc-rollup agrees when clamp-free") {
    val d = deltas(
      ("d1", "a", 1, 10, 2, 0),
      ("d2", "a", 2, 4, 0, 6),
      ("d3", "b", 3, 1, 1, 1))
    val byApp = Usage.foldAppDeltas(d)
      .select("app_id", "raw_bytes", "chunk_bytes", "multivector_bytes")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val viaDocs = Usage.foldAppFromDocs(d)
      .select("app_id", "raw_bytes", "chunk_bytes", "multivector_bytes")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(byApp == Seq(("a", 14L, 2L, 6L), ("b", 1L, 1L, 1L)))
    assert(byApp == viaDocs)
  }
}
