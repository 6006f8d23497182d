package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mutations

/** SCD2 semantic laws on hand-built dimensions: idempotence (re-merging an
  * identical snapshot is a no-op), version chaining across successive
  * merges, and null-safe change detection. The u5 oracle gates the
  * engine-equivalence of one merge on the big table. */
class Scd2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def dim0 = Seq(
    (1L, "alice", Some(0L), Option.empty[Long]),
    (2L, "bob", Some(0L), Option.empty[Long]))
    .toDF("k", "attr", "valid_from_us", "valid_to_us")
    .selectExpr("k", "attr", "valid_from_us as valid_from_us", "valid_to_us")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "attr", "valid_from_us", "valid_to_us")
      .as[(Long, String, Long, Option[Long])].collect().toSet

  test("identical snapshot is a no-op; changes chain versions") {
    val snapA = Seq((1L, "alice"), (2L, "bob")).toDF("k", "attr")
    val after1 = Mutations.scd2Merge(dim0, snapA, "k", Seq("attr"), 100L)
    assert(rows(after1) == rows(dim0), "identical snapshot must not re-version")

    val snapB = Seq((1L, "ALICE2"), (3L, "carol")).toDF("k", "attr")
    val after2 = Mutations.scd2Merge(after1, snapB, "k", Seq("attr"), 200L)
    assert(rows(after2) == Set(
      (1L, "alice", 0L, Some(200L)),  // closed
      (1L, "ALICE2", 200L, None),     // new version
      (2L, "bob", 0L, None),          // untouched (not in snapshot)
      (3L, "carol", 200L, None)))     // brand-new key

    // a third merge reverting key 1 chains a THIRD version, history intact
    val snapC = Seq((1L, "alice")).toDF("k", "attr")
    val after3 = Mutations.scd2Merge(after2, snapC, "k", Seq("attr"), 300L)
    assert(rows(after3) == Set(
      (1L, "alice", 0L, Some(200L)),
      (1L, "ALICE2", 200L, Some(300L)),
      (1L, "alice", 300L, None),
      (2L, "bob", 0L, None),
      (3L, "carol", 200L, None)))
  }

  test("null-vs-value attribute flips count as changes (null-safe compare)") {
    val d = Seq((1L, Option.empty[String], Some(0L), Option.empty[Long]))
      .toDF("k", "attr", "valid_from_us", "valid_to_us")
    val snap = Seq((1L, Some("x"))).toDF("k", "attr")
    val out = Mutations.scd2Merge(d, snap, "k", Seq("attr"), 50L)
      .select("k", "attr", "valid_from_us", "valid_to_us")
      .as[(Long, Option[String], Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, None, 0L, Some(50L)),
      (1L, Some("x"), 50L, None)))
  }

  test("asOfSnapshot: half-open intervals — at the merge instant the new version wins") {
    val dim = Seq((1L, "old", 0L, Some(100L)), (1L, "new", 100L, None),
      (2L, "only", 0L, None), (3L, "late", 200L, None))
      .toDF("k", "attr", "valid_from_us", "valid_to_us")
    def snap(t: Long) = Mutations.asOfSnapshot(dim, t)
      .select("k", "attr").as[(Long, String)].collect().toSet
    assert(snap(99L) == Set((1L, "old"), (2L, "only")))
    // exactly at eff: closed row excluded (valid_to > t is false), new
    // row included (valid_from <= t) — one version per key, never zero/two
    assert(snap(100L) == Set((1L, "new"), (2L, "only")))
    assert(snap(250L) == Set((1L, "new"), (2L, "only"), (3L, "late")))
  }
}
