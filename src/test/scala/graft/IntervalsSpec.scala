package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Intervals

/** Behavioral tests for the bucketed interval join: boundary inclusivity,
  * exactly-once matching across bucket spans, and key isolation. The e5
  * DuckDB oracle proves engine-equivalence on the events table.
  */
class IntervalsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("matches inclusive bounds and keeps keys isolated") {
    val points = Seq(
      (1L, 100L, "p_at_start"), (1L, 200L, "p_at_end"), (1L, 201L, "p_after"),
      (1L, 99L, "p_before"), (2L, 150L, "p_other_key"))
      .toDF("k", "t", "p_tag")
    val intervals = Seq((1L, 100L, 200L, "i1")).toDF("k", "s", "e", "i_tag")
    val out = Intervals.bucketedIntervalJoin(points, intervals,
      Seq("k"), "t", "s", "e", bucketWidth = 50L)
      .select("p_tag", "i_tag").as[(String, String)].collect().toSet
    assert(out == Set(("p_at_start", "i1"), ("p_at_end", "i1")))
  }

  test("each pair matches exactly once when the interval spans many buckets") {
    // interval [0, 1000] covers 101 buckets at width 10; every point inside
    // must appear exactly once, not once per bucket
    val points = (0L to 1000L by 100L).map(t => (7L, t)).toDF("k", "t")
    val intervals = Seq((7L, 0L, 1000L)).toDF("k", "s", "e")
    val out = Intervals.bucketedIntervalJoin(points, intervals,
      Seq("k"), "t", "s", "e", bucketWidth = 10L)
      .select("t").as[Long].collect().toSeq
    assert(out.size == 11)
    assert(out.distinct.size == 11)
  }

  test("plans as an equi-join, never a nested-loop or cartesian product") {
    // the whole point of the bucketing: the range predicate must ride an
    // equi-join on (key, bucket), not force BroadcastNestedLoopJoin
    val points = (0L until 200L).map(i => (i % 5, i * 10L)).toDF("k", "t")
    val intervals = (0L until 50L).map(i => (i % 5, i * 40L, i * 40L + 100L))
      .toDF("k", "s", "e")
    val joined = Intervals.bucketedIntervalJoin(points, intervals,
      Seq("k"), "t", "s", "e", bucketWidth = 50L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a non-equi plan:\n$plan")
    assert(joined.count() > 0)
  }

  test("overlapping intervals each match; column name `end` survives") {
    val points = Seq((1L, 55L)).toDF("k", "t")
    // `end` is a SQL keyword — the operator must backtick it internally
    val intervals = Seq((1L, 0L, 60L, "a"), (1L, 50L, 120L, "b"), (1L, 70L, 80L, "c"))
      .toDF("k", "start", "end", "tag")
    val out = Intervals.bucketedIntervalJoin(points, intervals,
      Seq("k"), "t", "start", "end", bucketWidth = 25L)
      .select("tag").as[String].collect().toSet
    assert(out == Set("a", "b"))
  }

  test("intervalUnion: overlap merges, touching merges, gaps split; keys independent") {
    val spans = Seq(
      // key 1: [0,10] ∪ [5,20] overlap; [20,30] touches (inclusive ends);
      // [40,50] gapped; contained [42,45] merges into it
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L),
      (1L, 40L, 50L), (1L, 42L, 45L),
      // key 2: one lone span overlapping key 1's gap — keys never mix
      (2L, 25L, 45L)
    ).toDF("k", "s", "e")
    val out = Intervals.intervalUnion(spans, Seq("k"), "s", "e")
      .select("k", "span_id", "s", "e", "n_merged")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 0L, 30L, 3L),
      (1L, 2L, 40L, 50L, 2L),
      (2L, 1L, 25L, 45L, 1L)), out.toString)
  }
}
