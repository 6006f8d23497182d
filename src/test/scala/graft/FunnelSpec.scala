package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Funnel

/** Semantic gates for funnel/retention: strict ordering, the journey
  * window, first-touch anchoring, and cohort math — on hand-built event
  * sequences where the right answer is computed by eye. The e9/e10
  * oracles prove engine-equivalence on the big table. */
class FunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private val steps = Seq("view", "click", "buy")

  test("strict ordering: a click BEFORE the first view does not convert") {
    val ev = Seq(
      (1L, "click", ts(10)), (1L, "view", ts(20)),                  // click too early
      (2L, "view", ts(10)), (2L, "click", ts(20)), (2L, "buy", ts(30)),
      (3L, "view", ts(10)), (3L, "click", ts(10))                   // same instant: not strictly after
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(ev, "user_id", "event_type", "ts", steps, 3600)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // only user 2 clicks strictly after their first view (user 1 clicked
    // before it; user 3 at the same instant) — and only user 2 buys
    assert(out.map(r => (r._1, r._3)).toSeq == Seq((1L, 3L), (2L, 1L), (3L, 1L)))
  }

  test("journey window bounds every step relative to the FIRST step") {
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(50)), (1L, "buy", ts(99)),   // inside
      (2L, "view", ts(0)), (2L, "click", ts(50)), (2L, "buy", ts(150)),  // buy outside
      (3L, "view", ts(0)), (3L, "click", ts(150))                        // click outside
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(ev, "user_id", "event_type", "ts", steps, 100)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._3)).toSeq == Seq((1L, 3L), (2L, 2L), (3L, 1L)))
  }

  test("first-touch anchor and exact integer avg time-to-step") {
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "view", ts(1000)),  // anchor = first view
      (1L, "click", ts(10)),
      (2L, "view", ts(0)), (2L, "click", ts(21))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click"), 3600)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // avg µs = (10s + 21s)/2 = 15.5s → integer div 15,500,000
    assert(out(1) == (2L, "click", 2L, 15500000L))
  }

  test("retention: cohorts anchor at first event, offsets count distinct users") {
    val week = 7L * 86400
    val ev = Seq(
      (1L, "x", ts(0)), (1L, "x", ts(week + 5)), (1L, "x", ts(week + 9)), // w0, active w1 (once)
      (2L, "x", ts(3)), (2L, "x", ts(2 * week + 1)),                      // w0, active w2
      (3L, "x", ts(week + 1))                                             // cohort w1
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.retention(ev, "user_id", "ts", week)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }
}
