package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mutations

/** [[Mutations.applyChangelog]]: per-key last-writer-wins over an ordered
  * CDC feed — the fold-equivalence facts the u6 oracle can't isolate
  * (resurrection, delete-after-update, update-after-delete-after-update
  * chains) on a hand-built log. */
class ChangelogApplySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("final op per key decides: delete wins, resurrection works, chains fold") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    val log = Seq(
      (1L, 1L, "U", "a2"), (1L, 2L, "D", ""),              // update then delete -> gone
      (2L, 1L, "D", ""), (2L, 2L, "I", "b2"),              // delete then insert -> resurrected
      (3L, 1L, "U", "c1"), (3L, 2L, "D", ""), (3L, 3L, "U", "c3"), // chain -> final U
      (9L, 1L, "I", "new")                                  // brand-new key
    ).toDF("k", "seq", "op", "v")
    val got = Mutations.applyChangelog(base, log, "k", "seq", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "b2"), (3L, "c3"), (4L, "d"), (9L, "new")),
      s"got $got")
  }

  test("equivalent to the row-by-row fold on a seeded random log") {
    val rnd = new scala.util.Random(5)
    val base = (0L until 40L).map(k => (k, s"v$k"))
    val log = (1L to 200L).map { seq =>
      val k = rnd.nextInt(60).toLong
      val op = Seq("I", "U", "D")(rnd.nextInt(3))
      (k, seq, op, s"p$seq")
    }
    // reference fold: apply ops one at a time in seq order
    var m = base.toMap
    log.sortBy(_._2).foreach { case (k, _, op, p) =>
      if (op == "D") m -= k else m += (k -> p)
    }
    val got = Mutations.applyChangelog(
      base.toDF("k", "v"), log.toDF("k", "seq", "op", "v"), "k", "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(got == m, "window form == row-by-row fold")
  }
}
