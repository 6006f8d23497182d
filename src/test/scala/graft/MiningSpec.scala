package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mining

/** Semantic gates for training-pair mining: the tr1/tr2 oracles prove
  * engine-equivalence; this proves the mined sets have the properties the
  * trainer depends on — no same-label leak into negatives, planted hard
  * negatives surface at rank 1, and the semi-hard band is strict. */
class MiningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // 2D geometry, hand-placed: label 0 around (1,0), label 1 around (0,1),
  // plus a label-1 vector hugging the label-0 query direction (the planted
  // hard negative) and a far label-1 outlier.
  private val data = Seq(
    (0L, Array(1.0f, 0.0f), 0),    // query
    (1L, Array(0.99f, 0.14f), 0),  // positive (hardest)
    (2L, Array(0.9f, 0.43f), 0),   // positive (weaker)
    (3L, Array(0.97f, 0.24f), 1),  // planted hard negative
    (4L, Array(0.0f, 1.0f), 1),    // easy negative
    (5L, Array(-1.0f, 0.0f), 1))   // very easy negative
  private def df = data.toDF("vec_id", "embedding", "label")
  private def queries = df.filter($"vec_id" === 0L)

  test("hard negatives exclude the query's label and rank by score") {
    val out = Mining.hardNegatives(df, "vec_id", "embedding", "label",
      queries, "vec_id", "embedding", "label", k = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(out.map(_._3).toSeq == Seq(3L, 4L, 5L)) // planted first
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L))
    val byId = data.map(d => d._1 -> d._3).toMap
    assert(out.forall(r => byId(r._3) != 0), "same-label leaked into negatives")
  }

  test("semi-hard band is strict: between pos-margin and pos, noise excluded") {
    // pos_score = cos(q, v1); v3 scores ABOVE v1? cos(q,v3)=0.971 vs
    // cos(q,v1)=0.990 -> v3 is inside (pos-margin, pos) for margin=0.05;
    // v4/v5 are far below the band
    val out = Mining.semiHardNegatives(df, "vec_id", "embedding", "label",
      queries, "vec_id", "embedding", "label", k = 3, margin = 0.05)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(out.map(_._3).toSeq == Seq(3L))
    out.foreach { case (_, _, _, score, pos) =>
      assert(score < pos && score > pos - 0.05)
    }
  }

  test("a negative scoring ABOVE the hardest positive is excluded as noise") {
    // move the planted negative INSIDE the positive cone, above v1
    val noisy = (data.filterNot(_._1 == 3L) :+
      ((3L, Array(0.999f, 0.045f), 1))).toDF("vec_id", "embedding", "label")
    val out = Mining.semiHardNegatives(noisy, "vec_id", "embedding", "label",
      noisy.filter($"vec_id" === 0L), "vec_id", "embedding", "label",
      k = 3, margin = 0.05)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(!out.map(_._3).contains(3L), "above-positive negative must be excluded")
  }

  test("queries with no positive emit no semi-hard rows") {
    val lonely = Seq((0L, Array(1.0f, 0.0f), 7), (4L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Mining.semiHardNegatives(lonely, "vec_id", "embedding", "label",
      lonely.filter($"vec_id" === 0L), "vec_id", "embedding", "label",
      k = 3, margin = 0.05).collect()
    assert(out.isEmpty)
  }

  test("triplets: hardest positive + ranked negatives per anchor; no-positive anchors drop") {
    val out = Mining.triplets(df, "vec_id", "embedding", "label",
      queries, "vec_id", "embedding", "label", k = 2)
      .as[(Long, Long, Double, Long, Long, Double)].collect().sortBy(_._4)
    assert(out.length == 2, s"k=2 negatives for the one anchor: ${out.toSeq}")
    assert(out.forall(r => r._1 == 0L && r._2 == 1L),
      "positive is the hardest same-label (v1), never self")
    assert(out.map(_._5).toSeq == Seq(3L, 4L), "negatives in hard order")
    assert(out.forall(r => r._3 > r._6),
      "planted geometry: positive outranks every mined negative")
    // an anchor whose label has no other member yields no triplet
    val lone = (data :+ ((6L, Array(0.5f, 0.5f), 2))).toDF("vec_id", "embedding", "label")
    val got = Mining.triplets(lone, "vec_id", "embedding", "label",
      lone.filter($"vec_id" === 6L), "vec_id", "embedding", "label", k = 2)
      .count()
    assert(got == 0L, "no positive exists -> no triplet")
  }

  test("btStrengths: 2-item closed form; planted dominance ordering; shutout survives") {
    // two items: MM converges in one step to W_a/(W_a+W_b) with the
    // half-win smoothing -> floor((7.5/11)*1e6)
    val two = (1 to 10).map(i => (0L, 1L, i <= 7)).toDF("a", "b", "win_a")
    val out2 = Mining.btStrengths(two, "a", "b", "win_a")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out2(0L).getAs[Long]("n_wins") == 7L &&
      out2(0L).getAs[Long]("n_comps") == 10L)
    assert(out2(0L).getAs[Long]("strength_fp") ==
      math.floor(7.5 / 11.0 * 1000000.0).toLong)
    assert(out2(1L).getAs[Long]("strength_fp") ==
      math.floor(3.5 / 11.0 * 1000000.0).toLong)
    // planted total order 0 > 1 > 2: 0 beats everyone, 1 beats 2
    val dom = ((1 to 8).map(_ => (0L, 1L, true)) ++
      (1 to 8).map(_ => (0L, 2L, true)) ++
      (1 to 8).map(_ => (1L, 2L, true))).toDF("a", "b", "win_a")
    val s = Mining.btStrengths(dom, "a", "b", "win_a")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("strength_fp")).toMap
    assert(s(0L) > s(1L) && s(1L) > s(2L), s.toString)
    // the shutout loser keeps a finite positive strength (smoothing)
    assert(s(2L) > 0L)
  }

  test("btStrengths: a pair universe past the driver cap fails loudly " +
    "(probe collects cap+1 rows, never the corpus)") {
    // 100001 DISTINCT pairs — one past the rule-17 cap; the limit-probe
    // must reject with an actionable message instead of OOMing the driver
    val big = spark.range(100001L)
      .selectExpr("id AS a", "id + 200000 AS b", "true AS win_a")
    val e = intercept[IllegalArgumentException] {
      Mining.btStrengths(big, "a", "b", "win_a")
    }
    assert(e.getMessage.contains("distinct comparison pairs"),
      s"guard must name the cause: ${e.getMessage}")
  }

  private def plOf(lists: Seq[Seq[Long]], iters: Int = 20) = {
    val rows = lists.zipWithIndex.flatMap { case (l, li) =>
      l.zipWithIndex.map { case (it, p) => (li.toLong, it, (p + 1).toLong) }
    }
    Mining.plStrengths(rows.toDF("list_id", "item", "pos"),
        "list_id", "item", "pos", iters)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
  }

  test("plStrengths: 2-item lists reduce to the exact Bradley-Terry split") {
    // 3 rankings a>b, 1 ranking b>a: the MM fixed point is gamma_a = 3/4
    // exactly (unsmoothed, unlike btStrengths — stated difference)
    val out = plOf(Seq(Seq(0L, 1L), Seq(0L, 1L), Seq(0L, 1L), Seq(1L, 0L)))
    assert(out(0L) == ((4L, 3L, 750000L)), out.toString)
    assert(out(1L) == ((4L, 1L, 250000L)))
  }

  test("plStrengths: planted listwise dominance recovers the order; shutout fits to zero") {
    // every list ranks 2 > 1 > 0: item 0 never wins a choice
    val out = plOf(Seq.fill(6)(Seq(2L, 1L, 0L)))
    assert(out(2L)._3 > out(1L)._3 && out(1L)._3 > out(0L)._3)
    assert(out(0L)._2 == 0L && out(0L)._3 == 0L,
      "an item that never wins fits gamma -> 0 (no pairwise smoothing here)")
    assert(out(2L)._2 == 6L && out(1L)._2 == 6L)
  }

  test("plStrengths: mixed-length rankings compose; win = any non-last position") {
    val out = plOf(Seq(Seq(0L, 1L, 2L), Seq(1L, 0L)))
    assert(out(0L)._1 == 2L && out(0L)._2 == 1L, "0: two lists, one win")
    assert(out(1L)._1 == 2L && out(1L)._2 == 2L, "1: wins in both")
    assert(out(2L)._1 == 1L && out(2L)._2 == 0L, "2: always last")
  }

  test("plStrengths: bit-identical under different input partitionings") {
    val lists = (0 until 40).map(i =>
      if (i % 5 == 0) Seq(1L, 0L, 2L) else Seq(2L, 1L, 0L))
    val rows = lists.zipWithIndex.flatMap { case (l, li) =>
      l.zipWithIndex.map { case (it, p) => (li.toLong, it, (p + 1).toLong) }
    }
    def run(parts: Int) = Mining.plStrengths(
      rows.toDF("list_id", "item", "pos").repartition(parts),
      "list_id", "item", "pos", 20).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(run(1) == run(7))
  }

  test("eloExpectedPpm: hand-checkable anchors and monotonicity") {
    val t = Mining.eloExpectedPpm()
    assert(t.length == 1601)
    assert(t(800) == 500000L, "equal ratings -> exactly 1/2")
    assert(t(1600) == 9900L, "d=+800: 1e6/101 floored")
    assert(t(0) == 990099L, "d=-800: 1e6*100/101 floored")
    assert(t.sliding(2).forall(p => p(0) >= p(1)),
      "expected score falls as the opponent's edge grows")
  }

  test("eloRatings: hand-replayed two-match sequence, zero-sum, " +
    "win/match counts, rank order") {
    val t = Mining.eloExpectedPpm()
    val m = Seq((1L, 0L, 1L, true), (2L, 0L, 1L, true))
      .toDF("ord", "a", "b", "win_a")
    val out = Mining.eloRatings(m, "a", "b", "win_a", "ord")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // match 1: d=0, E=500000, delta = 32*500000/1e6 = 16 -> 1016/984
    // match 2: d = 984-1016 = -32, E = t(768), delta2 by the same law
    val d2 = (32L * (1000000L - t(768))) / 1000000L
    assert(out(0L) == ((2L, 2L, 1016L + d2, 1L)))
    assert(out(1L) == ((2L, 0L, 984L - d2, 2L)))
    assert(out(0L)._3 + out(1L)._3 == 2000L, "zero-sum")
  }

  test("eloRatings: order DEPENDENCE is real (the online path tr4's " +
    "order-free fit does not have); duplicate order keys raise; cap " +
    "probe raises past matchCap") {
    // same multiset of outcomes, different order -> different ratings:
    // an early loss is avenged at low rating (big swing back), a late
    // loss lands at high rating (small expected -> big deduction)
    val w = Seq.tabulate(10)(i => ((i + 2).toLong, 0L, 1L, true))
    val early = ((1L, 0L, 1L, false) +: w)
      .toDF("ord", "a", "b", "win_a")
    val late = (w :+ (20L, 0L, 1L, false))
      .toDF("ord", "a", "b", "win_a")
    def rating(df: org.apache.spark.sql.DataFrame): Long =
      Mining.eloRatings(df, "a", "b", "win_a", "ord")
        .filter(org.apache.spark.sql.functions.col("item") === 0L)
        .head().getLong(3)
    assert(rating(early) != rating(late),
      "path dependence: same outcomes, different order, different Elo")
    val dup = Seq((1L, 0L, 1L, true), (1L, 1L, 0L, true))
      .toDF("ord", "a", "b", "win_a")
    val e1 = intercept[Exception] {
      Mining.eloRatings(dup, "a", "b", "win_a", "ord").collect()
    }
    assert(e1.getMessage.contains("duplicate order key"))
    val e2 = intercept[Exception] {
      Mining.eloRatings(
        Seq((1L, 0L, 1L, true), (2L, 0L, 1L, true))
          .toDF("ord", "a", "b", "win_a"),
        "a", "b", "win_a", "ord", matchCap = 1).collect()
    }
    assert(e2.getMessage.contains("more than 1 matches"))
  }
}
