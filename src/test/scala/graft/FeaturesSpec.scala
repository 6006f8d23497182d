package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Features

/** Gates for the winsorize twins: the e11 oracle proves the exact arm's
  * engine-equivalence; this pins the arms against each other (the scale
  * trade must be measured), the clip transform, and fence-boundary
  * semantics. */
class FeaturesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def df = (1 to 1000).map(i => ("a", i.toDouble)).toDF("g", "v")

  test("exact fences at known ranks; boundary values are NOT outliers") {
    val r = Features.winsorizeStats(df, "g", "v", 0.1, 0.9)
      .as[(String, Double, Double, Long, Long, Long)].collect().head
    // rank (n-1)p over 1..1000: p10 at index 99.9 -> 100.9, p90 -> 900.1
    assert(math.abs(r._2 - 100.9) < 1e-9 && math.abs(r._3 - 900.1) < 1e-9)
    assert(r._4 == 100L && r._5 == 100L && r._6 == 1000L)
  }

  test("approx arm lands within the sketch bound of the exact arm") {
    val exact = Features.winsorizeStats(df, "g", "v", 0.01, 0.99)
      .as[(String, Double, Double, Long, Long, Long)].collect().head
    val approx = Features.winsorizeStatsApprox(df, "g", "v", 0.01, 0.99)
      .as[(String, Double, Double, Long, Long, Long)].collect().head
    // accuracy=10000 => rank error <= n/accuracy = 0.1 ranks; allow 2 values
    assert(math.abs(approx._2 - exact._2) <= 2.0, s"p_lo ${approx._2} vs ${exact._2}")
    assert(math.abs(approx._3 - exact._3) <= 2.0, s"p_hi ${approx._3} vs ${exact._3}")
  }

  test("winsorize clamps into the fences and leaves interior values alone") {
    val out = Features.winsorize(df, "g", "v", 0.1, 0.9)
      .select("v", "v_w").as[(Double, Double)].collect().toMap
    assert(out(1.0) == 100.9 && out(1000.0) == 900.1)
    assert(out(500.0) == 500.0)
    assert(out.values.forall(v => v >= 100.9 && v <= 900.1))
  }

  test("ewmaFixedPoint: seeds at the first value, exact fold, single-event keys") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, 1L, ts(10), 8.0),   // k=1: 8 -> then 16: s = 7*8e6/8 + 16e6/8 = 9e6
      (1L, 2L, ts(20), 16.0),
      (2L, 3L, ts(10), 3.5)    // single event: ewma == floor(3.5e6)
    ).toDF("k", "id", "ts", "v")
    val rows = Features.ewmaFixedPoint(ev, "k", "ts", "id", "v")
      .select("k", "n", "ewma_fp").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // key 1: seed 8e6, then 7*8e6/8 + 16e6/8 = 9e6
    assert(rows(1L) == (2L, 9000000L))
    // single-event key: ewma is the seeded first value
    assert(rows(2L) == (1L, 3500000L))
  }

  test("targetEncode: out-of-fold counts, smoothing, and the no-self-leak prior fallback") {
    // category "a": fold 0 has 2 rows (1 pos), fold 1 has 2 rows (2 pos)
    // category "b": ONLY fold 0 (3 rows, all pos) -> fold-0 encoding must
    // ignore them entirely and fall back to exactly the prior
    val rows = Seq(
      ("a", 0L, 1), ("a", 0L, 0), ("a", 1L, 1), ("a", 1L, 1),
      ("b", 0L, 1), ("b", 0L, 1), ("b", 0L, 1)
    ).toDF("cat", "fold", "y")
    val prior = 6.0 / 7.0 // 6 positive labels of 7 rows
    val a = 20.0
    val out = graft.operators.Features.targetEncode(rows, "cat", "y", "fold", a)
      .select("category", "fold", "n_out", "pos_out", "encoding")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // a/fold0 sees only fold1's counts: (2 + a·prior)/(2 + a)
    assert(out(("a", 0L))._1 == 2L && out(("a", 0L))._2 == 2L)
    assert(math.abs(out(("a", 0L))._3 - (2 + a * prior) / (2 + a)) < 1e-12)
    // a/fold1 sees only fold0's: (1 + a·prior)/(2 + a)
    assert(math.abs(out(("a", 1L))._3 - (1 + a * prior) / (2 + a)) < 1e-12)
    // b/fold0: n_out = 0 -> pure prior (the no-self-leak property);
    // a naive mean encoding would give 1.0 here and leak the labels
    assert(out(("b", 0L))._1 == 0L)
    assert(math.abs(out(("b", 0L))._3 - prior) < 1e-12)
  }

  test("rollingAnomaly: hand-computed z on a planted spike; flat history nulls; leak-free") {
    // key 1: 8 alternating values 10/20 (mean 15, pop std 5), then a 40
    // spike -> z = (40-15)/5 = 5 exactly (fixed-point scale cancels).
    // If the window leaked the current row into its own baseline the
    // mean/std would shift and z would NOT be 5.
    val k1 = (0 until 8).map(i => (1L, i.toLong, 100L + i,
      if (i % 2 == 0) 10.0 else 20.0)) :+ (1L, 8L, 108L, 40.0)
    // key 2: flat history then a spike -> zero variance, z null, no flag
    val k2 = (0 until 8).map(i => (2L, i.toLong, 200L + i, 7.0)) :+
      (2L, 8L, 208L, 99.0)
    val df = (k1 ++ k2).toDF("k", "ts", "eid", "v")
    val out = graft.operators.Features.rollingAnomaly(
      df, "k", "ts", "eid", "v", window = 24, minPrev = 8, zThresh = 3.0)
      .select("eid", "n_prev", "z", "is_anomaly")
      .as[(Long, Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet == Set(108L, 208L), "only rows with a full baseline emit")
    assert(out(108L)._1 == 8L)
    assert(math.abs(out(108L)._2.get - 5.0) < 1e-9, s"z=5 exactly: ${out(108L)}")
    assert(out(108L)._3, "|z|=5 > 3 flags")
    assert(out(208L)._2.isEmpty && !out(208L)._3,
      "flat baseline -> null z, never a fabricated flag")
  }

  test("abUplift: exact per-arm conversion bp against a mirrored assignment") {
    // mirror the operator's md5 assignment so expectations are exact
    def arm(u: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.take(6), 16) % 2 == 0) "A" else "B"
    }
    val users = (1L to 40L)
    // every user views; only users <= 10 buy
    val events = users.map(u => (u, "view")) ++
      users.filter(_ <= 10).map(u => (u, "buy"))
    val df = events.toDF("user_id", "event_type")
    val out = graft.operators.Features.abUplift(df, "user_id", "event_type")
      .collect().map(r => r.getAs[String]("metric") -> r).toMap
    val nA = users.count(arm(_) == "A"); val nB = users.size - nA
    val buyA = users.filter(_ <= 10).count(arm(_) == "A")
    val buyB = 10 - buyA
    val v = out("view")
    assert(v.getAs[Long]("n_users_a") == nA && v.getAs[Long]("n_users_b") == nB)
    assert(v.getAs[Long]("conv_bp_a") == 10000L && v.getAs[Long]("conv_bp_b") == 10000L)
    assert(v.getAs[Long]("uplift_bp") == 0L)
    val b = out("buy")
    assert(b.getAs[Long]("n_conv_a") == buyA && b.getAs[Long]("n_conv_b") == buyB)
    assert(b.getAs[Long]("conv_bp_a") == 10000L * buyA / nA)
    assert(b.getAs[Long]("uplift_bp") ==
      10000L * buyB / nB - 10000L * buyA / nA)
    // srm flag fires exactly when imbalance exceeds the stated tolerance
    assert(v.getAs[Boolean]("srm_flag") ==
      (math.abs(nA - nB) * 10000L > (nA + nB) * 500L))
  }

  test("mannKendall: hand-computed S/ties/z on monotone, reversed, " +
    "constant, and mixed series; gap days zero-fill into the pair set") {
    import spark.implicits._
    def day(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(1970, 1, 1).plusDays(i).atStartOfDay())
    def run(rows: Seq[(String, Int, Double)]) =
      graft.operators.Features.mannKendall(
        rows.map { case (k, i, v) => (k, day(i), v) }.toDF("k", "ts", "v"),
        "k", "ts", "v")
        .as[(String, Long, Long, Long, Option[Long], String)]
        .collect().map(r => r._1 -> r).toMap
    // [1..5]: S = 10, T = 0, var18 = 5·4·15 = 300,
    // z = (10−1)/sqrt(300/18) = 2.2045 -> 2204
    val out = run(
      (0 until 5).map(i => ("up", i, (i + 1) / 100.0)) ++
      (0 until 5).map(i => ("dn", i, (5 - i) / 100.0)) ++
      (0 until 5).map(i => ("ct", i, 0.07)))
    assert(out("up") == (("up", 5L, 10L, 0L, Some(2204L), "trending_up")))
    assert(out("dn") == (("dn", 5L, -10L, 0L, Some(-2205L),
      "trending_down")), s"floor(-2204.5) = -2205: ${out("dn")}")
    // constant: T = n(n-1)(2n+5) exactly cancels var18 -> degenerate
    assert(out("ct")._4 == 300L && out("ct")._5.isEmpty &&
      out("ct")._6 == "degenerate")
    // [1,3,2] in its own run (the grid spans the GLOBAL min..max across
    // keys - the e23 shared-grid law, asserted above by ct's n=5):
    // S = 1, the continuity correction zeroes it -> z = 0
    val mx = run(Seq(("mx", 0, 0.01), ("mx", 1, 0.03), ("mx", 2, 0.02)))
    assert(mx("mx") == (("mx", 3L, 1L, 0L, Some(0L), "no_trend")))
    // a skipped day zero-fills: [5, (0), 6] -> x = [5,0,6]:
    // S = sign(0-5)+sign(6-5)+sign(6-0) = 1
    val gap = run(Seq(("g", 0, 0.05), ("g", 2, 0.06)))
    assert(gap("g")._2 == 3L && gap("g")._3 == 1L,
      s"gap day joined the pair set: ${gap("g")}")
    // one-day global span: zero di<dj pairs exist, so the pair
    // aggregate is EMPTY — the key must still emit the promised
    // degenerate row (s=0, var18 = 1·0·7 − T = 0), not vanish
    val one = run(Seq(("solo", 0, 0.42)))
    assert(one("solo") == (("solo", 1L, 0L, 0L, None, "degenerate")),
      s"single-day span keeps the key: ${one.get("solo")}")
  }

  test("tostEquivalence: hand-replayed Welch chain; equivalence claimed " +
    "only when BOTH one-sided z clear 1.645; degenerate honesty; guards") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long)], margin: Long) =
      graft.operators.Features.tostEquivalence(
        rows.toDF("grp", "a", "v"), "grp", "a", "v", margin)
        .as[(String, Long, Long, Long, Long, Long, Option[Long],
          Option[Long], String)].collect().map(r => r._1 -> r).toMap
    // A=[10,20], B=[12,22], margin 5: means 15/17, each s2/n = 25,
    // se = sqrt(50); z_lo = 7/7.0711 = 0.9899 -> 989, z_up = 3/7.0711
    // -> 424: inconclusive at n=2 (the burden-of-proof property: a
    // failed uplift test would READ as "no difference" here)
    val small = run(Seq(("g", 1L, 10L), ("g", 1L, 20L),
      ("g", 0L, 12L), ("g", 0L, 22L)), 5000L)
    assert(small("g") == (("g", 2L, 2L, 15000L, 17000L, 5000L,
      Some(989L), Some(424L), "not_equivalent")))
    // same per-point spread at n=100/arm: se shrinks ~7x, both sides
    // clear the bar -> equivalent
    val big = (0 until 100).flatMap(i => Seq(
      ("g", 1L, if (i % 2 == 0) 10L else 20L),
      ("g", 0L, if (i % 2 == 0) 10L else 20L)))
    val eq = run(big, 5000L)
    assert(eq("g")._9 == "equivalent" &&
      eq("g")._7 == eq("g")._8, "zero delta: symmetric z")
    assert(eq("g")._7.exists(_ >= 1645L))
    // zero variance in BOTH arms: no se, honest degenerate (never a
    // divide-by-zero infinity smuggled through floor)
    val deg = run(Seq(("d", 1L, 7L), ("d", 1L, 7L),
      ("d", 0L, 7L), ("d", 0L, 7L)), 1000L)
    assert(deg("d")._7.isEmpty && deg("d")._9 == "degenerate")
    // a one-sample arm is degenerate, not a crash
    val one = run(Seq(("o", 1L, 1L), ("o", 1L, 2L), ("o", 0L, 3L)), 1000L)
    assert(one("o")._9 == "degenerate")
    val badM = intercept[IllegalArgumentException] {
      graft.operators.Features.tostEquivalence(
        Seq(("x", 1L, 1L)).toDF("grp", "a", "v"), "grp", "a", "v", 0L)
    }
    assert(badM.getMessage.contains("positive equivalence margin"))
    val badA = intercept[Exception] {
      run(Seq(("x", 2L, 1L), ("x", 0L, 2L)), 1000L)
    }
    assert(badA.getMessage.contains("0/1"))
  }

  test("psiReport: hand-computed contributions; empty-bin clamp; identical windows read zero") {
    // bins=2: ref splits 1/1, cur lands entirely in bin 0 — bin 1 empties
    // on the current side and must take the 1-ppm clamp, not divide by 0
    val ref = Seq(200000L, 700000L).toDF("score")
    val cur = Seq(100000L, 300000L).toDF("score")
    val out = graft.operators.Features.psiReport(ref, cur, "score", bins = 2)
      .orderBy("bin").collect()
    assert(out.length == 2)
    val b0 = out(0); val b1 = out(1)
    assert(b0.getAs[Long]("ref_ppm") == 500000L &&
      b0.getAs[Long]("cur_ppm") == 1000000L)
    assert(b1.getAs[Long]("cur_ppm") == 1L, "empty bin takes the stated clamp")
    val c0 = math.floor((500000.0 - 1000000.0) *
      math.log(500000.0 / 1000000.0)).toLong
    val c1 = math.floor((500000.0 - 1.0) *
      math.log(500000.0 / 1.0)).toLong
    assert(b0.getAs[Long]("psi_contrib_fp") == c0)
    assert(b1.getAs[Long]("psi_contrib_fp") == c1)
    assert(b0.getAs[Long]("psi_total_fp") == c0 + c1)
    // identical windows: every p = q, every ln ratio of 1 -> PSI exactly 0
    val same = graft.operators.Features.psiReport(ref, ref, "score", bins = 2)
      .select("psi_total_fp").collect().map(_.getLong(0))
    assert(same.forall(_ == 0L))
    // out-of-domain scores clamp to the edge bins, never a phantom bin id
    val wild = Seq(-50000L, 2000000L).toDF("score")
    val bins = graft.operators.Features.psiReport(wild, wild, "score", bins = 2)
      .select("bin").collect().map(_.getLong(0)).sorted
    assert(bins.toSeq == Seq(0L, 1L))
  }

  test("ksReport: hand-computed D numerator, argmax location, critical " +
    "line, identical-windows zero, and the loud empty-window failure") {
    // ref = {1,2,3}, cur = {2,3,4,4}: c1 = 1,2,3,3; c2 = 0,1,2,4 over
    // distinct scores 1..4 -> d_num = |c1*4 - c2*3| = 4,5,6,0 -> max 6
    // at s=3; D = 6/12 = 0.5 -> 500000 ppm
    val ref = Seq(1L, 2L, 3L).toDF("score")
    val cur = Seq(2L, 3L, 4L, 4L).toDF("score")
    val r = Features.ksReport(ref, cur, "score")
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    val crit = math.floor(1.3581 *
      math.sqrt((3L + 4L).toDouble / (3L.toDouble * 4L.toDouble)) *
      1000000.0).toLong
    assert(r == ((3L, 4L, 3L, 500000L, crit, 500000L > crit)),
      s"got $r (crit $crit)")
    // identical windows: D = 0, never shifted
    val same = Features.ksReport(ref, ref, "score")
      .select("d_ppm", "shifted").as[(Long, Boolean)].head()
    assert(same == ((0L, false)))
    // empty current window raises loudly through the output columns
    val err = intercept[Exception] {
      Features.ksReport(ref, cur.filter($"score" > 99), "score").collect()
    }
    assert(err.getMessage.contains("window is empty"),
      s"wrong failure: ${err.getMessage}")
  }

  test("seasonalDecompose: a planted exact weekly signal decomposes to " +
    "zero residuals, NULL edges, and the exact phase indices") {
    import java.sql.Timestamp
    // 21 days, one event per day, value = 10 + phase so x = 1000 + 100*p
    // centi exactly; every full 7-window mean is 1300 -> trend 1300000
    // milli, seasonal(p) = 100000*p - 300000 (mean-centred), residual 0
    val days = (1 to 21).map(d => java.time.LocalDate.of(2024, 1, d))
    val rows = days.map { d =>
      val p = (d.toEpochDay % 7).toInt
      ("m", Timestamp.valueOf(d.atStartOfDay()), 10.0 + p)
    }
    val out = Features.seasonalDecompose(rows.toDF("k", "ts", "v"),
        "k", "ts", "v", period = 7)
      .select("day", "x_centi", "trend_milli", "seasonal_milli", "resid_milli")
      .as[(String, Long, Option[Long], Long, Option[Long])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(out.size == 21)
    days.foreach { d =>
      val p = (d.toEpochDay % 7).toInt
      val (x, t, s, r) = out(d.toString)
      assert(x == 1000L + 100L * p, s"$d x")
      assert(s == 100000L * p - 300000L, s"$d seasonal")
      val interior = d.getDayOfMonth >= 4 && d.getDayOfMonth <= 18
      if (interior) assert(t.contains(1300000L) && r.contains(0L),
        s"$d interior: trend/resid ($t, $r)")
      else assert(t.isEmpty && r.isEmpty, s"$d edge must be NULL")
    }
    // a MISSING day becomes an explicit x = 0 grid row, not a skipped
    // window slot
    val gappy = rows.filterNot(_._2.toString.startsWith("2024-01-10"))
    val g = Features.seasonalDecompose(gappy.toDF("k", "ts", "v"),
        "k", "ts", "v", period = 7)
      .select("day", "x_centi").as[(String, Long)].collect().toMap
    assert(g.size == 21 && g("2024-01-10") == 0L)
    // even periods are out of scope, loudly
    assertThrows[IllegalArgumentException] {
      Features.seasonalDecompose(rows.toDF("k", "ts", "v"), "k", "ts", "v",
        period = 6)
    }
  }

  test("cuped: mirrored-arithmetic fixture exact; adjustment moves toward the pooled mean") {
    import java.sql.Timestamp
    def arm(u: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.take(6), 16) % 2 == 0) "A" else "B"
    }
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")
    val post = Timestamp.valueOf("2024-01-20 00:00:00")
    // (user, preValue, postValue): correlated X/Y so theta is nonzero
    val fix = Seq((1L, 10.00, 12.00), (2L, 20.00, 21.00),
      (3L, 30.00, 33.00), (4L, 40.00, 39.00))
    val events = fix.flatMap { case (u, x, y) =>
      Seq((u, pre, x), (u, post, y)) }
    val out = graft.operators.Features.cuped(
        events.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", "2024-01-16 00:00:00")
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    // mirror the whole stated chain in doubles
    val xs = fix.map(f => math.floor(f._2 * 100).toLong)
    val ys = fix.map(f => math.floor(f._3 * 100).toLong)
    val n = 4L
    val (sx, sy) = (xs.sum, ys.sum)
    val (sxx, sxy, syy) = (xs.map(v => v * v).sum,
      xs.zip(ys).map { case (a, b) => a * b }.sum, ys.map(v => v * v).sum)
    val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val meanXAll = sx.toDouble / n.toDouble
    val rho2 = theta * (n * sxy - sx * sy).toDouble / (n * syy - sy * sy).toDouble
    val byArm = fix.groupBy(f => arm(f._1))
    byArm.foreach { case (a, rows) =>
      val na = rows.size.toLong
      val sxa = rows.map(f => math.floor(f._2 * 100).toLong).sum
      val sya = rows.map(f => math.floor(f._3 * 100).toLong).sum
      val adj = sya.toDouble / na.toDouble -
        theta * (sxa.toDouble / na.toDouble - meanXAll)
      val r = out(a)
      assert(r.getAs[Long]("n_users") == na && r.getAs[Long]("sx_fp") == sxa)
      assert(r.getAs[Long]("mean_y_fp") ==
        math.floor(1000000.0 * (sya.toDouble / na.toDouble)).toLong)
      assert(r.getAs[Long]("mean_adj_fp") ==
        math.floor(1000000.0 * adj).toLong)
      assert(r.getAs[Long]("theta_fp") == math.floor(1000000.0 * theta).toLong)
      assert(r.getAs[Long]("var_reduction_bp") ==
        math.floor(10000.0 * rho2).toLong)
    }
    assert(math.floor(1000000.0 * theta).toLong != 0L,
      "fixture must exercise a nonzero adjustment")
  }

  test("skewReport: exact nearest-rank quantiles and salt suggestion") {
    val rows = Seq.fill(8)(1L) ++ Seq.fill(2)(2L) ++ Seq.fill(2)(3L)
    val out = graft.operators.Skew.skewReport(rows.toDF("k"), "k")
      .orderBy("rank").collect()
    assert(out.length == 3)
    val top = out.head
    assert(top.getAs[Long]("key") == 1L && top.getAs[Long]("cnt") == 8L)
    assert(top.getAs[Long]("n_keys") == 3L && top.getAs[Long]("n_rows") == 12L)
    // counts sorted [2,2,8]: p50 at idx 1 → 2; p99 at idx (2*99)div100=1 → 2
    assert(top.getAs[Long]("p50_count") == 2L &&
      top.getAs[Long]("p99_count") == 2L)
    // ceil(8·3/12) = 2 — split the hot key in two
    assert(top.getAs[Long]("suggested_salt") == 2L)
    assert(out(1).getAs[Long]("key") == 2L && out(2).getAs[Long]("key") == 3L,
      "tie on cnt breaks by key ascending")
  }

  test("cusumReport: the prefix identity equals the hand-run Page " +
    "recursion; alarms and first change point land where planted; the " +
    "quiet direction stays at zero") {
    // k: S+ by recursion over x-15: 0,0,10,20,30,25 -> alarms(>12) at
    // orders 4,5,6; downward side strictly negative drift -> silent.
    // m: downward shift fires S- = 0,0,5,10,15 -> one alarm at order 5.
    val r = Seq(
      ("k", 1L, 10L), ("k", 2L, 10L), ("k", 3L, 25L),
      ("k", 4L, 25L), ("k", 5L, 25L), ("k", 6L, 10L),
      ("m", 1L, 10L), ("m", 2L, 10L), ("m", 3L, 0L),
      ("m", 4L, 0L), ("m", 5L, 0L)
    ).toDF("key_in", "ord", "x")
    val out = graft.operators.Features.cusumReport(r, "key_in", "ord", "x",
        upperTarget = 15L, lowerTarget = 5L, h = 12L)
      .collect().map(row => row.getString(0) -> row).toMap
    val k = out("k")
    assert((k.getLong(1), k.getLong(2), k.getLong(3), k.getLong(4),
      k.getLong(5)) == ((6L, 30L, 0L, 3L, 0L)))
    assert(k.getLong(6) == 4L, "first upward alarm at order 4")
    assert(k.isNullAt(7), "no downward alarm -> NULL first_down")
    val m = out("m")
    assert((m.getLong(2), m.getLong(3), m.getLong(5), m.getLong(7)) ==
      ((0L, 15L, 1L, 5L)), "downward stream: S- peaks at 15, S+ silent")
  }

  test("seasonalStrength: hand variances; anti-correlated residual clamps " +
    "at 0; constant deseasonalized series reads NULL; MA edges excluded") {
    import spark.implicits._
    def decomp(rows: Seq[(String, Option[Long], Long, Long)]) =
      rows.toDF("k", "trend_milli", "seasonal_milli", "resid_milli")
    // S=[1,−1], R=[5,−5]: var_sr_num = 2·72 = 144, var_r_num = 2·50 = 100
    // → strength floor(44e6/144) = 305555, ratio floor(100e6/144) = 694444
    val out = graft.operators.Features.seasonalStrength(decomp(Seq(
      ("a", Some(1L), 1L, 5L), ("a", Some(1L), -1L, -5L),
      // S=[1,−1], R=[−2,2]: sr=[−1,1] — var_r_num=16, var_sr_num=4:
      // strength clamps to 0 while the UNCLAMPED ratio reads 4e6 (how
      // anti-seasonal the clamp hid)
      ("b", Some(1L), 1L, -2L), ("b", Some(1L), -1L, 2L),
      // constant sr: var_sr = 0 → NULL
      ("c", Some(1L), 3L, -3L), ("c", Some(1L), 3L, -3L),
      // d: only NULL-trend rows → excluded entirely, no output row
      ("d", None, 9L, 9L))), "k")
      .as[(String, Long, Option[Long], Option[Long], Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set("a", "b", "c"), "edge-only keys drop")
    assert(out("a") == (("a", 2L, Some(694444L),
      Some(305555L), Some(false))))
    assert(out("b")._3.contains(4000000L) && out("b")._4.contains(0L) &&
      out("b")._5.contains(false),
      "anti-correlated residual clamps at the F_s floor; ratio unclamped")
    assert(out("c")._3.isEmpty && out("c")._4.isEmpty && out("c")._5.isEmpty,
      "zero deseasonalized variance: honest NULL")
    // a perfect weekly signal through the REAL decomposition: residuals
    // vanish, strength reads exactly 1e6
    val days = (0 until 28).map { i =>
      ("w", java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(1970, 1, 1).plusDays(i).atStartOfDay()),
        (10 + (i % 7)).toDouble / 100.0)
    }.toDF("k", "ts", "v")
    val full = graft.operators.Features.seasonalStrength(
      graft.operators.Features.seasonalDecompose(days, "k", "ts", "v", 7),
      "k").as[(String, Long, Option[Long], Option[Long], Option[Boolean])]
      .collect().head
    assert(full._3.contains(0L) && full._4.contains(1000000L) &&
      full._5.contains(true),
      "exact weekly signal: zero residual, strength exactly 1")
  }

  test("holtWinters: hand-replayed recursion at period 2 (every state " +
    "step); seed rows honest NULL; gap days zero-fill; guards are loud") {
    import spark.implicits._
    def day(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(1970, 1, 1).plusDays(i).atStartOfDay())
    // m=2, α=.5, β=0, γ=.5; x(centi) = 10,30,20,40,10:
    // l0=20000m b0=0 s=[-10000,10000]
    // t=2: fc=10000 resid=10000 -> l=25000 s0=-5000
    // t=3: fc=35000 resid=5000  -> l=27500 s1=12500
    // t=4: fc=22500 resid=-12500 -> l=21250 s0=-11250
    val df = Seq((0, 0.1), (1, 0.3), (2, 0.2), (3, 0.4), (4, 0.1))
      .map { case (i, v) => ("k", day(i), v) }.toDF("k", "ts", "v")
    val out = graft.operators.Features.holtWinters(df, "k", "ts", "v",
        period = 2, alphaPpm = 500000L, betaPpm = 0L, gammaPpm = 500000L)
      .orderBy("day")
      .as[(String, String, Long, Option[Long], Option[Long], Option[Long],
        Option[Long])].collect()
    assert(out.length == 5)
    assert(out(0) == (("k", "1970-01-01", 10L, None, None, None, None)) &&
      out(1)._4.isEmpty, "seed season rows are honest NULLs")
    assert(out(2) == (("k", "1970-01-03", 20L, Some(10000L), Some(10000L),
      Some(25000L), Some(0L))))
    assert(out(3) == (("k", "1970-01-04", 40L, Some(35000L), Some(5000L),
      Some(27500L), Some(0L))))
    assert(out(4) == (("k", "1970-01-05", 10L, Some(22500L), Some(-12500L),
      Some(21250L), Some(0L))))
    // a skipped calendar day becomes an explicit x=0 grid row
    val gap = graft.operators.Features.holtWinters(
      Seq(("g", day(0), 0.1), ("g", day(2), 0.1)).toDF("k", "ts", "v"),
      "k", "ts", "v", period = 2)
      .orderBy("day").as[(String, String, Long, Option[Long], Option[Long],
        Option[Long], Option[Long])].collect()
    assert(gap.map(_._3).toSeq == Seq(10L, 0L, 10L))
    // span not exceeding the seed season: no model, loud
    val tiny = intercept[Exception] {
      graft.operators.Features.holtWinters(
        Seq(("t", day(0), 0.1), ("t", day(1), 0.1)).toDF("k", "ts", "v"),
        "k", "ts", "v", period = 2).collect()
    }
    assert(tiny.getMessage.contains("seed season IS the model init"))
    // fixed-point headroom: |milli| past 1e12 raises, never wraps
    val big = intercept[Exception] {
      graft.operators.Features.holtWinters(
        (0 to 2).map(i => ("b", day(i), 2e10)).toDF("k", "ts", "v"),
        "k", "ts", "v", period = 2).collect()
    }
    assert(big.getMessage.contains("past 1e15"))
  }

  test("benfordReport: a near-Benford multinomial conforms, a flat one " +
    "rejects; zeros/negatives counted as skipped; guards are loud") {
    import spark.implicits._
    def vals(counts: Seq[(Long, Int)], extra: Seq[Long] = Nil) =
      (counts.flatMap { case (v, c) => Seq.fill(c)(v) } ++ extra).toDF("x")
    // first-digit histogram [30,18,12,10,8,7,6,5,4] over n=100 tracks
    // log10(1+1/d) closely: chi2 lands ~0.15 (150k micro), well under
    // the df=8 critical 15.507
    val good = graft.operators.Features.benfordReport(
      vals(Seq(1L -> 30, 2L -> 18, 3L -> 12, 4L -> 10, 5L -> 8, 6L -> 7,
        7L -> 6, 8L -> 5, 9L -> 4)), "x").collect()
    assert(good.forall(_.getBoolean(9)), "near-Benford: conformant")
    assert(good.map(_.getInt(0)).sorted.toSeq == (1 to 9),
      "one row per digit")
    // flat digits: the fabrication signature
    val flat = graft.operators.Features.benfordReport(
      vals((1L to 9L).map(_ -> 12)), "x").collect()
    assert(flat.forall(!_.getBoolean(9)), "uniform digits: rejected")
    // multi-digit values take their DECIMAL first digit; skips counted
    val skip = graft.operators.Features.benfordReport(
      vals(Seq(9000L -> 5, 123L -> 5), extra = Seq(0L, -7L)), "x")
      .collect()
    assert(skip.forall(_.getLong(6) == 2L), "two skipped values")
    assert(skip.find(_.getInt(0) == 9).get.getLong(1) == 5L &&
      skip.find(_.getInt(0) == 1).get.getLong(1) == 5L)
    val empty = intercept[Exception] {
      graft.operators.Features.benfordReport(vals(Nil, Seq(0L)), "x")
        .collect()
    }
    assert(empty.getMessage.contains("no distribution to audit"))
    val frac = intercept[Exception] {
      graft.operators.Features.benfordReport(Seq(1.5).toDF("x"), "x")
    }
    assert(frac.getMessage.contains("integral"))
  }

  test("acfReport: hand-computed n²-scaled covariance ratios; gap " +
    "honesty via n_pairs; constant series reads NULL; guards are loud") {
    // x = [2,4,6,8]: S=20, n=4, dev = n·x−S = [−12,−4,4,12], den = 320
    // lag1 num = 48−16+48 = 80 → (80+320)·1e6/640 = 625000
    // lag2 num = −48−48 = −96 → (320−96)·1e6/640 = 350000
    val s = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L), ("a", 4L, 8L))
      .toDF("k", "t", "x")
    val out = graft.operators.Features.acfReport(s, "k", "t", "x", maxLag = 2)
      .as[(String, Int, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(out == Map(1 -> ((4L, 3L, Some(625000L))),
      2 -> ((4L, 2L, Some(350000L)))))
    // a gap at t=3 drops exactly the pairs that touch it
    val gap = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("a", 4L, 8L))
      .toDF("k", "t", "x")
    val g = graft.operators.Features.acfReport(gap, "k", "t", "x", 1)
      .as[(String, Int, Long, Long, Option[Long])].collect().head
    assert(g._3 == 3L && g._4 == 1L, "one surviving lag-1 pair")
    // constant series: variance 0, ACF undefined
    val const = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L))
      .toDF("k", "t", "x")
    val c = graft.operators.Features.acfReport(const, "k", "t", "x", 1)
      .as[(String, Int, Long, Long, Option[Long])].collect().head
    assert(c._5.isEmpty, "den = 0 reads honest NULL")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Features.acfReport(s, "k", "t", "x", 0)
    }
    assert(e1.getMessage.contains("maxLag >= 1"))
    val e2 = intercept[Exception] {
      graft.operators.Features.acfReport(
        Seq(("a", 1L, 0.5)).toDF("k", "t", "x"), "k", "t", "x", 1)
    }
    assert(e2.getMessage.contains("integral"))
  }

  test("chi2Report: hand-computed statistic, identical-window zero, " +
    "new-category verdict, loud empty-window and df guards") {
    def win(cats: (String, Int)*) =
      cats.flatMap { case (c, n) => Seq.fill(n)(c) }.toDF("cat")
    // ref x8 y2 vs cur x4 y6: (4-8)^2/8 + (6-2)^2/2 = 2 + 8 = 10 exactly
    val drifted = graft.operators.Features
      .chi2Report(win("x" -> 8, "y" -> 2), win("x" -> 4, "y" -> 6), "cat")
      .collect().head
    assert((drifted.getLong(0), drifted.getLong(1), drifted.getLong(2),
      drifted.getLong(3), drifted.getLong(5), drifted.getLong(6),
      drifted.getLong(7), drifted.getBoolean(8)) ==
      ((10L, 10L, 2L, 0L, 1L, 10000000L, 3841000L, true)),
      "chi2_micro 10e6 vs df=1 crit 3.841e6: drifted")
    // identical windows: statistic exactly 0 (no floor loss here), quiet
    val quiet = graft.operators.Features
      .chi2Report(win("x" -> 8, "y" -> 2), win("x" -> 8, "y" -> 2), "cat")
      .collect().head
    assert(quiet.getLong(6) == 0L && !quiet.getBoolean(8))
    // a category unseen in ref forces the verdict regardless of the sum
    val newCat = graft.operators.Features
      .chi2Report(win("x" -> 8, "y" -> 2), win("x" -> 4, "y" -> 2, "z" -> 4),
        "cat").collect().head
    assert((newCat.getLong(3), newCat.getLong(4), newCat.getLong(6),
      newCat.getBoolean(8)) == ((1L, 4L, 2000000L, true)),
      "new_cats=1, new_mass=4, exact -Ct+2·new_mass correction, drifted")
    val empty = intercept[Exception] {
      graft.operators.Features
        .chi2Report(win("x" -> 8), win("x" -> 1)
          .filter(org.apache.spark.sql.functions.col("cat") === "q"),
          "cat").collect()
    }
    assert(empty.getMessage.contains("empty window"))
    val df0 = intercept[Exception] {
      graft.operators.Features
        .chi2Report(win("x" -> 8), win("x" -> 8), "cat").collect()
    }
    assert(df0.getMessage.contains("one-category reference has no test"))
    val dfBig = intercept[Exception] {
      val many = (1 to 40).map(i => s"c$i" -> 2)
      graft.operators.Features
        .chi2Report(win(many: _*), win(many: _*), "cat").collect()
    }
    assert(dfBig.getMessage.contains("critical table stops at 30"))
  }
}
