package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** HLL cardinality: the kernel must equal an independent MessageDigest
  * replay register-for-register, be duplication-invariant (the mergeable
  * max property), and land inside the published error bound on both the
  * raw and linear-counting branches. */
class SketchesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Pure-Scala replay of the operator's exact arithmetic. */
  private def replay(name: String, keys: Seq[String]): (Long, Long, Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = Array.fill(256)(0L)
    keys.foreach { k =>
      val hex = md.digest(s"hll:$name:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val reg = Integer.parseInt(hex.substring(0, 2), 16)
      val w = java.lang.Long.parseLong(hex.substring(2, 15), 16)
      val rho = if (w == 0) 53L else 53L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      regs(reg) = math.max(regs(reg), rho)
    }
    val t = regs.map(mj => 1L << (53 - mj)).sum
    val vZero = regs.count(_ == 0L).toLong
    val rawEst = ((BigInt(1846528L) * 256 * 256 * (BigInt(1) << 53)) /
      (BigInt(2570790L) * t)).toLong
    val est = if (rawEst <= 640 && vZero > 0)
      math.floor(256.0 * math.log(256.0 / vZero)).toLong else rawEst
    (t, vZero, rawEst, est)
  }

  private def run(keys: Seq[String]): (Long, Long, Long, Long, Long, Long) = {
    val out = Sketches.hllCardinality(
        keys.map(("c", _)).toDF("name", "k"), "name", "k")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1)
    val r = out.head
    (r._2, r._3, r._4, r._5, r._6, r._7) // v_zero, t, raw, est, exact, err
  }

  test("hllCardinality == independent MessageDigest replay, register " +
    "state and both estimate branches") {
    val small = (1 to 40).map(i => s"key$i")
    val (t, v, raw, est) = replay("c", small)
    val (vz, ts, re, e, exact, _) = run(small)
    assert((ts, vz, re, e) == ((t, v, raw, est)))
    assert(exact == 40L)
    assert(re <= 640 && vz > 0, "small set exercises the LC branch")
    val big = (1 to 5000).map(i => s"key$i")
    val (t2, v2, raw2, est2) = replay("c", big)
    val (vz2, ts2, re2, e2, exact2, err2) = run(big)
    assert((ts2, vz2, re2, e2) == ((t2, v2, raw2, est2)))
    assert(e2 == re2, "5000 keys take the raw branch")
    assert(exact2 == 5000L)
    assert(err2 < 200000L, "inside ~3 sigma of the 6.5% m=256 bound")
  }

  test("hllCardinality is duplication-invariant: registers are maxes, so " +
    "feeding every key twice changes nothing") {
    val keys = (1 to 300).map(i => s"dup$i")
    val once = run(keys)
    val twice = run(keys ++ keys)
    assert((once._1, once._2, once._3, once._4) ==
      ((twice._1, twice._2, twice._3, twice._4)))
  }

  test("hllCardinality: linear-counting estimate is near-exact on tiny " +
    "cardinalities where raw HLL is badly biased") {
    val keys = (1 to 10).map(i => s"tiny$i")
    val (_, _, _, e, exact, _) = run(keys)
    assert(math.abs(e - exact) <= 1, s"LC est $e vs exact $exact")
  }

  test("hdrQuantiles: hand-computed buckets at p=3; nearest-rank read-out; " +
    "error-bound law against exact percentiles; guards are loud") {
    // key a = [1..10], p=3: v<8 exact (e=0); 8,9 -> bucket (e=1,m=4),
    // 10 -> (1,5). n=10. p50 r=5 -> (0,5): est 5 err 0 (exact branch);
    // p90 r=9 -> (1,4): est 8 err 1 (true 9 inside [8,9]);
    // p99 r=10 -> (1,5): est 10 err 1.
    val out = Sketches.hdrQuantiles(
        (1L to 10L).map(("a", _)).toDF("k", "v"), "k", "v",
        precisionBits = 3)
      .as[(String, Long, Long, Long, Long)]
      .collect().map(r => r._2 -> r).toMap
    assert(out(50L) == (("a", 50L, 10L, 5L, 0L)), s"p50: ${out(50L)}")
    assert(out(90L) == (("a", 90L, 10L, 8L, 1L)), s"p90: ${out(90L)}")
    assert(out(99L) == (("a", 99L, 10L, 10L, 1L)), s"p99: ${out(99L)}")
    // bound law on a spread fixture: est <= exact nearest-rank <= est+err
    // for every (key, q) at the registry's p=7
    val vals = (0 until 500).map(i =>
      (s"k${i % 3}", (i.toLong * i * 7919 + 13) % 1000003))
    val got = Sketches.hdrQuantiles(vals.toDF("k", "v"), "k", "v")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length == 9, "3 keys x 3 quantiles")
    got.foreach { case (k, q, n, est, err) =>
      val sorted = vals.filter(_._1 == k).map(_._2).sorted
      assert(n == sorted.length)
      val r = ((q * n + 99) / 100).toInt
      val exact = sorted(r - 1)
      assert(est <= exact && exact <= est + err,
        s"($k, p$q): est $est exact $exact err $err")
    }
    val neg = intercept[Exception] {
      Sketches.hdrQuantiles(Seq(("a", -1L)).toDF("k", "v"), "k", "v")
        .collect()
    }
    assert(neg.getMessage.contains("negative"))
    val e1 = intercept[IllegalArgumentException] {
      Sketches.hdrQuantiles(Seq(("a", 1L)).toDF("k", "v"), "k", "v",
        precisionBits = 1)
    }
    assert(e1.getMessage.contains("precisionBits"))
    val e2 = intercept[IllegalArgumentException] {
      Sketches.hdrQuantiles(Seq(("a", 1L)).toDF("k", "v"), "k", "v",
        quantilesPct = Seq(0))
    }
    assert(e2.getMessage.contains("quantiles"))
  }
}
