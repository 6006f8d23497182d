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

  /** 60-bit KMV hash of a key — the operator's md5 prefix arithmetic. */
  private def kmvHash(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"kmv:$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Pure-Scala single-level bottom-k replay of the full pair estimate —
    * also the two-level == single-level equivalence gate (the operator
    * ranks within 64 salt buckets first; a global top-k element always
    * survives its bucket's cut, so the results must be identical). */
  private def kmvReplay(a: Seq[String], b: Seq[String],
                        k: Int): (Long, Long, Long, Long, Long, Long, Long) = {
    val big = BigInt(k - 1) * (BigInt(1) << 60)
    def est(sk: Vector[Long]): Long =
      if (sk.length < k) sk.length.toLong else (big / sk.max).toLong
    val sa = a.distinct.map(kmvHash).sorted.take(k).toVector
    val sb = b.distinct.map(kmvHash).sorted.take(k).toVector
    val merged = (sa ++ sb).distinct.sorted.take(k).toVector
    val rho = merged.count(h => sa.contains(h) && sb.contains(h)).toLong
    val kk = merged.length.toLong
    val uEst = est(merged)
    (est(sa), est(sb), uEst, rho * uEst / kk, rho * 1000000L / kk,
      kk, rho)
  }

  private def runKmv(rows: Seq[(String, String)], k: Int) =
    Sketches.kmvOverlap(rows.toDF("corpus", "key"), "corpus", "key", k)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long,
        Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))

  test("kmvOverlap: exhaustive branch is exact — hand-computed 10/10/5 " +
    "overlap at k=16 reads its true sizes and zero union error") {
    val a = (1 to 10).map(i => ("a", s"x$i"))
    val b = (6 to 15).map(i => ("b", s"x$i"))
    val out = runKmv(a ++ b, k = 16)
    assert(out.length == 1)
    val r = out.head
    // (ca cb k naE naX nbE nbX uE uX iE iX jE jX err)
    assert(r == (("a", "b", 16L, 10L, 10L, 10L, 10L, 15L, 15L, 5L, 5L,
      333333L, 333333L, 0L)), s"got $r")
  }

  test("kmvOverlap: estimation branch == independent MessageDigest " +
    "bottom-k replay (also the two-level rank equivalence gate), and " +
    "duplication-invariant") {
    val a = (1 to 400).map(i => ("A", s"ka$i")) ++
      (1 to 100).map(i => ("A", s"shared$i"))
    val b = (1 to 200).map(i => ("B", s"kb$i")) ++
      (1 to 100).map(i => ("B", s"shared$i"))
    val (naE, nbE, uE, iE, jE, _, _) =
      kmvReplay(a.map(_._2), b.map(_._2), 16)
    val out = runKmv(a ++ b, k = 16)
    assert(out.length == 1)
    val r = out.head
    assert((r._4, r._6, r._8, r._10, r._12) == ((naE, nbE, uE, iE, jE)),
      s"replay ($naE,$nbE,$uE,$iE,$jE) vs $r")
    assert((r._5, r._7, r._9, r._11) == ((500L, 300L, 700L, 100L)),
      "exact twins: |A|=500, |B|=300, union 700, inter 100")
    assert(r._13 == 100L * 1000000L / 700L, "exact jaccard ppm")
    val dup = runKmv(a ++ b ++ a ++ b, k = 16)
    assert(dup.toSeq == out.toSeq, "bottom-k of distinct hashes: " +
      "duplicate rows change nothing")
  }

  test("kmvOverlap: three corpora emit all three ordered pairs; guards " +
    "are loud") {
    val rows = for (c <- Seq("c0", "c1", "c2"); i <- 1 to 30)
      yield (c, s"$c-$i")
    val shared = (1 to 10).flatMap(i =>
      Seq(("c0", s"s$i"), ("c1", s"s$i"), ("c2", s"s$i")))
    // k=128 keeps even the pairwise unions (70 distinct) exhaustive —
    // at k=64 a 70-key union correctly rides the estimation branch
    val out = runKmv(rows ++ shared, k = 128)
    assert(out.map(r => (r._1, r._2)).toSeq ==
      Seq(("c0", "c1"), ("c0", "c2"), ("c1", "c2")))
    out.foreach { r =>
      assert((r._5, r._7, r._11) == ((40L, 40L, 10L)),
        s"exhaustive twins per pair: $r")
      assert(r._10 == 10L && r._9 == 70L, s"exact branch estimates: $r")
    }
    val badK = intercept[IllegalArgumentException] {
      Sketches.kmvOverlap(Seq(("a", "x")).toDF("corpus", "key"),
        "corpus", "key", k = 8)
    }
    assert(badK.getMessage.contains("k in [16, 4096]"))
    val badType = intercept[IllegalArgumentException] {
      Sketches.kmvOverlap(Seq(("a", 1L)).toDF("corpus", "key"),
        "corpus", "key")
    }
    assert(badType.getMessage.toLowerCase.contains("string"))
  }
}
