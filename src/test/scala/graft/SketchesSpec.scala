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
}
