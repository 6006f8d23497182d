package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WinnowExpressions
import graft.operators.Winnow

/** Semantic properties of winnowing fingerprints: the t39/t40 oracles prove
  * engine-equivalence; this proves the kernel IS winnowing — equal to an
  * independent brute-force reference (direct per-window scan, no deque, no
  * rolling hash), honoring the SIGMOD'03 guarantee, and surfacing planted
  * shared passages through matchPairs. */
class WinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val K = 5; private val W = 16
  private val B = WinnowExpressions.HashBase
  private val M = WinnowExpressions.HashMod

  /** Brute reference: direct (non-rolling) hashes, per-window linear min
    * scan with explicit rightmost-tie choice, set-dedupe at the end. */
  private def brute(s: String, k: Int = K, w: Int = W): Seq[(Long, Long)] = {
    val cs = s.codePoints().toArray.map(_.toLong)
    val nh = cs.length - k + 1
    if (nh <= 0) return Seq.empty
    val h = (0 until nh).map(i =>
      (i until i + k).foldLeft(0L)((a, j) => (a * B + cs(j)) % M))
    val starts = if (nh >= w) 0 until (nh - w + 1) else Seq(0)
    starts.map { t =>
      val win = h.slice(t, math.min(t + w, nh))
      val mn = win.min
      val pos = t + win.lastIndexOf(mn)
      (pos.toLong, mn)
    }.distinct.sortBy(_._1)
  }

  private def kernel(s: String): Seq[(Long, Long)] =
    WinnowExpressions.winnowPacked(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), K, W)
      .toSeq.map(p => (p >> 31, p & (WinnowExpressions.PosPack - 1)))

  test("kernel equals the brute-force reference on random unicode text") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdefgh éü—文字 "
    for (len <- Seq(0, 3, 5, 12, 20, 64, 500); trial <- 1 to 5) {
      val s = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(kernel(s) == brute(s), s"len=$len trial=$trial s=$s")
    }
  }

  test("winnowing guarantee: shared passage of length ≥ w+k−1 ⇒ shared fingerprint") {
    val rnd = new scala.util.Random(13)
    def rand(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val passage = rand(W + K - 1) // minimal guaranteed length
    for (_ <- 1 to 10) {
      val a = rand(40) + passage + rand(40)
      val b = rand(40) + passage + rand(40)
      val shared = kernel(a).map(_._2).toSet intersect kernel(b).map(_._2).toSet
      assert(shared.nonEmpty, s"guarantee violated for passage=$passage")
    }
  }

  test("short docs: one fingerprint when k ≤ len < k+w−1; none below k") {
    assert(kernel("abcd").isEmpty)            // len < k
    assert(kernel("abcde").size == 1)         // exactly one k-gram
    assert(kernel("abcdefghij").size == 1)    // nh < w → one window
  }

  test("matchPairs surfaces a planted shared passage and caps stop-fingerprints") {
    val rnd = new scala.util.Random(17)
    def rand(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val passage = rand(80)
    val docs = ((0 until 20).map(i => (i.toLong, rand(200))) ++
      Seq((100L, rand(50) + passage + rand(50)),
          (101L, rand(50) + passage + rand(50)))).toDF("doc_id", "text")
    val pairs = Winnow.matchPairs(docs, "doc_id", "text", minShared = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)).contains((100L, 101L)))
    // every surviving pair must share ≥ minShared fingerprints by definition
    assert(pairs.forall(_._3 >= 2))
  }
}
