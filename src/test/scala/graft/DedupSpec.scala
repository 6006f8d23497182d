package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Detection-quality properties for the dedup family: a planted near-dup
  * pair must surface (and unrelated docs must not) — the DuckDB oracles
  * prove engine-equivalence, this proves the operators actually catch dups.
  */
class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def randText(): String =
    Seq.fill(60)(rnd.alphanumeric.take(2 + rnd.nextInt(6)).mkString).mkString(" ")

  // 20 unrelated docs + a planted pair: doc 100 and doc 101 differ by one word
  private val base = randText()
  private def corpus = ((0 until 20).map(i => (i.toLong, randText())) ++
    Seq((100L, base), (101L, base.replaceFirst(" ", " EDIT ")))).toDF("doc_id", "text")

  test("minhashLshPairs surfaces the planted near-dup, not random pairs") {
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
      shingleSize = 5, numHashes = 16, bands = 4, minEst = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((100L, 101L)))
    assert(pairs.head._3 >= 0.5)
  }

  test("simhashNearDups surfaces the planted near-dup under Hamming <= 3") {
    val pairs = Dedup.simhashNearDups(corpus, "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((100L, 101L)))
  }

  test("exactGroups groups exact copies only") {
    val withCopy = corpus.union(Seq((102L, base)).toDF("doc_id", "text"))
    val groups = Dedup.exactGroups(withCopy, "doc_id", "text")
      .select("canonical_id", "dup_count").as[(Long, Long)].collect().toSeq
    assert(groups == Seq((100L, 2L))) // 100 & 102 exact; 101 differs
  }

  test("embeddingLshPairs surfaces a planted near-identical embedding pair") {
    val r = new scala.util.Random(11)
    def vec() = Array.fill(64)(r.nextGaussian().toFloat)
    val base = vec()
    val nearDup = base.clone(); nearDup(5) = nearDup(5) + 0.01f
    val rows = ((0 until 30).map(i => (i.toLong, vec().toSeq)) ++
      Seq((100L, base.toSeq), (101L, nearDup.toSeq))).toDF("vec_id", "embedding")
    val pairs = graft.operators.Dedup.embeddingLshPairs(
      rows, "vec_id", "embedding", dim = 64, blocks = 4, minCosine = 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((100L, 101L)))
  }

  test("minhashLshKeepList labels a dup cluster by its min id, pair-free") {
    val keep = Dedup.minhashLshKeepList(
      corpus.union(Seq((102L, base)).toDF("doc_id", "text")),
      "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(keep(100L) == 100L && keep(101L) == 100L && keep(102L) == 100L)
    assert(keep(3L) == 3L) // unrelated doc keeps itself
  }
}
