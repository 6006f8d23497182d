package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, ImageCodec}

/** Property-based invariants for the round-8 dedup arms:
  * stream-vs-batch paragraph-dedup equivalence over RANDOM corpora and
  * RANDOM shard splits (the rebuild-equivalence claim, fuzzed), and dHash
  * downsample invariance over random bit patterns and scales. Seeded Gen
  * sampling, same bridge-free pattern as ChunkerPropSpec. */
class DedupPropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val params = Gen.Parameters.default
  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(params, Seed(seed)).get

  // documents over a small word pool -> heavy cross-doc paragraph overlap
  private val wordPool = Vector("alpha", "beta", "gamma", "delta", "eps")
  private val docGen: Gen[String] =
    Gen.listOfN(12, Gen.oneOf(wordPool)).map(_.mkString(" "))

  private def paras = (c: org.apache.spark.sql.Column) =>
    Dedup.tokenWindowParagraphs(c, 3)

  test("paragraph dedup: streamed shards == batch rerun for random corpora and splits") {
    import spark.implicits._
    (0 until 8).foreach { trial =>
      val n = 6 + sample(Gen.choose(0, 8), trial * 31L)
      val docs = (0 until n).map(i =>
        (i.toLong, sample(docGen, trial * 1000L + i)))
      // random split point, shards processed in id order
      val cut = sample(Gen.choose(1, n - 1), trial * 77L)
      val all = docs.toDF("doc_id", "text")
      val s1 = docs.filter(_._1 < cut).toDF("doc_id", "text")
      val s2 = docs.filter(_._1 >= cut).toDF("doc_id", "text")

      val empty = Dedup.paragraphIndex(Seq.empty[(Long, String)]
        .toDF("doc_id", "text"), "doc_id", "text", paras)
      val out1 = Dedup.paragraphDedupAgainst(s1, empty, "doc_id", "text", paras)
      val idx1 = empty.unionByName(
        Dedup.paragraphIndexDelta(s1, empty, "doc_id", "text", paras))
        .localCheckpoint()
      val out2 = Dedup.paragraphDedupAgainst(s2, idx1, "doc_id", "text", paras)
      val streamed = out1.unionByName(out2).orderBy("id")
        .collect().map(_.toSeq).toSeq
      val batch = Dedup.paragraphDedup(all, "doc_id", "text", paras)
        .orderBy("id").collect().map(_.toSeq).toSeq
      assert(streamed == batch,
        s"trial $trial (n=$n cut=$cut): streamed != batch\n$streamed\nvs\n$batch")
    }
  }

  test("dHash: downsample invariance for random bit patterns at random scales") {
    (0 until 20).foreach { trial =>
      val bits = sample(Gen.choose(0L, (1L << 60) - 1), trial * 13L)
      val scale = sample(Gen.choose(2, 6), trial * 7L)
      val base = staircase(bits, 1)
      val scaled = staircase(bits, scale)
      assert(ImageCodec.dHash(base) == Some(bits),
        s"trial $trial: base hash != encoded bits")
      assert(ImageCodec.dHash(scaled) == Some(bits),
        s"trial $trial: scale=$scale broke downsample invariance")
    }
  }

  private def staircase(bits: Long, scale: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9 * scale, 8 * scale,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8) {
      var v = 128
      for (x <- 0 until 9) {
        if (x > 0) v += (if (((bits >> (y * 8 + (x - 1))) & 1L) == 1L) 10 else -10)
        for (sy <- 0 until scale; sx <- 0 until scale)
          img.setRGB(x * scale + sx, y * scale + sy,
            (v << 16) | (v << 8) | v)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
