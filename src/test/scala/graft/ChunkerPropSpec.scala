package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Chunker

/** Property-based invariants for the recursive splitter over arbitrary
  * texts: lossless reassembly at overlap=0, bounded chunk sizes, no empty
  * chunks, and overlap stitching preserving the previous chunk's suffix.
  * (Seeded Gen sampling — the scalatest/scalacheck bridge isn't on the
  * classpath, scalacheck itself is.)
  */
class ChunkerPropSpec extends AnyFunSuite {

  // text shaped like prose: words, newlines, paragraph breaks, sentences
  private val piece = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)), Gen.const(" "), Gen.const(". "),
    Gen.const("\n"), Gen.const("\n\n"))
  private val textGen: Gen[String] =
    Gen.listOfN(80, piece).map(_.mkString).map(_.take(400))

  private val params = Gen.Parameters.default
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(params, Seed(i.toLong)))

  private val cases: Seq[(String, Int, Int)] = {
    val texts = samples(textGen, 60)
    val sizes = samples(Gen.choose(8, 60), 60)
    val ovs = samples(Gen.choose(0, 7), 60)
    texts.lazyZip(sizes).lazyZip(ovs).toSeq
  }

  test("overlap=0: chunks reassemble to the original text exactly") {
    cases.foreach { case (t, size, _) =>
      val chunks = Chunker.splitText(t, size, 0)
      assert(chunks.mkString == t, s"lossy for size=$size text=${t.take(60)}…")
      assert(chunks.forall(_.nonEmpty))
    }
  }

  test("chunk length never exceeds chunkSize + overlap") {
    cases.foreach { case (t, size, ov) =>
      val chunks = Chunker.splitText(t, size, ov)
      assert(chunks.forall(_.length <= size + ov),
        s"oversized chunk for size=$size ov=$ov: ${chunks.map(_.length)}")
    }
  }

  test("overlap stitching: chunk i = suffix(base chunk i-1) + base chunk i") {
    cases.filter(_._3 > 0).foreach { case (t, size, ov) =>
      val base = Chunker.splitText(t, size, 0)
      val withOv = Chunker.splitText(t, size, ov)
      assert(withOv.length == base.length)
      if (base.nonEmpty) {
        assert(withOv.head == base.head)
        base.sliding(2).zip(withOv.drop(1).iterator).foreach {
          case (Seq(prev, cur), stitched) =>
            assert(stitched == prev.takeRight(ov) + cur)
          case _ => ()
        }
      }
    }
  }
}
