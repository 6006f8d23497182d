package graft

import java.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FdeEncoder

/** FDE (MUVERA) properties: determinism, shape, and — the point of the
  * encoding — dot(fde_q, fde_d) approximating exact MaxSim well enough to
  * rank a planted near-neighbor first (two-phase Q5 retrieval relies on
  * exactly this). */
class FdeEncoderSpec extends AnyFunSuite {

  private val dim = 64
  private val enc = FdeEncoder(inputDim = dim, reps = 8, ksim = 3, projDim = 8)

  private def randVecs(n: Int, seed: Long): Seq[Array[Float]] = {
    val r = new Random(seed)
    Seq.fill(n)(normalize(Array.fill(dim)(r.nextGaussian().toFloat)))
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  private def addNoise(v: Array[Float], eps: Float, r: Random): Array[Float] =
    normalize(v.zip(Array.fill(dim)(r.nextGaussian().toFloat)).map {
      case (x, g) => x + eps * g
    })

  private def maxSim(doc: Seq[Array[Float]], q: Seq[Array[Float]]): Double =
    q.map(qv => doc.map(dv =>
      qv.zip(dv).map { case (a, b) => a.toDouble * b }.sum).max).sum

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y }.sum

  test("deterministic across instances") {
    val vs = randVecs(4, 7)
    val a = FdeEncoder(dim, 8, 3, 8).encode(vs, isQuery = false)
    val b = FdeEncoder(dim, 8, 3, 8).encode(vs, isQuery = false)
    assert(a.toSeq == b.toSeq)
    assert(a.length == enc.outputDim)
  }

  test("FDE dot ranks the planted near-duplicate doc first") {
    val r = new Random(99)
    val query = randVecs(4, 11)
    // doc 0 = query + small noise; docs 1..9 random
    val docs = (addNoise(query.head, 0.1f, r) +: query.tail.map(addNoise(_, 0.1f, r))) +:
      (1 to 9).map(i => randVecs(4, 100 + i))
    val qf = enc.encode(query, isQuery = true)
    val scores = docs.map(d => dot(enc.encode(d, isQuery = false), qf))
    assert(scores.zipWithIndex.maxBy(_._1)._2 == 0, s"scores=$scores")
  }

  test("FDE scores correlate with exact MaxSim across noise levels") {
    val r = new Random(5)
    val query = randVecs(4, 21)
    val eps = Seq(0.05f, 0.2f, 0.5f, 1.0f, 2.0f)
    val docs = eps.map(e => query.map(addNoise(_, e, r)))
    val qf = enc.encode(query, isQuery = true)
    val fde = docs.map(d => dot(enc.encode(d, isQuery = false), qf))
    val exact = docs.map(d => maxSim(d, query))
    // exact MaxSim is strictly monotonic in noise; the FDE sketch (reps=8)
    // is a noisy estimator, so assert the retrieval-relevant property:
    // the nearest doc ranks first and near/far are cleanly separated.
    assert(exact.zip(exact.tail).forall { case (a, b) => a > b })
    assert(fde.head == fde.max, s"nearest doc not ranked first: $fde")
    assert(fde.take(2).min > fde.takeRight(2).max,
      s"near/far not separated: $fde")
  }
}
