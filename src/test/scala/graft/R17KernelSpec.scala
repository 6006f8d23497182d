package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 optimization round: the compiled kernels that replaced interpreted
  * HOF formulations must be VALUE-IDENTICAL to the expressions they
  * replaced. Each test evaluates the old collection-expression form and
  * the new kernel side by side on the same rows and requires exact
  * equality (same arithmetic order, same tie-breaks, same null behavior).
  */
class R17KernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 4f - 2f)))
  }

  test("pq_encode kernel == HOF encode (incl. first-index tie-break)") {
    val m = 4; val k = 8; val dim = 16; val dsub = dim / m
    val df = vecs(64, dim, 7).toDF("vec_id", "embedding")
    val model = graft.operators.PqIndex.sampledModel(df, "embedding", "vec_id", m, k)
    val cb = model.codebooks.map(_.map(_.map(_.toDouble)))
    // the exact pre-r17 expression
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    val vecD = transform(col("embedding"), x => x.cast("double"))
    val hof = transform(sequence(lit(0), lit(m - 1)), i => {
      val sub = slice(vecD, i * dsub + 1, lit(dsub))
      val dists = transform(element_at(cbLit, i + 1), cent =>
        aggregate(zip_with(sub, cent, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
    val both = df.select(col("vec_id"),
      hof.as("old"), graft.functions.vec.pq_encode(col("embedding"), cb).as("neu"))
    val bad = both.filter(not(col("old") === col("neu"))).count()
    assert(bad === 0, "pq_encode diverged from the HOF formulation")
    // tie-break: a vector equidistant to two identical centroids must pick
    // the FIRST index (array_position-of-min semantics)
    val dupCb = Array(Array(Array(1.0, 1.0), Array(1.0, 1.0), Array(0.0, 0.0)))
    val tie = Seq((0L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
      .select(graft.functions.vec.pq_encode(col("embedding"), dupCb).as("c"))
      .head.getSeq[Int](0)
    assert(tie === Seq(0))
  }

  test("pq_adc_score kernel == HOF aggregate(zip_with(...)) fold") {
    val m = 4; val k = 8; val dim = 16
    val df = vecs(64, dim, 11).toDF("vec_id", "embedding")
    val model = graft.operators.PqIndex.sampledModel(df, "embedding", "vec_id", m, k)
    val q = Array.fill(dim)(0.37f)
    val lutFlat = model.lut(q)
    val enc = graft.operators.PqIndex.encode(df, "embedding", model)
    val lut = typedLit(lutFlat.toSeq)
    val hof = aggregate(
      zip_with(col("pq_code"), sequence(lit(0), lit(lutFlat.length / k - 1)),
        (code, i) => element_at(lut, i * k + code + 1)),
      lit(0.0), (acc, x) => acc + x)
    val bad = enc.select(hof.as("old"),
        graft.functions.vec.pq_adc_score(col("pq_code"), lutFlat, k).as("neu"))
      .filter(not(col("old") === col("neu"))).count()
    assert(bad === 0, "pq_adc_score diverged from the HOF fold")
  }

  test("token_stats kernel == the HOF repetition statistics") {
    val rows = Seq(
      "a b c a b a",                      // top = 3 (a), nd = 3
      "x",                                // single token
      "",                                 // tokenizes to empty array
      "t1 t2 t3 t4 t5 t6 t7 t8 t1 t1 t2", // mixed multiplicities
      "δ δ δ ascii ωmega"                 // non-ASCII char counting
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("id", "t")
      .select(col("id"), graft.functions.text.tokens(col("t")).as("tk"))
    val n = size(col("tk")).cast("long")
    val nd = size(array_distinct(col("tk"))).cast("long")
    val top = coalesce(
      aggregate(array_distinct(col("tk")), lit(0L),
        (acc, t) => greatest(acc, size(filter(col("tk"), x => x === t)).cast("long"))),
      lit(0L))
    val chars = aggregate(col("tk"), lit(0L), (acc, t) => acc + length(t))
    val st = graft.functions.GenEvalExpressions.token_stats(col("tk"))
    val bad = df.select(
        (n === st.getField("n") &&
          nd === st.getField("nd") &&
          top === coalesce(st.getField("top"), lit(0L)) &&
          chars === st.getField("chars")).as("ok"))
      .filter(not(col("ok"))).count()
    assert(bad === 0, "token_stats diverged from the HOF statistics")
  }
}
