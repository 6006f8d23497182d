package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GenEvalExpressions

/** [[GenEvalExpressions.ordered_sum]] — the codegen'd key-ordered double
  * summation that replaced the repo's most common interpreted-HOF shape
  * (`aggregate(sort_array(collect_list(struct(k, p))), 0.0, acc+p)` in the
  * LM-scoring, Lloyd-update, and tf-idf folds). The contract is BIT
  * EQUALITY with that HOF: same element ordering (sort_array's struct
  * lexicographic compare — key, then value), same IEEE add sequence, same
  * null propagation — because the DuckDB oracles replay the summation via
  * `list_sum(... ORDER BY k)` and any reorder flips hashes at gate scale. */
class OrderedSumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def hof(pairs: org.apache.spark.sql.Column) =
    aggregate(sort_array(pairs), lit(0.0),
      (acc, x) => acc + x.getField("p"))

  test("bit-equal to the sorted HOF fold on random long-keyed inputs, " +
    "including duplicate keys (value tiebreak) and shuffled order") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val n = rnd.nextInt(50)
      // duplicate keys on purpose: ordering must tiebreak on the value,
      // exactly as sort_array's struct compare does
      (i.toLong, Seq.fill(n)((rnd.nextInt(10).toLong,
        math.log(rnd.nextDouble() + 1e-9))))
    }
    val df = rows.flatMap { case (id, ps) =>
      ps.map { case (k, p) => (id, k, p) }
    }.toDF("id", "k", "p")
      .groupBy("id")
      .agg(collect_list(struct(col("k"), col("p"))).as("pairs"))
      .select(col("id"),
        GenEvalExpressions.ordered_sum(col("pairs")).as("fast"),
        hof(col("pairs")).as("slow"))
      .as[(Long, Option[Double], Option[Double])].collect()
    assert(df.nonEmpty)
    df.foreach { case (id, fast, slow) =>
      assert(fast.map(java.lang.Double.doubleToLongBits(_)) ==
        slow.map(java.lang.Double.doubleToLongBits(_)),
        s"row $id: kernel $fast != HOF $slow (bit compare)")
    }
  }

  test("string keys order by UTF8 binary compare, matching sort_array") {
    val df = Seq(
      (1L, Seq(("zeta", 0.1), ("Alpha", 0.2), ("alpha", 0.30000001),
        ("alpha", 0.3), ("", -0.5)))
    ).toDF("id", "raw")
      .select(col("id"), expr(
        "transform(raw, x -> struct(x._1 as k, x._2 as p))").as("pairs"))
      .select(GenEvalExpressions.ordered_sum(col("pairs")).as("fast"),
        hof(col("pairs")).as("slow"))
      .as[(Double, Double)].head()
    assert(java.lang.Double.doubleToLongBits(df._1) ==
      java.lang.Double.doubleToLongBits(df._2))
  }

  test("empty array sums to 0.0; null element or field propagates null " +
    "(the HOF's null fold)") {
    val out = Seq(
      (1L, Some(Seq((Some(1L), Some(1.5))))),
      (2L, Some(Seq.empty[(Option[Long], Option[Double])])),
      (3L, Some(Seq((Some(1L), None: Option[Double])))),
      (4L, Some(Seq((None: Option[Long], Some(2.0))))),
      (5L, None: Option[Seq[(Option[Long], Option[Double])]])
    ).toDF("id", "raw")
      .select(col("id"), expr(
        "transform(raw, x -> struct(x._1 as k, x._2 as p))").as("pairs"))
      .select(col("id"),
        GenEvalExpressions.ordered_sum(col("pairs")).as("s"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(1.5))
    assert(out(2L).contains(0.0))
    assert(out(3L).isEmpty, "null value -> null sum")
    assert(out(4L).isEmpty, "null key -> null sum")
    assert(out(5L).isEmpty, "null array -> null sum")
  }

  test("runs under codegen (hand-computed positional fold)") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // keys force the order 3,2,1: 0.3 + (0.2 + 0.1) association differs
      // from input order (0.1 + 0.2) + 0.3 only in history — value equal
      // here, but the k-order contract is what the gate oracles replay
      val s = Seq((1L, Seq((3L, 0.125), (1L, 0.5), (2L, 0.25))))
        .toDF("id", "raw")
        .select(expr("transform(raw, x -> struct(x._1 as k, x._2 as p))")
          .as("pairs"))
        .select(GenEvalExpressions.ordered_sum(col("pairs")).as("s"))
        .as[Double].head()
      assert(s == 0.875)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("non-conforming input types are rejected at analysis") {
    val bad = Seq((1L, Seq((true, 0.5)))).toDF("id", "raw")
      .select(expr("transform(raw, x -> struct(x._1 as k, x._2 as p))")
        .as("pairs"))
    val e = intercept[Exception] {
      bad.select(GenEvalExpressions.ordered_sum(col("pairs"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("ordered_sum"))
  }
}
