package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Evals

/** Hand-computed ranking metrics: the TREC definitions at k=5 over a
  * planted fixture covering a top-ranked hit, a gap, and a no-hit query. */
class EvalsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("rankingMetrics: recall/MRR/NDCG match hand computation; no-hit query zeroes") {
    val ranked = Seq(
      (1L, 1L, 10L), (1L, 2L, 99L), (1L, 3L, 11L), (1L, 4L, 98L), (1L, 5L, 97L),
      (2L, 1L, 7L), (2L, 2L, 8L)
    ).toDF("query_id", "rank", "id")
    val relevant = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 50L))
      .toDF("query_id", "id")
    val out = Evals.rankingMetrics(ranked, relevant, k = 5)
      .select("query_id", "n_rel", "hits", "recall_at_k", "mrr", "ndcg_at_k")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n1, h1, rec1, mrr1, ndcg1) = out(1L)
    assert(n1 == 3L && h1 == 2L)
    assert(math.abs(rec1 - 2.0 / 3) < 1e-12)
    assert(mrr1 == 1.0, "first relevant at rank 1")
    val dcg = 1.0 / (math.log(2) / math.log(2)) + 1.0 / (math.log(4) / math.log(2))
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    assert(math.abs(ndcg1 - dcg / idcg) < 1e-9, s"ndcg $ndcg1 vs ${dcg / idcg}")
    val (_, n2, h2, rec2, mrr2, ndcg2) = out(2L)
    assert(n2 == 1L && h2 == 0L && rec2 == 0.0 && mrr2 == 0.0 && ndcg2 == 0.0)
  }

  test("query with relevant docs but NO ranked rows scores zero, not omitted") {
    // the regression the eval layer exists to surface: the retriever
    // returned nothing for query 3 — it must drag the aggregate down
    val ranked = Seq((1L, 1L, 10L)).toDF("query_id", "rank", "id")
    val relevant = Seq((1L, 10L), (3L, 30L), (3L, 31L)).toDF("query_id", "id")
    val out = Evals.rankingMetrics(ranked, relevant, k = 5)
      .select("query_id", "n_rel", "hits", "recall_at_k", "mrr", "ndcg_at_k")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.contains(3L), "no-result query must not vanish from the eval")
    val (_, n3, h3, rec3, mrr3, ndcg3) = out(3L)
    assert(n3 == 2L && h3 == 0L && rec3 == 0.0 && mrr3 == 0.0 && ndcg3 == 0.0)
    // query with ranked rows is unaffected by the outer-join anchor
    assert(out(1L)._3 == 1L && out(1L)._5 == 1.0)
    // a query with NO relevant docs is still omitted (metrics undefined)
    assert(!out.contains(2L))
  }
}
