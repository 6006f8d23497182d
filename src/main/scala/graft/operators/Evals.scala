package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation at corpus scale — the metric layer the
  * reference publishes its only numbers in (`evaluations/custom_eval/`,
  * `evaluations/hotpot_ragas_eval.py` — accuracy over golden Q&A): given a
  * ranked result table and a relevance ground-truth table, compute the
  * standard ranking metrics per query, in-engine, so an index/quantizer
  * change can be A/B'd over millions of queries without exporting to a
  * Python harness.
  *
  * Metrics (binary relevance, the TREC definitions):
  *  - `recall_at_k`  = hits / min(n_rel, k) — against the achievable max
  *    at this cutoff;
  *  - `mrr`          = 1 / rank of the first relevant hit (0 if none);
  *  - `ndcg_at_k`    = DCG / IDCG with DCG = Σ rel_i / log2(i + 1) over
  *    the ranked list and IDCG the same sum over the ideal prefix
  *    min(n_rel, k).
  *
  * Determinism: every metric is a per-query fold over ≤ k rows; the DCG
  * fold runs in RANK order (the t30 position-ordered-fold discipline) and
  * IDCG folds a literal `sequence`, so both engines sum in the same
  * order; log2 ulp is absorbed by the caller's rounding.
  *
  * 100 TB shape: one equi-join of the ranked table (|queries|·k rows)
  * against the relevance table on (query, id), then two map-side-combined
  * per-query aggregations — nothing corpus-sized; the expensive part of
  * an eval (producing `ranked`) is the retrieval operator under test. */
object Evals {

  /** `ranked`: (`query_id`, `rank` 1-based, `id`); `relevant`:
    * (`query_id`, `id`) ground truth. Output per query: `n_rel`, `hits`,
    * `recall_at_k`, `mrr`, `ndcg_at_k`. Queries with NO relevant docs are
    * omitted (their metrics are undefined). Queries WITH relevant docs but
    * no ranked rows within the cutoff are NOT omitted: they score zero on
    * every metric — the per-query frame is anchored on the ground-truth
    * side, so a retrieval regression that returns nothing for a query
    * drags the aggregate down instead of silently vanishing from it. */
  def rankingMetrics(ranked: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"rankingMetrics needs k>=1 (got $k)")
    val rel = relevant.select(col("query_id"), col("id"), lit(1L).as("__rel"))
    val joined = ranked.filter(col("rank") <= k)
      .join(rel, Seq("query_id", "id"), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
    val perQuery = joined.groupBy("query_id").agg(
      sum("__rel").as("hits"),
      min(when(col("__rel") === 1, col("rank"))).as("__first_rel"),
      aggregate(
        sort_array(collect_list(struct(col("rank").as("r"), col("__rel").as("v")))),
        lit(0.0),
        (acc, x) => acc +
          x.getField("v").cast("double") / log2(x.getField("r") + lit(1.0)))
        .as("__dcg"))
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    // anchor on nRel (left join), not perQuery: a query the retriever
    // returned nothing for must score 0, not disappear from the eval
    nRel.join(perQuery, Seq("query_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("__dcg", coalesce(col("__dcg"), lit(0.0)))
      .withColumn("__ideal", least(col("n_rel"), lit(k.toLong)))
      .withColumn("__idcg",
        aggregate(sequence(lit(1L), col("__ideal")), lit(0.0),
          (acc, i) => acc + lit(1.0) / log2(i + lit(1.0))))
      .select(col("query_id"), col("n_rel"), col("hits"),
        (col("hits").cast("double") / col("__ideal")).as("recall_at_k"),
        coalesce(lit(1.0) / col("__first_rel"), lit(0.0)).as("mrr"),
        (col("__dcg") / col("__idcg")).as("ndcg_at_k"))
  }
}
