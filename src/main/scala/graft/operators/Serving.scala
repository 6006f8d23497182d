package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.text

/** Remaining query-time serving operators (SURVEY Q6, Q8-Q10, Q12).
  */
object Serving {

  /** Q6 rerank contract: score (query, passage) pairs, sort desc, truncate.
    * The reference oversamples `max(k, min(3k, 20))` candidates before
    * reranking (`document_service.py:388-391`). The model stage is pluggable;
    * [[tokenOverlapScore]] is the deterministic stand-in (FlagEmbedding
    * cross-encoder in production). */
  def oversample(k: Int): Int = math.max(k, math.min(3 * k, 20))

  /** Deterministic rerank score: |query tokens ∩ passage tokens| /
    * |query tokens| — order-free, engine-reproducible. */
  def tokenOverlapScore(queryText: String, passage: Column): Column = {
    val qToks = queryText.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
    if (qToks.isEmpty) lit(0.0)
    else size(array_intersect(array_distinct(text.tokens(passage)),
      array(qToks.map(lit(_)): _*))).cast("double") / qToks.length
  }

  /** Rerank: attach score, keep top k by (score desc, id asc). */
  def rerank(candidates: DataFrame, idCol: String, passageCol: String,
             queryText: String, k: Int): DataFrame =
    candidates
      .withColumn("rerank_score", tokenOverlapScore(queryText, col(passageCol)))
      .orderBy(col("rerank_score").desc, col(idCol).asc)
      .limit(k)

  /** Q10 batch get by composite id: join against a literal key set with
    * order-preserving dedup (`pgvector_store.py:509-570`). Broadcast — the
    * key list is a user request, never data-sized. */
  def batchGet(chunks: DataFrame, keys: Seq[(Long, Int)],
               docIdCol: String, chunkNoCol: String): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val dedup = keys.distinct.zipWithIndex
    val keyDf = dedup.map { case ((d, c), i) => (d, c, i) }
      .toDF(docIdCol, chunkNoCol, "__req_order")
    chunks.join(broadcast(keyDf), Seq(docIdCol, chunkNoCol))
      .orderBy("__req_order")
      .drop("__req_order")
  }

  /** Q12 filename search (`postgres_database.py:2700-2802`): 3-way OR of
    * substring ILIKE and token matches over the normalized name (extension
    * stripped, [_-]+ -> space); rank by matched-token fraction desc,
    * tiebreak updated_at desc then id. */
  def filenameSearch(docs: DataFrame, filenameCol: String, idCol: String,
                     query: String, limit: Int,
                     updatedAtCol: Option[String] = None): DataFrame = {
    val norm = regexp_replace(
      regexp_replace(col(filenameCol), "\\.[A-Za-z0-9]+$", ""), "[_-]+", " ")
    val qToks = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
    val nameToks = array_distinct(text.tokens(norm))
    val score =
      if (qToks.isEmpty) lit(0.0)
      else size(array_intersect(nameToks, array(qToks.map(lit(_)): _*)))
        .cast("double") / qToks.length
    val substrHit = lower(col(filenameCol)).contains(query.toLowerCase)
    val ranked = docs
      .withColumn("name_score", when(substrHit, greatest(score, lit(0.5))).otherwise(score))
      .filter(col("name_score") > 0)
    val ordering = Seq(col("name_score").desc) ++
      updatedAtCol.map(c => col(c).desc_nulls_last).toSeq :+ col(idCol).asc
    ranked.orderBy(ordering: _*).limit(math.max(1, math.min(limit, 100)))
  }
}
