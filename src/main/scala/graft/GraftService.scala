package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.filters.{MetadataFilter, ScopeFilters}
import graft.operators.{Embedder, HashEmbedder, KnnSearch, Padding, Serving}

/** The serving-layer planner (SURVEY §3.1/§3.2): a `RetrieveRequest`-shaped
  * case class compiled to one declarative DataFrame plan — the Spark
  * equivalent of `document_service.retrieve_chunks`
  * (`document_service.py:213-505`).
  *
  * Plan shape (the v2 pushed-down form, `chunk_v2_store.py:352-431`): every
  * predicate — tenancy, end-user, folder scope (exact/prefix/depth),
  * metadata DSL, status — lands BEFORE the scoring/limit, so Catalyst pushes
  * it into the chunk-table scan; then score -> min_score -> top-k ->
  * optional rerank (oversampled) -> optional padding -> deterministic order.
  */
object GraftService {

  /** Mirror of `core/models/request.py:114-182` (the analytics-relevant
    * fields; model/output-format knobs live serving-side). `queryImage`
    * is the visual-search arm (`request.py:122-125`): raw image bytes,
    * mutually exclusive with a non-empty `queryText`
    * (`request.py:175-179`), only valid on the multivector branch
    * (`document_service.py:234-238`), at most [[MaxQueryImageBytes]]
    * (`document_service.py:241-246`). */
  case class RetrieveRequest(
      queryText: String,
      k: Int = 20,
      filters: Option[String] = None,          // metadata DSL JSON
      minScore: Double = Double.NegativeInfinity,
      useReranking: Boolean = false,
      appId: Option[String] = None,
      endUserId: Option[String] = None,
      folderPath: Option[String] = None,
      folderDepth: Int = 0,                    // 0 exact, -1 descendants, n>0 bounded
      padding: Int = 0,
      queryImage: Option[Array[Byte]] = None)

  /** The reference's 10 MB query-image gate (`document_service.py:241`). */
  val MaxQueryImageBytes: Int = 10 * 1024 * 1024

  /** `request.py:175-179` + `document_service.py:241-246`, applied at the
    * dispatch point every arm shares. */
  private def validateQueryImage(req: RetrieveRequest): Unit =
    req.queryImage.foreach { img =>
      require(req.queryText == null || req.queryText.isEmpty,
        "Provide either queryText or queryImage, not both (request.py:175-179)")
      require(img.length <= MaxQueryImageBytes,
        f"query image exceeds the 10MB gate (got ${img.length / 1048576.0}%.1fMB," +
          " document_service.py:241-246)")
    }

  /** Chunk-table column contract (the wide v2 layout, FIXTURES A2). */
  case class ChunkTable(
      df: DataFrame,
      docIdCol: String = "document_id",
      chunkNoCol: String = "chunk_number",
      contentCol: String = "content",
      embeddingCol: String = "embedding",
      metaCol: String = "metadata",
      metaTypesCol: String = "metadata_types",
      appIdCol: String = "app_id",
      endUserCol: String = "end_user_id",
      folderPathCol: String = "folder_path")

  /** Compile the request's WHERE (everything except the vector part). */
  def compileScope(req: RetrieveRequest, t: ChunkTable): Column = {
    val c = t.df
    val parts = Seq(
      req.appId.map(a => c(t.appIdCol) === a),
      req.endUserId.map(u => c(t.endUserCol) === u),
      // reference depth semantics are RELATIVE to the base path (0 exact,
      // -1 all descendants, n>0 at most n levels deeper) — the dispatcher
      // adds base_depth, so "/a/b" with depth 1 bounds at total depth 3
      req.folderPath.map(p =>
        ScopeFilters.folderScope(c(t.folderPathCol), Seq(Some(p)),
          Some(req.folderDepth))),
      req.filters.map(json =>
        MetadataFilter.compile(json, MetadataFilter.Ctx(
          c(t.metaCol), c(t.metaTypesCol))))
    ).flatten
    parts.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** retrieve_chunks: the full Q1+Q14(+Q6)(+Q8) pipeline as one plan. */
  def retrieveChunks(req: RetrieveRequest, chunks: ChunkTable,
                     embedder: Embedder = HashEmbedder(64)): DataFrame = {
    require(req.queryImage.isEmpty,
      "image queries require the multivector arm — use " +
        "retrieveChunksMultivector (document_service.py:234-238)")
    val qVec = embedder.embedText(req.queryText)
    val fetchK = if (req.useReranking) Serving.oversample(req.k) else req.k
    val hits = KnnSearch.topK(chunks.df, chunks.embeddingCol, chunks.docIdCol,
      qVec, fetchK, where = compileScope(req, chunks), minScore = req.minScore)
    val ranked =
      if (req.useReranking)
        Serving.rerank(hits, chunks.docIdCol, chunks.contentCol, req.queryText, req.k,
          tiebreak = Seq(chunks.chunkNoCol))
          .withColumn("score", col("rerank_score"))
      else hits
    if (req.padding > 0)
      Padding.expand(ranked, chunks.df, req.padding, chunks.docIdCol, chunks.chunkNoCol)
    else
      ranked.orderBy(col("score").desc, col(chunks.docIdCol), col(chunks.chunkNoCol))
  }

  /** retrieve_chunks, ColPali/multivector branch (Q7's `use_colpali` arm,
    * `document_service.py:213-229` config dispatch → MaxSim scoring like
    * `multi_vector_store.query_similar`): identical scope compilation and
    * plan shape to the dense branch, with the score expression swapped for
    * float MaxSim against the query's multivector. The query multivector
    * is a literal (request-sized, broadcast by construction); the chunk
    * multivector column never enters a shuffle — scoring happens in the
    * scan projection and only (score, ids) reach the top-k. */
  def retrieveChunksMultivector(req: RetrieveRequest, chunks: ChunkTable,
                                mvCol: String,
                                embedder: operators.MultiVectorEmbedder): DataFrame = {
    validateQueryImage(req)
    // `document_service.py:278-296`: an image query embeds through the
    // model's image path, a text query through embed_for_query — then the
    // two share every downstream stage.
    val qmv = req.queryImage match {
      case Some(img) => embedder.embedImageMulti(img)
      case None      => embedder.embedTextMulti(req.queryText)
    }
    require(qmv.nonEmpty, "query multivector is empty (embedder failure)")
    require(req.queryImage.isEmpty || !req.useReranking,
      "reranking is text-queried; image queries run unreranked " +
        "(the cross-encoder scores (queryText, content) pairs)")
    val qlit = typedLit(qmv.map(_.toSeq).toSeq)
    val fetchK = if (req.useReranking) Serving.oversample(req.k) else req.k
    val scored = chunks.df.filter(compileScope(req, chunks))
      .withColumn("score", graft.functions.vec.max_sim_float(col(mvCol), qlit))
    val bounded =
      if (req.minScore.isNegInfinity) scored
      else scored.filter(col("score") >= req.minScore)
    val hits = bounded
      .orderBy(col("score").desc, col(chunks.docIdCol), col(chunks.chunkNoCol))
      .limit(fetchK)
    val ranked =
      if (req.useReranking)
        Serving.rerank(hits, chunks.docIdCol, chunks.contentCol, req.queryText, req.k,
          tiebreak = Seq(chunks.chunkNoCol))
          .withColumn("score", col("rerank_score"))
      else hits
    // ColPali padding is image-only (`_apply_padding_to_chunks`,
    // `document_service.py:554-688`): text hits drop out, padding rows
    // must be images, matched scores survive, padding scores 0.0, final
    // order (-score, doc, chunk).
    if (req.padding > 0)
      Padding.expandImages(ranked, chunks.df, req.padding,
        chunks.docIdCol, chunks.chunkNoCol, chunks.contentCol, chunks.metaCol)
    else ranked
  }

  /** Hybrid retrieval: the dense arm fused with an Okapi BM25 keyword arm
    * by reciprocal rank (the pgvector+FTS deployment shape, generalizing
    * the reference's filename-only keyword search Q12 to chunk content).
    * Scope compiles ONCE and lands before BOTH arms' scoring, so each arm
    * scans only authorized rows; the fusion join runs over two top-`fetchK`
    * slices (request-sized). Chunks are keyed by a composite doc:chunk
    * string so fusion is per-chunk; each arm oversamples 2k before the RRF
    * cut. */
  def retrieveChunksHybrid(req: RetrieveRequest, chunks: ChunkTable,
                           embedder: Embedder = HashEmbedder(64),
                           kRrf: Int = 60): DataFrame = {
    require(req.queryImage.isEmpty,
      "image queries require the multivector arm (document_service.py:234-238)")
    import org.apache.spark.sql.expressions.Window
    val keyed = chunks.df.filter(compileScope(req, chunks)).withColumn("__cid",
      concat_ws(":", col(chunks.docIdCol), col(chunks.chunkNoCol)))
    val fetchK = math.max(req.k * 2, 20)
    // partition-less Window = single-partition execution: safe here ONLY
    // because both arms are pre-limited to fetchK rows (request-sized)
    // before ranking — do NOT reuse this frame over an unbounded input
    val rankW = Window.orderBy(col("score").desc, col("__cid"))
    val dense = KnnSearch.topK(keyed, chunks.embeddingCol, "__cid",
      embedder.embedText(req.queryText), fetchK)
      .select(col("__cid"), col("score"))
      .withColumn("rank", row_number().over(rankW))
    val terms = Option(req.queryText).getOrElse("").toLowerCase
      .split("\\s+").filter(_.nonEmpty).distinct.toSeq
    val keyword = operators.FullText.bm25(keyed, "__cid", chunks.contentCol,
        terms, fetchK)
      .withColumnRenamed("doc_id", "__cid")
      .withColumn("rank", row_number().over(rankW))
    val fused = operators.FullText.rrfFuse(dense, keyword, "__cid", req.k, kRrf)
      .withColumnRenamed("doc_id", "__cid")
    fused.join(keyed.drop("score"), "__cid")
      .withColumn("score", col("rrf"))
      .drop("__cid")
      .orderBy(col("score").desc, col(chunks.docIdCol), col(chunks.chunkNoCol))
  }

  /** MMR-diversified retrieval: the dense branch oversampled to fetchK,
    * then greedily re-ranked for diversity ([[operators.Mmr]], λ=0.5 by
    * default) — the serving answer to a corpus whose top-k fills with
    * near-copies. Same scope compilation and pushed-down plan as
    * [[retrieveChunks]]; the diversification runs over the request-sized
    * candidate slice only. Chunk keys are composite (doc:chunk), so the
    * greedy step uses a rank surrogate id and joins back (broadcast —
    * request-sized). */
  def retrieveChunksDiverse(req: RetrieveRequest, chunks: ChunkTable,
                            embedder: Embedder = HashEmbedder(64),
                            lambda: Double = 0.5): DataFrame = {
    require(req.queryImage.isEmpty,
      "image queries require the multivector arm (document_service.py:234-238)")
    // 2k oversample (the hybrid arm's rule, NOT Serving.oversample whose
    // max(k, min(3k, 20)) cap equals k once k >= 20 — a pool of exactly k
    // candidates would make diversification a pure reorder with nothing to
    // swap in)
    val fetchK = math.max(req.k * 2, 20)
    val keyed = chunks.df.filter(compileScope(req, chunks)).withColumn("__cid",
      concat_ws(":", col(chunks.docIdCol), col(chunks.chunkNoCol)))
    val hits = KnnSearch.topK(keyed, chunks.embeddingCol, "__cid",
      embedder.embedText(req.queryText), fetchK, minScore = req.minScore)
    // ONE execution of the retrieval plan: collect the request-sized slice
    // (already (score desc, __cid) ordered by topK), greedy-select on it,
    // and rebuild the result from the same rows — a join back to `hits`
    // would re-derive the corpus scan a second time per request
    val spark = hits.sparkSession
    val rows = hits.drop("__cid").collect()
    val scoreIdx = rows.headOption.map(_.fieldIndex("score")).getOrElse(0)
    val embIdx = rows.headOption.map(_.fieldIndex(chunks.embeddingCol)).getOrElse(0)
    val cand = rows.zipWithIndex.map { case (r, i) =>
      ((i + 1).toLong, r.getDouble(scoreIdx), r.getSeq[Float](embIdx).toArray)
    }
    val picks = operators.Mmr.select(cand.toSeq, req.k, lambda)
    val outSchema = org.apache.spark.sql.types.StructType(
      hits.drop("__cid").schema
        .add("mmr_score", org.apache.spark.sql.types.DoubleType, nullable = false)
        .add("mmr_rank", org.apache.spark.sql.types.LongType, nullable = false))
    val outRows = picks.map { case (sid, _, m, rk) =>
      // Seq[Any], NOT Seq(m, rk): Scala's numeric widening would unify
      // (Double, Long) to Seq[Double], silently turning the rank into 3.0
      // and corrupting the LongType slot
      org.apache.spark.sql.Row.fromSeq(rows(sid.toInt - 1).toSeq ++ Seq[Any](m, rk))
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(outRows.asJava, outSchema).orderBy("mmr_rank")
  }

  /** Doc-level results (Q11): max chunk score per document. */
  def retrieveDocs(req: RetrieveRequest, chunks: ChunkTable,
                   embedder: Embedder = HashEmbedder(64)): DataFrame =
    KnnSearch.docLevel(retrieveChunks(req, chunks, embedder), chunks.docIdCol)

  /** R1 context assembly: the retrieved chunks concatenated in rank order
    * into the completion prompt context (`document_service.py:1028-1233` —
    * the DataFrame-able part of `query`; the LLM call itself is serving). */
  def assembleContext(hits: DataFrame, contentCol: String, docIdCol: String,
                      chunkNoCol: String): DataFrame =
    hits.agg(
      concat_ws("\n\n",
        transform(
          array_sort(collect_list(struct(
            (-col("score")).as("neg"), col(docIdCol).as("d"),
            col(chunkNoCol).as("n"), col(contentCol).as("c")))),
          x => x.getField("c"))).as("context"),
      count(lit(1)).as("n_chunks"))
}
