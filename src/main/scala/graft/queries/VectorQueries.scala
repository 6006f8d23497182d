package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.vec
import graft.operators.{IvfIndex, KnnSearch, PqIndex, SqIndex}

/** Vector search coverage (SURVEY §2.3 E5/E6, §2.5 Q1-Q4, Q11, Q14).
  * Oracles are exact DuckDB reimplementations over DOUBLE[] casts — the
  * Spark expressions accumulate float elements in double left-to-right, so
  * scores agree bit-for-bit before the 6-dp display rounding.
  */
object VectorQueries {

  /** The corpus-side query vector (a real request would carry an embedded
    * query; the driver-shaped testdata uses vec 0 as the probe). */
  def queryVec(spark: SparkSession, dir: String, vecId: Long = 0): Array[Float] =
    Tables.embeddings(spark, dir).filter(col("vec_id") === vecId)
      .select("embedding").head().getSeq[Float](0).toArray

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_knn_topk" -> ((s, d) => knnTopK(s, d)),
    "v2_knn_batch" -> ((s, d) => knnBatch(s, d)),
    "v3_neardup_pairs" -> ((s, d) => nearDupPairs(s, d)),
    "v4_quantize_hamming" -> ((s, d) => quantizeHamming(s, d)),
    "v5_maxsim_float" -> ((s, d) => maxSimFloat(s, d)),
    "v6_maxsim_binary" -> ((s, d) => maxSimBinary(s, d)),
    "v7_ivf_knn" -> ((s, d) => ivfKnn(s, d)),
    "v8_ivf_exact" -> ((s, d) => ivfExact(s, d)),
    "v9_fde_twophase" -> ((s, d) => fdeTwoPhase(s, d)),
    "v10_emb_lsh_neardups" -> ((s, d) => embLshNearDups(s, d)),
    "v11_fde_ivf" -> ((s, d) => fdeIvf(s, d)),
    "v12_pq_adc" -> ((s, d) => pqAdc(s, d)),
    "v13_ivfpq" -> ((s, d) => ivfPq(s, d)),
    "v14_sq_adc" -> ((s, d) => sqAdc(s, d)),
    "v15_ivfsq" -> ((s, d) => ivfSq(s, d)),
    "v16_range_search" -> ((s, d) => rangeSearch(s, d)),
    "v17_ivfpq_residual" -> ((s, d) => ivfPqResidual(s, d)),
    "v18_jl_project" -> ((s, d) => jlProject(s, d)),
    "v19_ivf_recall" -> ((s, d) => ivfRecall(s, d)),
    "v20_matryoshka" -> ((s, d) => matryoshka(s, d)),
    "v21_binary_rescore" -> ((s, d) => binaryRescore(s, d)),
    "v22_mv_pq_maxsim" -> ((s, d) => mvPqMaxSim(s, d)),
    "tr1_hard_negatives" -> ((s, d) => hardNegativesQ(s, d)),
    "tr2_semihard" -> ((s, d) => semiHardQ(s, d)),
    "tr3_triplets" -> ((s, d) => tripletsQ(s, d)),
    "tr4_bt_strengths" -> ((s, d) => btStrengthsQ(s, d)),
    "tr5_pl_strengths" -> ((s, d) => plStrengthsQ(s, d)),
    "tr6_elo" -> ((s, d) => eloQ(s, d)),
    "v25_abtt_projection" -> ((s, d) => abttProjectionQ(s, d)),
    "s1_search_docs" -> ((s, d) => searchDocs(s, d)),
    "s2_colpali_padding" -> ((s, d) => colpaliPadding(s, d)),
    "s3_colpali_groups" -> ((s, d) => colpaliGroups(s, d)),
    "s5_dispatcher_rerank" -> ((s, d) => dispatcherRerank(s, d)),
    "s6_dispatcher_colpali_rerank" -> ((s, d) => dispatcherColpaliRerank(s, d)),
    "s7_image_retrieve" -> ((s, d) => dispatcherImageQuery(s, d)),
    "v23_ann_recall" -> ((s, d) => annRecall(s, d)),
    "v24_ranking_metrics" -> ((s, d) => rankingMetricsQ(s, d)),
    "v26_rbo" -> ((s, d) => rboQ(s, d)),
    "s12_embed_fallback" -> ((s, d) => embedFallbackQ(s, d)),
    "s13_colpali_fallback" -> ((s, d) => colpaliFallbackQ(s, d)),
    "s8_e2e_quality" -> ((s, d) => e2eQuality(s, d)),
    "s9_e2e_quality_rerank" -> ((s, d) => e2eQualityRerank(s, d)),
    "s11_colpali_e2e_quality" -> ((s, d) => colpaliE2eQuality(s, d)),
    "ev19_ragas" -> ((s, d) => ragasEvalQ(s, d))
  )

  /** Planted page/query images for [[colpaliE2eQuality]] — 16×16 px of
    * 4×4-px UNIFORM gray blocks, so each of the embedder's 4×4 luma cells
    * equals its block value EXACTLY (integer mean of 16 equal pixels; PIL
    * luma of gray (v,v,v) is v) and the whole patch-vector table is
    * derivable in SQL from the planting rule alone. Blocks 0..13 carry
    * the GROUP identity (g = doc_id % 10 — all pages of a group share
    * them), blocks 14..15 carry doc/page identity; a query carries group
    * g's identity blocks plus its own salt in 14..15, so it matches 14/16
    * patches on every page of its group and ~0 elsewhere — md5 patch
    * vectors have no geometry, so similarity is CELL-IDENTITY locality,
    * the honest analog of patch matching for the hash stand-in. */
  private object S11Pages {
    private def render16(luma: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) {
          val v = luma((y / 4) * 4 + (x / 4))
          img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def pagePng(d: Long, p: Long): Array[Byte] = render16 { i =>
      if (i < 14) (40L + ((d % 10) * 13 + i * 7) % 150).toInt
      else (40L + (d * 11 + p * 3 + i) % 150).toInt
    }
    def queryPng(g: Int): Array[Byte] = render16 { i =>
      if (i < 14) 40 + (g * 13 + i * 7) % 150
      else 40 + (g * 17 + i) % 150
    }
  }

  /** The ColPali/VISUAL arm of the s8/s9 end-to-end retrieval-quality
    * family — the sandbox-checkable analog of the reference's ColPali
    * benchmark itself (BASELINE's 95.56% financial eval runs page-image
    * retrieval through a GPU ColPali; `colpali_embedding_model.py`). The
    * FULL visual stack runs in-engine: 100 docs render to 1–2 planted
    * page images each ([[S11Pages]]) → REAL PNG decode → 4×4 patch grid →
    * md5 patch multivectors (HashMultiVectorEmbedder dim=16, the image
    * stand-in) → chunk table → TEN real
    * [[graft.GraftService.retrieveChunksMultivector]] calls with
    * `query_image` requests (one per group — the request-at-a-time
    * serving path, rule 17) → MaxSim top-10 chunks → doc-level ranking
    * (best chunk per doc, (score, doc) order) →
    * [[graft.operators.Evals.rankingMetrics]] against group relevance
    * (n_rel = 10 per query). A query matches 14/16 patches on every page
    * of its group, so group docs dominate the ranking with real score
    * texture from the salt patches' max-dots; recall varies with the
    * 1-vs-2-page mix inside the top-10 chunk budget. Any renderer/
    * decoder/patch-grid/MaxSim/dispatcher/metric change that moves visual
    * retrieval quality flips the row red. The oracle derives every patch
    * vector symbolically from the planting rule (the s7 machinery) and
    * replays scoring, both rankings, and the metric fold. */
  def colpaliE2eQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = graft.operators.HashMultiVectorEmbedder(dim = 16)
    // the rendered+embedded page table is built ONCE (the s8 chunk-index
    // convention, applied r18): fan the 100-doc id set out of its single
    // scan task before the per-row PNG render+embed, and checkpoint so the
    // ten dispatcher plans scan the table instead of replaying the render
    val chunks = graft.Tables.scaled(
        Tables.documents(spark, dir).filter(col("doc_id") < 100)
          .select("doc_id")).as[Long]
      .flatMap { d =>
        (0 until (1 + d % 2).toInt).map { p =>
          val png = S11Pages.pagePng(d, p)
          (d, p.toLong, "data:image/png;base64," +
            java.util.Base64.getEncoder.encodeToString(png),
            emb.embedImageMulti(png).map(_.toSeq).toSeq)
        }
      }.toDF("document_id", "chunk_number", "content", "mv")
      .withColumn("metadata", map(lit("is_image"), lit("true")))
      .localCheckpoint()
    val table = graft.GraftService.ChunkTable(chunks)
    val perQuery = (0 until 10).map { g =>
      val req = graft.GraftService.RetrieveRequest("", k = 10,
        queryImage = Some(S11Pages.queryPng(g)))
      graft.GraftService.retrieveChunksMultivector(req, table, "mv", emb)
        .select(lit(g.toLong).as("query_id"), col("document_id"),
          col("score"))
    }.reduce(_ unionByName _)
    val docRanked = perQuery.groupBy("query_id", "document_id")
      .agg(max("score").as("ds"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("ds").desc, col("document_id"))).cast("long"))
      .select(col("query_id"), col("rank"), col("document_id").as("id"))
    val relevant = Tables.documents(spark, dir).filter(col("doc_id") < 100)
      .select((col("doc_id") % 10).as("query_id"), col("doc_id").as("id"))
    graft.operators.Evals.rankingMetrics(docRanked, relevant, k = 10)
      .select(col("query_id"), col("n_rel"), col("hits"),
        round(col("recall_at_k"), 6).as("recall_at_k"),
        round(col("mrr"), 6).as("mrr"),
        round(col("ndcg_at_k"), 6).as("ndcg_at_k"))
      .orderBy("query_id")
  }

  /** Round-11 verdict #4: the deterministic END-TO-END retrieval-quality
    * regression row — the engine-side analog of the reference's golden-Q&A
    * eval (`evaluations/custom_eval/` `questions_and_answers.csv`: query →
    * relevant doc ids → retrieval accuracy; BASELINE's 95.56% financial
    * eval is this harness on a GPU model). The FULL ingest→serve stack
    * runs in-engine: documents → fixed chunker → [[graft.operators
    * .HashEmbedder]] (unnormalized, so every bucket count is an exact
    * integer both engines reproduce from md5) → chunk index → TEN real
    * [[graft.GraftService.retrieveDocs]] dispatcher calls (config 1:
    * dense, no rerank — one `RetrieveRequest` per golden query, the
    * request-at-a-time serving path, rule 17) → doc-level ranking →
    * [[graft.operators.Evals.rankingMetrics]]. Golden fixture: each query
    * is a middle slice (chars 81–160) of its query doc's text; relevance =
    * the docs sharing the query doc's (lang, source) — n_rel spreads 1–5,
    * so recall/MRR/NDCG exercise hits at rank 1, deep hits, and misses.
    * Any chunker/embedder/index/dispatcher/metric change that moves
    * retrieval quality flips this row red — quality-gated, not just
    * shape-gated. Cosine scores divide exact integer dot/norm sums in the
    * stated parenthesization (dot / (√nq·√nc)), so ranks are
    * bit-reproducible in the DuckDB replay. */
  def e2eQuality(spark: SparkSession, dir: String): DataFrame =
    e2eQualityArm(spark, dir, useReranking = false)

  /** Config-3 sibling of [[e2eQuality]]: same golden fixture, same stack,
    * but the dispatcher runs its RERANK arm (oversample 20 by cosine →
    * deterministic token-overlap rerank → truncate to 10), so the quality
    * gate covers both retrieval configs the dense path serves — a rerank
    * regression moves THESE metrics while s8's stay green, isolating the
    * stage. */
  def e2eQualityRerank(spark: SparkSession, dir: String): DataFrame =
    e2eQualityArm(spark, dir, useReranking = true)

  private def e2eQualityArm(spark: SparkSession, dir: String,
                            useReranking: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 100)
    val embedder = graft.operators.HashEmbedder(dim = 64, normalize = false)
    val chunks = graft.operators.Chunker.fixedChunks(
      docs, "doc_id", "text", n = 200, overlap = 40)
    // the chunk index is built ONCE (p7's stored-layout role); checkpoint
    // so the ten dispatcher plans scan it instead of replaying the embed
    val table = embedder.embed(chunks, "chunk", "embedding")
      .select(col("doc_id").as("document_id"), col("chunk_number"),
        col("chunk").as("content"), col("embedding"))
      .localCheckpoint()
    val golden = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), substring(col("text"), 81, 80).as("qtext"))
      .collect().sortBy(_.getLong(0))
    val ct = graft.GraftService.ChunkTable(table)
    val perQuery = golden.map { r =>
      graft.GraftService.retrieveDocs(
        graft.GraftService.RetrieveRequest(r.getString(1), k = 10,
          useReranking = useReranking), ct, embedder)
        .withColumn("query_id", lit(r.getLong(0)))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("document_id"))
    val ranked = perQuery.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("rank"), col("document_id").as("id"))
    val qmeta = docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"),
        col("lang").as("__ql"), col("source").as("__qs"))
    val rel = docs.select(col("doc_id").as("id"), col("lang"), col("source"))
      .join(broadcast(qmeta),
        col("lang") === col("__ql") && col("source") === col("__qs"))
      .select("query_id", "id")
    graft.operators.Evals.rankingMetrics(ranked, rel, k = 10)
      .select(col("query_id"), col("n_rel"), col("hits"),
        round(col("recall_at_k"), 6).as("recall_at_k"),
        round(col("mrr"), 6).as("mrr"),
        round(col("ndcg_at_k"), 6).as("ndcg_at_k"))
      .orderBy("query_id")
  }

  /** RAGAS-shape retrieval eval over the s8 golden fixture
    * ([[graft.operators.Evals.ragasReport]]): the deterministic analog of
    * the reference's `evaluations/hotpot_ragas_eval.py` run — retrieve
    * contexts for each golden question through the serving stack, then
    * score context_precision@10 (rank-weighted, exact-integer ppm) and
    * token-overlap faithfulness of the planted answer (the doc's first
    * 120 chars) against the union of retrieved chunk texts.
    *
    * Retrieval is one keyed top-k pass (broadcast query vectors → cosine
    * → bounded-heap top-10 per query; r18: replaced 10 per-query
    * TakeOrdered branches, same rows) on the same chunk table as s8, with
    * the TOTAL (score desc, doc, chunk) order of the multivector arm: RAGAS
    * contexts are CHUNK texts, so within-doc ties must order
    * deterministically (s8 may leave them to doc-level pooling; a
    * chunk-level eval cannot). Sub-81-char docs plant an empty question
    * that embeds to the zero vector and scores 0.0 everywhere (the s8
    * rule), exercising the all-ties rank path and low-faithfulness rows;
    * longer docs recall their own chunks and score high — both metric
    * regimes are value-covered. */
  def ragasEvalQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 100)
    val embedder = graft.operators.HashEmbedder(dim = 64, normalize = false)
    val chunks = graft.operators.Chunker.fixedChunks(
      docs, "doc_id", "text", n = 200, overlap = 40)
    val table = embedder.embed(chunks, "chunk", "embedding")
      .select(col("doc_id").as("document_id"), col("chunk_number"),
        col("chunk").as("content"), col("embedding"))
      .localCheckpoint()
    val golden = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), substring(col("text"), 81, 80).as("qtext"))
      .collect().sortBy(_.getLong(0))
    // ONE keyed top-k pass over the chunk table replaces the 10 per-query
    // TakeOrdered branches (r17 verdict ask #4; guide §2.3/§2.4): the 10
    // query vectors broadcast onto a single scan, and the bounded heap
    // aggregate keeps each query's top-10 with map-side partials — the
    // checkpointed table is scanned once for scoring (plus one cheap
    // content re-attach of the ≤100 surviving keys) instead of 10 times.
    // Value-identical: cosine_sim(embedding, qv) is the same expression
    // cosineTo built over a literal, and the heap's (score desc, id asc)
    // order under the packed id (document_id << 32 | chunk_number; both
    // nonneg, chunk_number < 2^32) IS the branches' total
    // (score desc, document_id, chunk_number) order.
    import spark.implicits._
    val qdf = golden.toSeq
      .map(r => (r.getLong(0), embedder.embedText(r.getString(1))))
      .toDF("query_id", "qv")
    val hits = table
      .join(broadcast(qdf))
      .withColumn("score",
        graft.functions.vec.cosine_sim(col("embedding"), col("qv")))
      .groupBy("query_id")
      .agg(graft.functions.TopKAggregate.top_k(col("score"),
        shiftleft(col("document_id"), 32) + col("chunk_number"), 10).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("rank", "hit")))
      .select(col("query_id"), (col("rank") + 1).as("rank"),
        shiftright(col("hit.id"), 32).as("document_id"),
        col("hit.id").bitwiseAND(lit(4294967295L)).cast("int").as("chunk_number"))
    // contexts is ≤ |queries|·k = 100 rows with TWO consumers inside
    // ragasReport (the precision chain and the faithfulness token chain):
    // checkpoint the bounded seam so the retrieval dataflow runs once.
    val contexts = table.select("document_id", "chunk_number", "content")
      .join(broadcast(hits), Seq("document_id", "chunk_number"))
      .select(col("query_id"), col("rank"),
        col("document_id").as("id"), col("content"))
      .localCheckpoint()
    val qmeta = docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"),
        col("lang").as("__ql"), col("source").as("__qs"))
    val rel = docs.select(col("doc_id").as("id"), col("lang"), col("source"))
      .join(broadcast(qmeta),
        col("lang") === col("__ql") && col("source") === col("__qs"))
      .select("query_id", "id")
    val answers = docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"),
        substring(col("text"), 1, 120).as("answer"))
    graft.operators.Evals.ragasReport(contexts, rel, answers, k = 10)
      .orderBy("query_id")
  }

  /** In-engine retrieval evaluation ([[graft.operators.Evals]]): exact
    * KNN over the disjoint corpus slice (vec_id ≥ 20) for the 20 query
    * vectors, judged against label-match relevance — recall@10, MRR and
    * NDCG@10 per query. The fixture's hash embeddings give a LOW, spread
    * curve (including a zero-hit query), so every metric branch is
    * value-exercised: the fold order, the first-relevant rank, the
    * no-hits zero, the min(n_rel, k) denominators. */
  def rankingMetricsQ(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val corpus = e.filter(col("vec_id") >= 20)
    val ranked = KnnSearch.topKPerQuery(corpus, "embedding", "vec_id",
      queries, "qv", "qid", k = 10)
    val rel = corpus.select(col("vec_id").cast("long").as("id"), col("label"))
      .join(broadcast(queries.select(col("qid").as("query_id"), col("qlabel"))),
        col("label") === col("qlabel"))
      .select(col("query_id"), col("id"))
    graft.operators.Evals.rankingMetrics(
      ranked.select(col("query_id"), col("rank"), col("id")), rel, k = 10)
      .select(col("query_id"), col("n_rel"), col("hits"),
        round(col("recall_at_k"), 6).as("recall_at_k"),
        round(col("mrr"), 6).as("mrr"),
        round(col("ndcg_at_k"), 6).as("ndcg_at_k"))
      .orderBy("query_id")
  }

  /** The `query_image` retrieval arm END-TO-END (`request.py:114-182`
    * `query_image` → `document_service.py:278-296` image-embed dispatch →
    * the MaxSim branch): a REAL 32×32 PNG is decoded by the serving
    * pipeline (ImageIO), area-averaged to the 4×4 patch grid, embedded to
    * 16 md5-derived patch vectors by the deterministic
    * [[graft.operators.HashMultiVectorEmbedder]] CI stand-in, and scored
    * against the colpali chunk table. The probe image is UNIFORM gray
    * (luma 77): any area average of a constant is that constant, so the
    * oracle re-derives the 16 patch vectors from `md5('px:<i>:77')`
    * symbolically — the decode and grid actually RUN in the engine (a
    * decode/grid failure changes every token and flips the row red),
    * while the grid arithmetic on non-uniform pixels is pinned by
    * ImageCodecSpec/GraftServiceSpec. Scoring, top-k, and ordering are
    * the s6 plan with rerank off (image queries are unreranked — the
    * cross-encoder scores text pairs). */
  def dispatcherImageQuery(spark: SparkSession, dir: String): DataFrame = {
    val req = graft.GraftService.RetrieveRequest(
      "", k = 6, queryImage = Some(grayPng(32, 32, 77)))
    graft.GraftService.retrieveChunksMultivector(
      req, graft.GraftService.ChunkTable(colpaliChunkTable(spark, dir)), "mv",
      graft.operators.HashMultiVectorEmbedder(64))
      .select(col("document_id"),
        col("chunk_number").cast("long").as("chunk_number"),
        round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("document_id"), col("chunk_number"))
  }

  /** Uniform-gray PNG probe (real encode; ImageIO round-trips it). */
  private[graft] def grayPng(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Q7 config 4 — the last of the dispatcher's four reference configs
    * ({rerank?}×{colpali?}, `document_service.py:213-229`) to get its own
    * CORRECTNESS row: ColPali MaxSim scoring AND reranking in ONE
    * [[graft.GraftService.retrieveChunksMultivector]] plan — MaxSim
    * top-fetchK (oversample 18) → deterministic token-overlap rerank →
    * truncate to k=6. The query "text chunk" inverts the ranking: data-URI
    * image chunks (single token, overlap 0) dominate phase 1's MaxSim
    * order but text chunks (overlap 1.0) win the rerank — so the row
    * catches a dispatcher that skips or misorders either stage. Rank ties
    * at the cut resolve on (doc, chunk), the total order
    * [[graft.operators.Serving.rerank]]'s tiebreak argument exists for. */
  def dispatcherColpaliRerank(spark: SparkSession, dir: String): DataFrame = {
    val qvecs = Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(0L, 1L)).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    val req = graft.GraftService.RetrieveRequest(
      "text chunk", k = 6, useReranking = true)
    graft.GraftService.retrieveChunksMultivector(
      req, graft.GraftService.ChunkTable(colpaliChunkTable(spark, dir)), "mv",
      graft.operators.FixedMultiVectorEmbedder(qvecs))
      .select(col("document_id"),
        col("chunk_number").cast("long").as("chunk_number"),
        round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("document_id"), col("chunk_number"))
  }

  /** Q7 driven END-TO-END through the serving dispatcher on its rerank
    * config (`document_service.py:213-217,378-475` config 3: oversample
    * `max(k, min(3k, 20))` → cross-encoder rerank → truncate to k): ONE
    * [[graft.GraftService.retrieveChunks]] call with `useReranking = true`
    * and a folder scope, so the composed serving plan — scope pushdown ∘
    * KNN top-fetchK ∘ min_score ∘ rerank ∘ k-truncation — gets its own
    * CORRECTNESS row (the arms are spec-gated individually in
    * GraftServiceSpec; this gates their composition like s2 does for the
    * colpali branch). Chunk table = embeddings ⋈ documents 1:1; the query
    * embeds to corpus vec 0 via [[graft.operators.FixedEmbedder]] so the
    * oracle reads the probe straight from the embeddings table, and the
    * rerank stage is the deterministic token-overlap model the oracle
    * replays verbatim. */
  def dispatcherRerank(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val d = Tables.documents(spark, dir)
    val chunks = e.join(d, col("vec_id") === col("doc_id"))
      .select(col("vec_id").as("document_id"),
        lit(0).as("chunk_number"),
        col("text").as("content"),
        col("embedding"),
        col("source").as("app_id"),
        col("lang").as("end_user_id"),
        concat(lit("/"), col("lang")).as("folder_path"))
    val req = graft.GraftService.RetrieveRequest(
      "scan vector small merge", k = 5, minScore = 0.05,
      useReranking = true, folderPath = Some("/en"), folderDepth = 0)
    graft.GraftService.retrieveChunks(req,
        graft.GraftService.ChunkTable(chunks),
        graft.operators.FixedEmbedder(queryVec(spark, dir).toSeq))
      .select(col("document_id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("document_id"))
  }

  /** Synthesized ColPali chunk table: label = document, page =
    * rank-within-label; image-ness is vec_id arithmetic, including the
    * metadata-flag-overrides-content cases of `_is_image_chunk`
    * (`document_service.py:578-589`): %11==5 rows are flagged image
    * despite text content, %11==7 rows are flagged NOT image despite a
    * data URI. Per-chunk multivector = singleton [embedding] (the MaxSim
    * machinery itself is value-checked by v5/v6; here the COMPOSITION is
    * the target) and the query multivector is [vec0, vec1]. */
  private def colpaliChunkTable(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy("vec_id")
    Tables.embeddings(spark, dir)
      .withColumn("chunk_number", row_number().over(w) - 1)
      .select(col("label").cast("long").as("document_id"),
        col("chunk_number"),
        when(col("vec_id") % 11 === 5, map(lit("is_image"), lit("true")))
          .when(col("vec_id") % 11 === 7, map(lit("is_image"), lit("false")))
          .otherwise(map().cast("map<string,string>")).as("metadata"),
        when(col("vec_id") % 3 =!= 2,
          concat(lit("data:image/png;base64,x"), col("vec_id")))
          .otherwise(concat(lit("text chunk "), col("vec_id"))).as("content"),
        array(col("embedding")).as("mv"))
  }

  /** The composed ColPali retrieve flow (`document_service.py:491-505` →
    * `_apply_padding_to_chunks` `:554-688`) end-to-end through ONE
    * GraftService.retrieveChunksMultivector plan: MaxSim score → top-k →
    * image-only filter → ±1 padding fetch (images only) → dedup → matched
    * scores kept / padding scored 0.0 / is_padding marked →
    * (-score, doc, chunk) order. */
  def colpaliPadding(spark: SparkSession, dir: String): DataFrame = {
    val qvecs = Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(0L, 1L)).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    val req = graft.GraftService.RetrieveRequest("fixture query", k = 8, padding = 1)
    graft.GraftService.retrieveChunksMultivector(
      req, graft.GraftService.ChunkTable(colpaliChunkTable(spark, dir)), "mv",
      graft.operators.FixedMultiVectorEmbedder(qvecs))
      .select(col("document_id"), col("chunk_number").cast("long").as("chunk_number"),
        round(col("score"), 4).as("score"), col("is_padding"))
      .orderBy(col("score").desc, col("document_id"), col("chunk_number"))
  }

  /** Q9 on s2's output: groups with reference claim order (higher-scored
    * main wins a contested padding chunk) and before/main/after member
    * display order, the member list hash-gated via its joined string. */
  def colpaliGroups(spark: SparkSession, dir: String): DataFrame = {
    val qvecs = Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(0L, 1L)).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    val req = graft.GraftService.RetrieveRequest("fixture query", k = 8, padding = 1)
    val expanded = graft.GraftService.retrieveChunksMultivector(
      req, graft.GraftService.ChunkTable(colpaliChunkTable(spark, dir)), "mv",
      graft.operators.FixedMultiVectorEmbedder(qvecs))
    graft.operators.Padding.group(expanded, padding = 1)
      .select(col("document_id"), col("main_chunk").cast("long").as("main_chunk"),
        concat_ws(",", transform(col("member_chunks"), _.cast("string")))
          .as("members"),
        round(col("score"), 4).as("score"))
      .orderBy("document_id", "main_chunk")
  }

  /** IVF-PQ composed (the standard large-scale ANN layout: coarse-quantizer
    * pruning over PQ-compressed codes, exact rerank on the survivors).
    * Exactness bridge like v8/v9/v11: full probe (nprobe == lists) and a
    * corpus-covering ADC oversample make the candidate set provably the
    * whole corpus, so the exact cosine rerank must reproduce exact top-10 —
    * value-checking every seam of the composition (cluster assignment ∘
    * encode ∘ ADC ranking ∘ rerank join) against the v1 oracle. Dropping
    * nprobe/oversample turns on real pruning with no plan change (recall
    * gates live in IvfIndexSpec/PqIndexSpec). */
  def ivfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = queryVec(spark, dir)
    val pq = PqIndex.sampledModel(e, "embedding", "vec_id", m = 8, k = 16)
    val (indexed, ivf) = IvfIndex.build(
      PqIndex.encode(e, "embedding", pq), "embedding", lists = 16)
    val probed = ivf.nearestClusters(q, nprobe = 16)
    val cand = PqIndex.topN(
      indexed.filter(col("cluster_id").isin(probed: _*) && col("vec_id") =!= 0),
      pq, "vec_id", q, n = 10000)
    KnnSearch.topK(cand, "embedding", "vec_id", q, 10)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
  }

  /** IVF-PQ with RESIDUAL encoding — the FAISS IndexIVFPQ default layout
    * (v13 quantizes raw vectors; production IVF-PQ quantizes x − c(x),
    * whose variance per subspace is smaller, so the same m·k codebook
    * budget spends its resolution where the coarse quantizer left error).
    * Inner-product decomposition keeps it rank-correct WITHOUT per-cluster
    * LUTs: dot(q, x) = dot(q, c) + dot(q, x − c) ≈ [exact per-cluster
    * scalar, a lists-length literal] + [ONE ADC LUT built from the FULL
    * query over the residual codebooks]. Same exactness bridge as
    * v13/v15: full probe + corpus-covering oversample ⇒ the exact rerank
    * must reproduce exact top-10 (value-checking assign ∘ residual ∘
    * encode ∘ offset-ADC ∘ rerank); PqIndexSpec gates the quantization-
    * error win residual encoding exists for. */
  def ivfPqResidual(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = queryVec(spark, dir)
    val (indexed, ivf) = IvfIndex.build(e, "embedding", lists = 16)
    val centLit = typedLit(ivf.centroids.map(_.toSeq).toSeq)
    // Stage cut (rule 14, r17 optimization round): the residual table feeds
    // the codebook sampling collect AND the encode pass — without the cut
    // each consumer re-runs the MLlib assign + residual zip over the corpus.
    // An offline IVF-PQ index build materializes residuals between the
    // coarse-assign and encode passes at any scale.
    val resid = indexed.withColumn("__resid",
      zip_with(col("embedding"), element_at(centLit, col("cluster_id") + 1),
        (a, b) => a - b))
      .localCheckpoint()
    val pq = PqIndex.sampledModel(resid, "__resid", "vec_id", m = 8, k = 16)
    val enc = PqIndex.encode(resid, "__resid", pq)
    val qDotC = ivf.centroids.map { c =>
      var s = 0.0; var j = 0
      while (j < c.length) { s += q(j).toDouble * c(j).toDouble; j += 1 }
      s
    }
    val scored = enc.filter(col("vec_id") =!= 0)
      .withColumn("adc_score",
        element_at(typedLit(qDotC.toSeq), col("cluster_id") + 1) +
          PqIndex.adcScore(col("pq_code"), pq.lut(q), pq.k))
      .orderBy(col("adc_score").desc, col("vec_id")).limit(10000)
    KnnSearch.topK(scored, "embedding", "vec_id", q, 10)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Johnson–Lindenstrauss fixed-point projection 64→16: the
    * dimensionality-reduction front end for clustering/LSH at scale. A
    * narrow codegen'd map — no shuffle, no join; the oracle replays the
    * md5-derived ±1 sign matrix and the exact integer sums. Registered
    * shape is the unnested (vec_id, j, component) — scalar rows only, so
    * the driver's pandas canonicalizer can sort/hash them (arrays in a
    * registered output are a harness wall; Verify enforces the ban). */
  def jlProject(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        posexplode(vec.jl_project(col("embedding"), 16, inDims = 64))
          .as(Seq("j", "component")))
      .orderBy("vec_id", "j")

  /** Hard-negative mining (DPR/ANCE shape) over the labeled embeddings:
    * for each of the 20 query vectors, the 5 highest-cosine DIFFERENT-
    * label vectors — the candidates a contrastive trainer wants in the
    * batch. See [[graft.operators.Mining]]. */
  def hardNegativesQ(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    graft.operators.Mining.hardNegatives(
      e, "vec_id", "embedding", "label",
      e.filter(col("vec_id") < 20), "vec_id", "embedding", "label", k = 5)
      .select(col("query_id"), col("rank"), col("neg_id"),
        round(col("score"), 6).as("score"))
      .orderBy("query_id", "rank")
  }

  /** Contrastive training triplets over the labeled embeddings: for each
    * of the 20 anchors, the hardest same-label positive plus the 3
    * hardest different-label negatives — the (a, p, n) tuples a
    * DPR/SimCSE trainer consumes. See [[graft.operators.Mining.triplets]]. */
  def tripletsQ(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    graft.operators.Mining.triplets(
      e, "vec_id", "embedding", "label",
      e.filter(col("vec_id") < 20), "vec_id", "embedding", "label", k = 3)
      .select(col("anchor_id"), col("pos_id"),
        round(col("pos_score"), 6).as("pos_score"), col("rank"),
        col("neg_id"), round(col("neg_score"), 6).as("neg_score"))
      .orderBy("anchor_id", "rank")
  }

  /** Semi-hard band mining (FaceNet): different-label vectors scoring
    * within (pos − margin, pos) of each query's hardest positive. */
  def semiHardQ(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    graft.operators.Mining.semiHardNegatives(
      e, "vec_id", "embedding", "label",
      e.filter(col("vec_id") < 20), "vec_id", "embedding", "label",
      k = 5, margin = 0.05)
      .select(col("query_id"), col("rank"), col("neg_id"),
        round(col("score"), 6).as("score"),
        round(col("pos_score"), 6).as("pos_score"))
      .orderBy("query_id", "rank")
  }

  /** IVF-SQ8 composed (coarse-quantizer pruning over scalar-quantized
    * codes — the lighter sibling of v13's IVF-PQ, the layout engines pick
    * when PQ codebook training isn't worth scheduling). Same exactness
    * bridge: full probe + corpus-covering ADC oversample make the candidate
    * set the whole corpus, so the exact cosine rerank must reproduce exact
    * top-10, value-checking cluster assignment ∘ SQ8 encode ∘ ADC ranking ∘
    * rerank join against the v1 oracle. Dropping nprobe/oversample turns on
    * real pruning with no plan change. */
  def ivfSq(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = queryVec(spark, dir)
    val sq = SqIndex.train(e, "embedding")
    val (indexed, ivf) = IvfIndex.build(
      SqIndex.encode(e, "embedding", sq), "embedding", lists = 16)
    val probed = ivf.nearestClusters(q, nprobe = 16)
    val cand = SqIndex.topN(
      indexed.filter(col("cluster_id").isin(probed: _*) && col("vec_id") =!= 0),
      sq, "vec_id", q, n = 10000)
    KnnSearch.topK(cand, "embedding", "vec_id", q, 10)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Product-quantization ADC ranking with the SAMPLED codebook (k-means
    * sampling init, zero Lloyd iterations — every arithmetic step
    * engine-replayable): the DuckDB oracle recomputes codebook slicing,
    * nearest-centroid encode (first-index tiebreak) and the ADC fold
    * bit-for-bit, value-gating the whole PQ pipeline's math. The trained
    * (Lloyd-refined) codebook only moves centroid VALUES — same encode,
    * same ADC, same plan — and its recall is PqIndexSpec's gate. */
  def pqAdc(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val model = PqIndex.sampledModel(e, "embedding", "vec_id", m = 8, k = 16)
    val q = queryVec(spark, dir)
    PqIndex.topN(
      PqIndex.encode(e, "embedding", model).filter(col("vec_id") =!= 0),
      model, "vec_id", q, n = 20)
      .select(col("vec_id"), array_join(col("pq_code"), ",").as("codes"),
        col("adc_score"))
  }

  /** SQ8 scalar quantization + ADC ranking (the [[graft.operators.SqIndex]]
    * pipeline, v12's sibling at the no-codebook tier): per-dim [min,max]
    * trained on the full table in one Summarizer pass, floor-clamp 8-bit
    * encode, bin-center ADC scoring. The oracle replays train + encode +
    * score bit-for-bit — codes and raw double scores both hash-gated. */
  def sqAdc(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val model = SqIndex.train(e, "embedding")
    val q = queryVec(spark, dir)
    SqIndex.topN(
      SqIndex.encode(e, "embedding", model).filter(col("vec_id") =!= 0),
      model, "vec_id", q, n = 20)
      .select(col("vec_id"), array_join(col("sq_code"), ",").as("codes"),
        col("adc_score"))
  }

  /** Range search (FAISS range_search shape): every vector with cosine to
    * vec 0 ≥ 0.25 — a set, not a ranking, so the deterministic order is
    * vec_id. Pure scan+filter: the plan has no shuffle at all. */
  def rangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val q = queryVec(spark, dir)
    KnnSearch.rangeSearch(Tables.embeddings(spark, dir), "embedding", "vec_id",
        q, minScore = 0.25, where = col("vec_id") =!= 0)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
      .orderBy("vec_id")
  }

  /** Q1: single-query exact top-k (TakeOrderedAndProject — no global sort). */
  def knnTopK(spark: SparkSession, dir: String): DataFrame = {
    val q = queryVec(spark, dir)
    KnnSearch.topK(Tables.embeddings(spark, dir), "embedding", "vec_id", q, 10,
      where = col("vec_id") =!= 0)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Q1 batch: per-query bounded-heap top-k (map-side partial aggregation). */
  def knnBatch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    KnnSearch.topKPerQuery(
      corpus = e.filter(col("vec_id") >= 5),
      vecCol = "embedding", idCol = "vec_id",
      queries = e.filter(col("vec_id") < 5),
      queryVecCol = "embedding", queryIdCol = "vec_id",
      k = 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (training-data dedup; the
    * brute-force O(n^2) baseline — the LSH-bucketed scale path is
    * [[graft.operators.Dedup]]). */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(
      col("vec_id"), col("embedding"))
    val a = Tables.scaled(e).as("a"); val b = e.as("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .withColumn("score", vec.cosine_sim(col("a.embedding"), col("b.embedding")))
      .filter(col("score") > 0.3)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(col("score"), 6).as("score"))
      .orderBy("id_a", "id_b")
  }

  /** Embedding near-dup via sign-block LSH (the scale path for v3):
    * candidates share a 16-dim sign slice, exact cosine only within blocks.
    * The synthetic corpus has no true near-dups (max cosine ≈ 0.51), so the
    * 0.4 threshold exercises block-join + filter equivalence; detection of
    * planted near-identical vectors is asserted in DedupSpec. */
  def embLshNearDups(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.embeddingLshPairs(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      dim = 64, blocks = 4, minCosine = 0.4)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy("id_a", "id_b")

  /** E5+E6: binary quantization (packed MSB-first) + Hamming to the probe
    * vector. The hex output pins the exact bit layout. */
  def quantizeHamming(spark: SparkSession, dir: String): DataFrame = {
    val q = queryVec(spark, dir)
    Tables.embeddings(spark, dir).filter(col("vec_id") < 50)
      .select(
        col("vec_id"),
        lower(hex(vec.binary_quantize(col("embedding")))).as("packed_hex"),
        vec.hamming(vec.binary_quantize(col("embedding")),
          vec.binary_quantize(lit(q))).cast("long").as("hamming"))
      .orderBy("vec_id")
  }

  /** Multivector per label: embeddings sorted by vec_id. The per-label
    * vector list is holistic, so assembly goes through the two-stage salted
    * collect (a fat label — thousands of page-patch vectors — spreads over
    * `salts` reducers in stage 1); array_sort restores determinism. */
  private def labelMultivectors(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedCollectList(
      Tables.embeddings(spark, dir)
        .select(col("label"), struct(col("vec_id"), col("embedding")).as("sv")),
      Seq("label"), "sv")
      .select(col("label"),
        transform(array_sort(col("values")), x => x.getField("embedding")).as("vecs"))

  /** Q5 exact rescoring: float MaxSim of each label-doc against label 0. */
  def maxSimFloat(spark: SparkSession, dir: String): DataFrame = {
    val mv = labelMultivectors(spark, dir)
    val q = mv.filter(col("label") === 0).select(col("vecs").as("qvecs"))
    mv.crossJoin(broadcast(q))
      .select(col("label").cast("long").as("label"),
        round(vec.max_sim_float(col("vecs"), col("qvecs")), 4).as("maxsim"))
      .orderBy("label")
  }

  /** Q4: binary MaxSim (the in-DB `max_sim` bit[] UDF) against label 0. */
  def maxSimBinary(spark: SparkSession, dir: String): DataFrame = {
    val mv = labelMultivectors(spark, dir)
      .select(col("label"),
        transform(col("vecs"), x => vec.binary_quantize(x)).as("bvecs"))
    val q = mv.filter(col("label") === 0).select(col("bvecs").as("qvecs"))
    mv.crossJoin(broadcast(q))
      .select(col("label").cast("long").as("label"),
        round(vec.max_sim_binary(col("bvecs"), col("qvecs")), 6).as("maxsim"))
      .orderBy("label")
  }

  /** IVF probe-pruned ANN under the seeded zero-Lloyd coarse quantizer
    * ([[IvfIndex.buildSeeded]]): the whole chain — codebook = 16 lowest-id
    * vectors, squared-L2 argmin assignment (ties to the lower index),
    * nprobe=8 probe choice, exact cosine top-10 inside the probed lists —
    * is deterministic and SQL-expressible, so the row is FULLY
    * oracle-checked (assignment, pruning, scores, and ranks), retiring the
    * registry's last `no_oracle` entry (round-12 verdict #1). The trained
    * MLlib coarse quantizer stays the quality path: IvfIndexSpec pins its
    * full-probe exactness, v8/v13/v15/v17 bridge it, v19 pins its recall
    * curve. Emits (vec_id, cluster_id, score, rank) — the verdict's
    * suggested replayable shape. */
  def ivfKnn(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queryVec(spark, dir)
    val (indexed, model) = IvfIndex.buildSeeded(
      Tables.embeddings(spark, dir), "embedding", "vec_id", lists = 16)
    val probed = IvfIndex.probeSeeded(model, q, nprobe = 8)
    KnnSearch.topK(
        indexed.filter(col("cluster_id").isin(probed: _*)),
        "embedding", "vec_id", q, k = 10, where = col("vec_id") =!= 0)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("vec_id"))))
      .select(col("vec_id"), col("cluster_id"),
        round(col("score"), 6).as("score"), col("rank").cast("long").as("rank"))
      .orderBy("rank")
  }

  /** The approximation-QUALITY gate for the v7 nprobe path, in-registry:
    * recall@10 of IVF at each nprobe ∈ {1,2,4,8,16} against the exact
    * top-10 (the v1 result). The whole sweep is deterministic — seeded
    * k-means build (design rule 13), integer probe selection, exact
    * within-cluster scoring — so the per-nprobe hit counts are a FIXTURE
    * CONSTANT the oracle pins: the nprobe=16 row must read 10/1.0 by the
    * v8 bridge argument (full probe == exact), and the partial-probe rows
    * are the measured seeded values, re-derived on every gate run — a
    * k-means/probe/scoring change that moves recall goes red here instead
    * of silently degrading ANN quality. Driver-side state is request-sized
    * (rule 17): 10 exact ids + 10 ids per probe depth.
    *
    * The partial-probe constants are FIXTURE-VERSIONED in-band: every
    * row carries [[fixtureTag]] (an exact integer hash of the embeddings
    * table) and the oracle pins the tag measured at the gate sf. A
    * regenerated fixture flips the row red AT THE TAG COLUMN — naming
    * fixture drift as the cause, not a phantom ANN regression — while
    * the nprobe=16 row's 10/1.0 stays pinned unconditionally (full probe
    * == exact holds on ANY data, the v8 bridge). A tag check inside the
    * engine would instead throw at bench sf (v19 is a headliner at
    * sf0.1), so the versioning deliberately lives in the compared rows. */
  def ivfRecall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = queryVec(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val tag = fixtureTag(e)
    val exact = KnnSearch.topK(e, "embedding", "vec_id", q, 10,
        where = col("vec_id") =!= 0)
      .select("vec_id").as[Long].collect().toSet
    val (indexed, model) = IvfIndex.build(e, "embedding", lists = 16)
    val cached = indexed.persist()
    try {
      val rows = Seq(1, 2, 4, 8, 16).map { np =>
        val got = IvfIndex.query(cached, model, "embedding", "vec_id", q,
            k = 10, nprobe = np, where = col("vec_id") =!= 0)
          .select("vec_id").as[Long].collect().toSet
        (np.toLong, got.count(exact).toLong)
      }
      rows.toDF("nprobe", "hits")
        .withColumn("recall", col("hits") / 10.0)
        .withColumn("fixture", lit(tag))
        .orderBy("nprobe")
    } finally { cached.unpersist(); () }
  }

  /** The quality rows for every OTHER compression rung's PRUNED operating
    * point — the v19 pattern generalized (round-9 verdict ask #3). Each
    * rung is proven EXACT at covering settings by its own oracle row
    * (v12/v14 replay the arithmetic bit-for-bit; v13/v15/v17/v20/v21 ride
    * the full-probe/corpus-covering-oversample bridge); what a 100 TB
    * deployment actually runs is the pruned configuration, so each gets a
    * recall row here at a realistic setting:
    *  - v12 PQ-ADC and v14 SQ8-ADC ranked raw at top-10 (32× / 4×
    *    compression, no rerank) — the quantizer's own fidelity;
    *  - v13 IVF-PQ, v15 IVF-SQ8, v17 residual IVF-PQ at nprobe 2/16
    *    (12.5% of lists) with a 50-candidate ADC oversample (10% of the
    *    corpus) before exact rerank — the two-phase oversample semantics
    *    of `fast_multivector_store.py:526-556`;
    *  - v20 matryoshka and v21 binary-rescore at a 20-candidate phase-1
    *    cut (4% of corpus) before full-precision rerank;
    *  - v22 multivector PQ MaxSim: top-5 LABELS by ADC MaxSim vs top-5 by
    *    exact float MaxSim (k=5 of 10 labels).
    * Every path is seeded/deterministic (rule 13), so the recalls are
    * fixture constants, pinned in the oracle VALUES and fixture-versioned
    * in-band exactly like v19 ([[fixtureTag]]). A quantizer/probe/rerank
    * regression moves hits; a testdata regen moves the tag column — the
    * red row names its own cause.
    *
    * Honest readings of the pinned values: v12's 0.2 is the SAMPLED
    * (zero-Lloyd) codebook the oracle can replay — the trained codebook's
    * better recall is PqIndexSpec's gate, not an oracle row; v20's 0.1
    * reflects that the fixture's hash embeddings are NOT MRL-trained
    * (nothing front-loads information into the prefix), so the row pins
    * the mechanism's behavior on untrained vectors, the worst case. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = queryVec(spark, dir)
    val tag = fixtureTag(e)
    val exact = KnnSearch.topK(e, "embedding", "vec_id", q, 10,
        where = col("vec_id") =!= 0)
      .select("vec_id").as[Long].collect().toSet
    def hits10(df: DataFrame): Long =
      df.select("vec_id").as[Long].collect().count(exact).toLong

    val pq = PqIndex.sampledModel(e, "embedding", "vec_id", m = 8, k = 16)
    val sq = SqIndex.train(e, "embedding")
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]

    rows += (("v12_pq_adc", hits10(PqIndex.topN(
      PqIndex.encode(e, "embedding", pq).filter(col("vec_id") =!= 0),
      pq, "vec_id", q, n = 10)), 10L))
    rows += (("v14_sq_adc", hits10(SqIndex.topN(
      SqIndex.encode(e, "embedding", sq).filter(col("vec_id") =!= 0),
      sq, "vec_id", q, n = 10)), 10L))

    locally { // v13 pruned: nprobe 2, oversample 50, exact rerank
      val (indexed, ivf) = IvfIndex.build(
        PqIndex.encode(e, "embedding", pq), "embedding", lists = 16)
      val probed = ivf.nearestClusters(q, nprobe = 2)
      val cand = PqIndex.topN(
        indexed.filter(col("cluster_id").isin(probed: _*) && col("vec_id") =!= 0),
        pq, "vec_id", q, n = 50)
      rows += (("v13_ivfpq", hits10(KnnSearch.topK(cand, "embedding", "vec_id", q, 10)), 10L))
    }
    locally { // v15 pruned: nprobe 2, oversample 50, exact rerank
      val (indexed, ivf) = IvfIndex.build(
        SqIndex.encode(e, "embedding", sq), "embedding", lists = 16)
      val probed = ivf.nearestClusters(q, nprobe = 2)
      val cand = SqIndex.topN(
        indexed.filter(col("cluster_id").isin(probed: _*) && col("vec_id") =!= 0),
        sq, "vec_id", q, n = 50)
      rows += (("v15_ivfsq", hits10(KnnSearch.topK(cand, "embedding", "vec_id", q, 10)), 10L))
    }
    locally { // v17 pruned: residual codebooks, nprobe 2, oversample 50
      val (indexed, ivf) = IvfIndex.build(e, "embedding", lists = 16)
      val centLit = typedLit(ivf.centroids.map(_.toSeq).toSeq)
      val resid = indexed.withColumn("__resid",
        zip_with(col("embedding"), element_at(centLit, col("cluster_id") + 1),
          (a, b) => a - b))
      val rpq = PqIndex.sampledModel(resid, "__resid", "vec_id", m = 8, k = 16)
      val enc = PqIndex.encode(resid, "__resid", rpq)
      val qDotC = ivf.centroids.map { c =>
        var s = 0.0; var j = 0
        while (j < c.length) { s += q(j).toDouble * c(j).toDouble; j += 1 }
        s
      }
      val probed = ivf.nearestClusters(q, nprobe = 2)
      val cand = enc
        .filter(col("cluster_id").isin(probed: _*) && col("vec_id") =!= 0)
        .withColumn("adc_score",
          element_at(typedLit(qDotC.toSeq), col("cluster_id") + 1) +
            PqIndex.adcScore(col("pq_code"), rpq.lut(q), rpq.k))
        .orderBy(col("adc_score").desc, col("vec_id")).limit(50)
      rows += (("v17_ivfpq_residual", hits10(KnnSearch.topK(cand, "embedding", "vec_id", q, 10)), 10L))
    }
    locally { // v20 pruned: 16-dim prefix phase 1, 20-candidate cut
      val pref = e.withColumn("__prefix", slice(col("embedding"), 1, 16))
      val cand = KnnSearch.topK(pref, "__prefix", "vec_id", q.take(16), 20,
        where = col("vec_id") =!= 0)
      rows += (("v20_matryoshka", hits10(KnnSearch.topK(cand.drop("score"), "embedding", "vec_id", q, 10)), 10L))
    }
    locally { // v21 pruned: Hamming phase 1 at a 20-candidate cut
      val cand = e.filter(col("vec_id") =!= 0)
        .withColumn("__ham", vec.hamming(vec.binary_quantize(col("embedding")),
          vec.binary_quantize(lit(q))))
        .orderBy(col("__ham").asc, col("vec_id").asc).limit(20)
      rows += (("v21_binary_rescore", hits10(KnnSearch.topK(cand, "embedding", "vec_id", q, 10)), 10L))
    }
    locally { // v22: top-5 labels, ADC MaxSim vs exact float MaxSim
      val enc = PqIndex.encode(e, "embedding", pq)
      val q0 = queryVec(spark, dir, 0); val q1 = queryVec(spark, dir, 1)
      def top5(df: DataFrame, s0: org.apache.spark.sql.Column,
               s1: org.apache.spark.sql.Column): Seq[Long] =
        df.withColumn("__s0", s0).withColumn("__s1", s1)
          .groupBy("label")
          .agg((max(col("__s0")) + max(col("__s1"))).as("__m"))
          .orderBy(col("__m").desc, col("label"))
          .limit(5).select(col("label").cast("long")).as[Long].collect().toSeq
      val adc = top5(enc,
        PqIndex.adcScore(col("pq_code"), pq.lut(q0), pq.k),
        PqIndex.adcScore(col("pq_code"), pq.lut(q1), pq.k))
      val ex = top5(e,
        vec.dot_product(col("embedding"), lit(q0)),
        vec.dot_product(col("embedding"), lit(q1))).toSet
      rows += (("v22_mv_pq_maxsim", adc.count(ex).toLong, 5L))
    }

    rows.toSeq.toDF("rung", "hits", "k")
      .withColumn("recall", col("hits") / col("k").cast("double"))
      .withColumn("fixture", lit(tag))
      .orderBy("rung")
  }

  /** Deterministic 8-hex tag of an embeddings fixture: md5 over
    * (row count, Σ floor(first component · 10⁶) as exact longs) — order-
    * independent integer arithmetic, so partitioning can't move it, and
    * any value-level regen of the vectors does. Pinned into the
    * recall-curve oracles to fixture-version their measured constants. */
  private[queries] def fixtureTag(e: DataFrame): String = {
    import e.sparkSession.implicits._
    val (n, s) = e.agg(
      count(lit(1)).cast("long"),
      sum(floor(element_at(col("embedding"), 1) * lit(1e6)).cast("long")))
      .as[(Long, Long)].head()
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$n:$s".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
  }

  /** Matryoshka/adaptive retrieval (MRL, Kusupati et al. 2022 — the
    * modern two-phase ANN rung engines ship alongside PQ/SQ8): phase 1
    * ranks on the FIRST 16 of 64 dims (an MRL-trained embedding front-
    * loads information, so the prefix is a usable coarse score at 1/4 the
    * memory traffic), keeps a 5k oversample; phase 2 reranks the
    * survivors with the full-dimension cosine. BOTH phases are plain SQL
    * over array slices, so the oracle replays the whole pipeline exactly
    * — no bridge needed, and a truncation-offset error (the classic
    * 1-vs-0-based slice bug) flips the candidate set. Same plan shape as
    * v13's tail: narrow scored scan → top-k heap → rerank heap. */
  def matryoshka(spark: SparkSession, dir: String): DataFrame = {
    val q = queryVec(spark, dir)
    val e = Tables.embeddings(spark, dir)
      .withColumn("__prefix", slice(col("embedding"), 1, 16))
    val cand = KnnSearch.topK(e, "__prefix", "vec_id", q.take(16), 50,
      where = col("vec_id") =!= 0)
    KnnSearch.topK(cand.drop("score"), "embedding", "vec_id", q, 10)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
  }

  /** PQ-compressed MULTIVECTOR MaxSim — the other scale path for
    * ColPali-style late interaction (FDE/MUVERA compresses the SET into
    * one vector; this keeps the set and compresses each MEMBER to m PQ
    * codes, the PLAID/ColBERTv2 storage recipe): per query vector one
    * ADC LUT, per label MaxSim ≈ Σ_q max over its doc vectors of the ADC
    * dot product — 8 bytes per patch vector instead of 256, and the
    * per-row work is table lookups, no float dot products. One narrow
    * encode scan + one map-side-combined per-label max aggregation; the
    * oracle replays codebook ∘ encode ∘ both LUT folds ∘ max/sum
    * bit-for-bit (the v12 replay, lifted to the multivector composition). */
  def mvPqMaxSim(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val pq = PqIndex.sampledModel(e, "embedding", "vec_id", m = 8, k = 16)
    val enc = PqIndex.encode(e, "embedding", pq)
    val q0 = queryVec(spark, dir, 0); val q1 = queryVec(spark, dir, 1)
    enc
      .withColumn("s0", PqIndex.adcScore(col("pq_code"), pq.lut(q0), pq.k))
      .withColumn("s1", PqIndex.adcScore(col("pq_code"), pq.lut(q1), pq.k))
      .groupBy("label")
      .agg(max("s0").as("m0"), max("s1").as("m1"))
      .select(col("label").cast("long").as("label"),
        round(col("m0") + col("m1"), 4).as("adc_maxsim"))
      .orderBy(col("adc_maxsim").desc, col("label"))
  }

  /** The binary-quantization TWO-PHASE flow (E5∘E6∘Q1 composed — the
    * 32×-compressed serving path binary codes exist for, pgvector's
    * `binary_quantize` + exact-rerank recipe): phase 1 ranks by Hamming
    * distance over the packed sign bits (codegen'd XOR popcount on 8
    * bytes/vector), keeps a 5k oversample; phase 2 reranks survivors
    * with full float cosine. Both phases replay in SQL (the v4 unpacked
    * bit-compare fragment + the v1 cosine), so the oracle value-checks
    * quantize ∘ pack ∘ Hamming ranking ∘ rerank as one pipeline. */
  def binaryRescore(spark: SparkSession, dir: String): DataFrame = {
    val q = queryVec(spark, dir)
    val cand = Tables.embeddings(spark, dir).filter(col("vec_id") =!= 0)
      .withColumn("__ham", vec.hamming(vec.binary_quantize(col("embedding")),
        vec.binary_quantize(lit(q))))
      .orderBy(col("__ham").asc, col("vec_id").asc).limit(50)
    KnnSearch.topK(cand, "embedding", "vec_id", q, 10)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
  }

  /** [[graft.operators.Evals.rbo]] between the EXACT cosine top-10 and the
    * binary-quantized Hamming top-10 for 20 queries — the label-free
    * "how much does 32× compression distort the RANKING" readout, beside
    * v23's relevance-anchored recall (RBO sees a rank-1↔rank-3 swap recall
    * is blind to). Both rankings ride ONE query-broadcast scored pass with
    * two row_number orderings (deterministic (score, id) total orders);
    * the metric itself is map-only on 20 rows. At scale the rankings come
    * from the serving operators' bounded-heap paths (v1/v21) — this row's
    * window formulation is the oracle-replayable arm. */
  def rboQ(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        vec.binary_quantize(col("embedding")).as("qcode"))
    val scored = e.filter(col("vec_id") >= 20)
      .withColumn("code", vec.binary_quantize(col("embedding")))
      .crossJoin(broadcast(queries))
      .withColumn("cos", vec.cosine_sim(col("embedding"), col("qv")))
      .withColumn("ham", vec.hamming(col("code"), col("qcode")))
    val wA = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    val wB = Window.partitionBy("query_id")
      .orderBy(col("ham").asc, col("vec_id").asc)
    val lists = scored
      .select(col("query_id"), col("vec_id"),
        row_number().over(wA).as("ra"), row_number().over(wB).as("rb"))
      .filter(col("ra") <= 10 || col("rb") <= 10)
      .groupBy("query_id")
      .agg(
        transform(sort_array(collect_list(when(col("ra") <= 10,
          struct(col("ra").as("r"), col("vec_id").as("id"))))),
          x => x.getField("id")).as("a"),
        transform(sort_array(collect_list(when(col("rb") <= 10,
          struct(col("rb").as("r"), col("vec_id").as("id"))))),
          x => x.getField("id")).as("b"))
    graft.operators.Evals.rbo(lists, "query_id", "a", "b", k = 10)
      .orderBy("query_id")
  }

  /** IVF with nprobe == lists scans every cluster, so the result must equal
    * exact brute-force KNN — an oracle-backed end-to-end check of the whole
    * IVF path (k-means build, cluster assignment, probe selection, pruned
    * scan, top-k). */
  def ivfExact(spark: SparkSession, dir: String): DataFrame = {
    val q = queryVec(spark, dir)
    val (indexed, model) = IvfIndex.build(
      Tables.embeddings(spark, dir), "embedding", lists = 16)
    IvfIndex.query(indexed, model, "embedding", "vec_id", q, k = 10, nprobe = 16,
      where = col("vec_id") =!= 0)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Q5 two-phase FDE retrieval (`fast_multivector_store.py:504-607`):
    * phase 1 ranks label-docs by dot(doc_fde, query_fde) and keeps the
    * reference's `min(10k, 75)` oversample; phase 2 rescores candidates with
    * exact float MaxSim and takes top-k. With 10 labels the oversample covers
    * the corpus, so the output provably equals exact MaxSim top-k — which the
    * DuckDB oracle computes directly (the FDE ranking quality itself is
    * asserted in FdeEncoderSpec). */
  def fdeTwoPhase(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.FdeEncoder
    val k = 3
    val oversample = math.min(10 * k, 75)
    val mv = labelMultivectors(spark, dir)
    val enc = FdeEncoder(inputDim = 64, reps = 20, ksim = 5, projDim = 16)
    val docs = enc.encodeColumn(mv, "vecs", "fde", isQuery = false)
    val q = enc.encodeColumn(mv.filter(col("label") === 0), "vecs", "qfde", isQuery = true)
      .select(col("qfde"), col("vecs").as("qvecs"))
    docs.crossJoin(broadcast(q))
      .withColumn("fde_score", vec.dot_product(col("fde"), col("qfde")))
      .orderBy(col("fde_score").desc, col("label"))
      .limit(oversample)
      .select(col("label").cast("long").as("label"),
        round(vec.max_sim_float(col("vecs"), col("qvecs")), 4).as("maxsim"))
      .orderBy(col("maxsim").desc, col("label"))
      .limit(k)
  }

  /** Q5 at scale: FDE phase 1 riding the IVF index instead of a full corpus
    * scan (`fast_multivector_store.py:504-607` runs FDE through TurboPuffer
    * ANN; here the coarse quantizer prunes the FDE table the same way).
    * Full-probe (nprobe == lists) makes phase 1 provably cover the corpus,
    * so — like v8's exactness bridge — the output must equal exact MaxSim
    * top-k, which the oracle computes directly. Dropping nprobe below
    * lists turns on the pruning without changing any plan shape. */
  def fdeIvf(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.FdeEncoder
    val k = 3
    val oversample = math.min(10 * k, 75) // reference fetch cap
    val mv = labelMultivectors(spark, dir)
    val enc = FdeEncoder(inputDim = 64, reps = 20, ksim = 5, projDim = 16)
    val docs = enc.encodeColumn(mv, "vecs", "fde", isQuery = false)
    val qfde = enc.encodeColumn(mv.filter(col("label") === 0), "vecs", "qfde",
      isQuery = true).select("qfde").head().getSeq[Float](0).toArray
    val (indexed, model) = IvfIndex.build(docs, "fde", lists = 4)
    val cand = IvfIndex.query(indexed, model, "fde", "label", qfde,
      k = oversample, nprobe = 4)
    val q = mv.filter(col("label") === 0).select(col("vecs").as("qvecs"))
    cand.crossJoin(broadcast(q))
      .select(col("label").cast("long").as("label"),
        round(vec.max_sim_float(col("vecs"), col("qvecs")), 4).as("maxsim"))
      .orderBy(col("maxsim").desc, col("label"))
      .limit(k)
  }

  /** Bench-only factory: build the IVF index ONCE (at scale the build is an
    * offline job writing a cluster-partitioned table) and return the
    * probe-pruned query as a closure — so the bench times steady-state
    * query latency, not the per-run k-means build. */
  def ivfKnnPrepared(spark: SparkSession, dir: String): () => DataFrame = {
    val q = queryVec(spark, dir)
    val (indexed, model) = IvfIndex.buildSeeded(
      Tables.embeddings(spark, dir), "embedding", "vec_id", lists = 16)
    val cached = indexed.persist()
    cached.count()
    val probed = IvfIndex.probeSeeded(model, q, nprobe = 8)
    () =>
      KnnSearch.topK(
          cached.filter(col("cluster_id").isin(probed: _*)),
          "embedding", "vec_id", q, k = 10, where = col("vec_id") =!= 0)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
  }

  /** Bench-only factory: codebook build + corpus encode are index-time
    * work (offline at scale); the closure times the steady-state ADC scan
    * over the cached 8-codes-per-row table. */
  def pqAdcPrepared(spark: SparkSession, dir: String): () => DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val model = PqIndex.sampledModel(e, "embedding", "vec_id", m = 8, k = 16)
    val q = queryVec(spark, dir)
    val encoded = PqIndex.encode(e, "embedding", model)
      .filter(col("vec_id") =!= 0)
      .select("vec_id", "pq_code").persist()
    encoded.count()
    () =>
      PqIndex.topN(encoded, model, "vec_id", q, n = 20)
        .select(col("vec_id"), array_join(col("pq_code"), ",").as("codes"),
          col("adc_score"))
  }

  /** Bench-only factory: SQ8 train + encode are index-build work; the
    * probe is the ADC scan + TakeOrdered over the persisted codes. */
  def sqAdcPrepared(spark: SparkSession, dir: String): () => DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val model = SqIndex.train(e, "embedding")
    val q = queryVec(spark, dir)
    val encoded = SqIndex.encode(e, "embedding", model)
      .filter(col("vec_id") =!= 0)
      .select("vec_id", "sq_code").persist()
    encoded.count()
    () =>
      SqIndex.topN(encoded, model, "vec_id", q, n = 20)
        .select(col("vec_id"), array_join(col("sq_code"), ",").as("codes"),
          col("adc_score"))
  }

  /** Bench-only factory for the FDE→IVF path: multivector assembly, FDE
    * encoding and the coarse quantizer are index-build work; the returned
    * closure is probe → oversampled candidates → exact MaxSim rescore. */
  def fdeIvfPrepared(spark: SparkSession, dir: String): () => DataFrame = {
    import graft.functions.FdeEncoder
    val k = 3
    val oversample = math.min(10 * k, 75)
    val mv = labelMultivectors(spark, dir)
    val enc = FdeEncoder(inputDim = 64, reps = 20, ksim = 5, projDim = 16)
    val docs = enc.encodeColumn(mv, "vecs", "fde", isQuery = false)
    val qfde = enc.encodeColumn(mv.filter(col("label") === 0), "vecs", "qfde",
      isQuery = true).select("qfde").head().getSeq[Float](0).toArray
    val (indexed, model) = IvfIndex.build(docs, "fde", lists = 4)
    val cached = indexed.persist()
    cached.count()
    val q = mv.filter(col("label") === 0).select(col("vecs").as("qvecs"))
    () =>
      IvfIndex.query(cached, model, "fde", "label", qfde, k = oversample, nprobe = 4)
        .crossJoin(broadcast(q))
        .select(col("label").cast("long").as("label"),
          round(vec.max_sim_float(col("vecs"), col("qvecs")), 4).as("maxsim"))
        .orderBy(col("maxsim").desc, col("label"))
        .limit(k)
  }

  /** Q2+Q11+Q14 composed: authorized semi-join -> filtered KNN -> doc-level
    * max-score grouping joined back to documents. */
  def searchDocs(spark: SparkSession, dir: String): DataFrame = {
    val q = queryVec(spark, dir)
    val docs = Tables.documents(spark, dir)
    val authorized = docs.filter(col("lang") === "en").select(col("doc_id"))
    val corpus = KnnSearch.authorized(
      Tables.embeddings(spark, dir), "vec_id", authorized, "doc_id")
    val hits = KnnSearch.topK(corpus, "embedding", "vec_id", q, 20,
      where = col("vec_id") =!= 0, minScore = -1.0)
    KnnSearch.docLevel(hits.withColumn("doc_id", col("vec_id")), "doc_id")
      .join(docs.select("doc_id", "source"), "doc_id")
      .select(col("doc_id"), round(col("score"), 6).as("score"), col("source"),
        col("chunk_hits"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** E2's query-embed ZERO-VECTOR fallback in-registry (round-12 verdict
    * #4b): the real wire client ([[graft.operators.HttpBatchEmbedder]])
    * pointed at a dead endpoint in the serving path's fail-fast
    * configuration (numRetries=0); `embedText` catches the connection
    * refusal and returns the zero vector (`litellm_embedding.py:108-111`
    * — embed_query degrades instead of erroring), and retrieval proceeds:
    * every cosine against the zero query is exactly 0 (the kernel's
    * zero-denominator contract), so the "top"-10 is the deterministic
    * tie order — first 10 vec_ids at score 0, still k results, never a
    * 500. The live arm runs beside it as the contrast (the v1 ranking).
    * The require() pins that the zeros came from the FALLBACK, not from
    * a server that answered zeros. */
  def embedFallbackQ(spark: SparkSession, dir: String): DataFrame = {
    val dead = graft.operators.HttpBatchEmbedder(
      "http://127.0.0.1:1/embeddings", dim = 64,
      numRetries = 0, timeoutSec = 1)
    val fallbackVec = dead.embedText("what is the revenue trend")
    require(fallbackVec.length == 64 && fallbackVec.forall(_ == 0f),
      "dead-endpoint embedText must return the 64-dim zero vector")
    val e = Tables.embeddings(spark, dir)
    val fb = KnnSearch.topK(e, "embedding", "vec_id", fallbackVec, 10,
        where = col("vec_id") =!= 0)
      .withColumn("arm", lit("fallback"))
    val live = KnnSearch.topK(e, "embedding", "vec_id",
        queryVec(spark, dir), 10, where = col("vec_id") =!= 0)
      .withColumn("arm", lit("live"))
    fb.unionByName(live)
      .select(col("arm"), col("vec_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("arm"), col("score").desc, col("vec_id"))
  }

  /** E3/E4's wire path oracle-pinned (r13 verdict ask #5a — the s12
    * pattern lifted to the multivector client): the REAL
    * [[graft.operators.HttpMultiVectorEmbedder]] pointed at a dead
    * endpoint in the serving path's fail-fast configuration
    * (numRetries=0). BOTH query modalities are driven — `embedTextMulti`
    * (E3, the text wire path) and `embedImageMulti` (E4, the image/base64
    * wire path; `colpali_api_embedding_model.py:75-380`) — and both
    * degrade to the EMPTY multivector, the serving analog of E2's zero
    * vector. Retrieval then proceeds: MaxSim against an empty query
    * multivector scores every document exactly 0.0 (the kernel's
    * empty-side contract), so the "top"-5 is the deterministic tie order
    * — labels 0..4 at 0.0, still k results, never a 500. The live arm
    * (the v5 MaxSim ranking against label 0) runs beside it as the
    * contrast. The require()s pin that the empties came from the
    * FALLBACK, not from a server that answered empties. */
  def colpaliFallbackQ(spark: SparkSession, dir: String): DataFrame = {
    val dead = graft.operators.HttpMultiVectorEmbedder(
      "http://127.0.0.1:1/embeddings", dim = 64,
      numRetries = 0, timeoutSec = 1)
    val fbText = dead.embedTextMulti("what is the revenue trend")
    require(fbText.isEmpty,
      "dead-endpoint embedTextMulti must degrade to the empty multivector")
    val fbImg = dead.embedImageMulti(S11Pages.queryPng(0))
    require(fbImg.isEmpty,
      "dead-endpoint embedImageMulti must degrade to the empty multivector")
    val mv = labelMultivectors(spark, dir)
    val qf: Seq[Seq[Float]] = fbText.map(_.toSeq).toSeq
    val fb = mv.select(lit("fallback").as("arm"),
        col("label").cast("long").as("label"),
        round(vec.max_sim_float(col("vecs"), typedLit(qf)), 4).as("maxsim"))
      .orderBy(col("maxsim").desc, col("label")).limit(5)
    val q = mv.filter(col("label") === 0).select(col("vecs").as("qvecs"))
    val live = mv.crossJoin(broadcast(q))
      .select(lit("live").as("arm"), col("label").cast("long").as("label"),
        round(vec.max_sim_float(col("vecs"), col("qvecs")), 4).as("maxsim"))
      .orderBy(col("maxsim").desc, col("label")).limit(5)
    fb.unionByName(live).orderBy("arm", "label")
  }

  private val qv = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"

  private val exactTop10 =
    s"""SELECT vec_id,
       |  round(list_cosine_similarity(embedding::DOUBLE[], $qv), 6) AS score
       |FROM embeddings WHERE vec_id <> 0
       |ORDER BY list_cosine_similarity(embedding::DOUBLE[], $qv) DESC, vec_id
       |LIMIT 10""".stripMargin

  /** Bradley-Terry preference-strength fit over synthesized pairwise
    * outcomes: 8 "policies" (doc_id % 8 vs doc_id div 8 % 8), winner
    * md5-derandomized with a planted ordering (lower index wins more:
    * threshold 50 + 6*(b-a)), 20 MM iterations. The oracle replays the
    * whole fit - pair aggregation, half-win smoothing, every Jacobi
    * update and normalization as ascending-index list folds - via a
    * recursive CTE carrying the strength vector (the gr2/k1 fixed-point
    * discipline). */
  def btStrengthsQ(spark: SparkSession, dir: String): DataFrame = {
    val cmp = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        (col("doc_id") % 8).as("a"),
        (expr("doc_id div 8") % 8).as("b"))
      .filter(col("a") =!= col("b"))
      .withColumn("r", conv(substring(md5(concat(lit("bt:"), col("doc_id"))),
        1, 6), 16, 10).cast("long") % 100)
      .withColumn("win_a", col("r") < lit(50) + lit(6) * (col("b") - col("a")))
    graft.operators.Mining.btStrengths(cmp, "a", "b", "win_a", iters = 20)
      .orderBy("item")
  }

  /** [[graft.operators.Mining.eloRatings]] over the tr4 match synthesis
    * with its own md5 seed, replayed in doc_id order: 8 policies, winner
    * rule 50 + 6·(b−a) plants a real ordering, K=32 from 1000. The
    * ONLINE path is the point — ratings drift with match order (items 5/6
    * swap ranks at sf0.01 where tr4's order-free fit would not), and the
    * oracle replays every one of the ~437 sequential updates via a
    * recursive CTE carrying the 8-rating list, with the expected-score
    * table interpolated from [[graft.operators.Mining.eloExpectedPpm]]
    * (t60 convention — the sides cannot drift). */
  def eloQ(spark: SparkSession, dir: String): DataFrame = {
    val m = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        (col("doc_id") % 8).as("a"),
        (expr("doc_id div 8") % 8).as("b"))
      .filter(col("a") =!= col("b"))
      .withColumn("r", conv(substring(md5(concat(lit("elo:"), col("doc_id"))),
        1, 6), 16, 10).cast("long") % 100)
      .withColumn("win_a", col("r") < lit(50) + lit(6) * (col("b") - col("a")))
    graft.operators.Mining.eloRatings(m, "a", "b", "win_a", "doc_id")
      .orderBy("item")
  }

  /** [[graft.operators.Mining.plStrengths]] over synthesized 4-way
    * rankings: each doc ranks judges 0..3 by score md5%1000 + 120·item
    * (descending, ties to the lower item id) — the additive bias makes
    * item 3 the usual winner so the fitted ordering is meaningful, while
    * md5 noise keeps all 24 patterns populated. The oracle replays the
    * ENTIRE fit — pattern reduction, lexicographic pattern order, 20
    * Jacobi MM updates with the identical suffix-sum fold order — via a
    * recursive CTE carrying the strength vector (tr4 discipline). */
  def plStrengthsQ(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sc = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(sequence(lit(0L), lit(3L))).as("item"))
      .withColumn("score",
        conv(substring(md5(concat(lit("pl:"), col("doc_id"), lit(":"),
          col("item"))), 1, 6), 16, 10).cast("long") % 1000L +
          lit(120L) * col("item"))
    val rk = sc.withColumn("pos", row_number().over(
      Window.partitionBy("doc_id").orderBy(col("score").desc, col("item"))))
    graft.operators.Mining.plStrengths(rk, "doc_id", "item", "pos", iters = 20)
      .orderBy("item")
  }

  /** All-but-the-Top fit + per-vector top-PC projection (Mu & Viswanath
    * 2018): fixed-point integer S/Gram passes, driver-side 30-iteration
    * power fit (rule 17), projections as floor(p*1000) — the full
    * data->Gram->eigenvector->projection chain is one oracle row, so a
    * single ulp of drift anywhere flips 500 values. NOT a bench headliner
    * (offline index-build-priced fit, the v23 convention). */
  def abttProjectionQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.EmbeddingPostProcess.abtTopProjection(
        graft.Tables.embeddings(spark, dir), "vec_id", "embedding", dim = 64)
      .withColumnRenamed("id", "vec_id")
      .orderBy("vec_id")

  def oracles: Map[String, String] = Map(
    // full matrix-fit replay: integer S/Gram, centered C = G - n*mu*mu^T,
    // 30 power iterations from the exact 0.125 start, largest-|u| sign fix,
    // ascending-index folds throughout (every literal ::DOUBLE)
    "v25_abtt_projection" ->
      """WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings),
        |xb AS (SELECT vec_id, unnest(list_transform(range(64), jj ->
        |         struct_pack(j := jj,
        |           xv := floor(embedding[jj + 1]::DOUBLE * 1000.0::DOUBLE)::BIGINT)))
        |         AS bk FROM e),
        |x AS (SELECT vec_id AS i, bk.j AS j, bk.xv AS xv FROM xb),
        |s AS (SELECT j, sum(xv)::BIGINT AS s FROM x GROUP BY j),
        |nn AS (SELECT count(*)::BIGINT AS n FROM e),
        |g AS (SELECT a.j AS j, b.j AS k, sum(a.xv * b.xv)::BIGINT AS g
        |      FROM x a JOIN x b ON a.i = b.i GROUP BY a.j, b.j),
        |mu AS (SELECT list(s.s::DOUBLE / nn.n ORDER BY j) AS mu FROM s, nn),
        |cm0 AS (SELECT g.j,
        |          list(g.g::DOUBLE - nn.n::DOUBLE * mu.mu[g.j + 1] * mu.mu[g.k + 1]
        |               ORDER BY g.k) AS row
        |        FROM g, nn, mu GROUP BY g.j),
        |cm AS (SELECT list(row ORDER BY j) AS c FROM cm0),
        |it(t, u) AS (
        |  SELECT 0, list_transform(range(64), z -> 0.125::DOUBLE)
        |  UNION ALL
        |  SELECT s2.t + 1,
        |    list_transform(s2.w, y -> y / sqrt(list_sum(list_transform(s2.w, y2 -> y2 * y2))))
        |  FROM (SELECT it.t,
        |          list_transform(range(64), j ->
        |            list_sum(list_transform(range(64), k ->
        |              cm.c[j + 1][k + 1] * it.u[k + 1]))) AS w
        |        FROM it, cm WHERE it.t < 30) s2),
        |fin AS (SELECT u FROM it WHERE t = 30),
        |mx AS (SELECT u, list_max(list_transform(u, y -> abs(y))) AS amax FROM fin),
        |sgn AS (SELECT CASE WHEN u[list_position(list_transform(u, y -> abs(y)), amax)] < 0
        |               THEN list_transform(u, y -> -y) ELSE u END AS u FROM mx)
        |SELECT x.i AS vec_id,
        |  floor(list_sum(list((x.xv::DOUBLE - mu.mu[x.j + 1]) * sgn.u[x.j + 1]
        |    ORDER BY x.j)) * 1000.0)::BIGINT AS proj_fp
        |FROM x, mu, sgn GROUP BY x.i ORDER BY vec_id""".stripMargin,
    // full fit replay: pair aggregation, half-win smoothing (every literal
    // ::DOUBLE — bare decimals type as DECIMAL and quantize the fit), MM
    // iterations + normalization as ascending-index list folds in a
    // recursive CTE carrying the strength vector (gr2/k1 discipline)
    "tr5_pl_strengths" ->
      ("""WITH RECURSIVE it AS (SELECT unnest(range(0, 4)) AS item),
         |sc AS (SELECT d.doc_id, it.item,
         |    ('0x' || substr(md5('pl:' || d.doc_id || ':' || it.item), 1, 6))::BIGINT % 1000
         |      + 120 * it.item AS score
         |  FROM documents d, it),
         |rk AS (SELECT doc_id, item,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, item) AS pos FROM sc),
         |pm AS (SELECT doc_id, list(item ORDER BY pos) AS perm FROM rk GROUP BY doc_id),
         |pc AS (SELECT perm, count(*)::BIGINT AS cnt FROM pm GROUP BY perm),
         |items AS (SELECT DISTINCT unnest(perm) AS i FROM pc),
         |imt AS (SELECT list(i ORDER BY i) AS im FROM items),
         |pidx AS (SELECT list_transform(perm, x -> (list_position(imt.im, x) - 1)::BIGINT) AS pi, cnt
         |         FROM pc, imt),
         |one AS (SELECT list(struct_pack(pi := pi, cnt := cnt) ORDER BY pi) AS ps,
         |         (SELECT count(*) FROM items)::BIGINT AS m FROM pidx),
         |rec(t, g) AS (
         |  SELECT 0, list_transform(range(m), x -> 1.0::DOUBLE) FROM one
         |  UNION ALL
         |  SELECT sub.t + 1, list_transform(sub.g2, x -> x / list_sum(sub.g2))
         |  FROM (SELECT r.t,
         |      list_transform(range(o.m), i ->
         |        list_sum(list_transform(o.ps, pr ->
         |          CASE WHEN list_position(pr.pi, i::BIGINT) IS NOT NULL
         |                AND list_position(pr.pi, i::BIGINT) <= len(pr.pi) - 1
         |               THEN pr.cnt::DOUBLE ELSE 0.0::DOUBLE END))
         |        /
         |        list_sum(list_transform(o.ps, pr ->
         |          pr.cnt::DOUBLE * list_sum(list_transform(range(1, len(pr.pi)), q ->
         |            CASE WHEN list_position(pr.pi, i::BIGINT) IS NOT NULL
         |                  AND q <= list_position(pr.pi, i::BIGINT)
         |                 THEN 1.0::DOUBLE / list_sum(list_transform(range(q, len(pr.pi) + 1), tt ->
         |                        r.g[pr.pi[tt] + 1]))
         |                 ELSE 0.0::DOUBLE END))))) AS g2
         |    FROM rec r, one o WHERE r.t < 20) sub),
         |wins AS (SELECT ix.i AS item, ix.ix,
         |    (SELECT sum(CASE WHEN list_position(p.pi, ix.ix) IS NOT NULL THEN p.cnt ELSE 0 END)
         |     FROM pidx p)::BIGINT AS n_lists,
         |    (SELECT sum(CASE WHEN list_position(p.pi, ix.ix) IS NOT NULL
         |                      AND list_position(p.pi, ix.ix) <= len(p.pi) - 1 THEN p.cnt ELSE 0 END)
         |     FROM pidx p)::BIGINT AS n_wins
         |  FROM (SELECT i, (row_number() OVER (ORDER BY i) - 1)::BIGINT AS ix FROM items) ix)
         |SELECT w.item, w.n_lists, w.n_wins,
         |  floor(rec.g[w.ix + 1] * 1000000.0)::BIGINT AS strength_fp
         |FROM rec, wins w WHERE rec.t = 20 ORDER BY w.item""").stripMargin,
    // full sequential replay: one recursive-CTE chain over the doc_id-
    // ordered matches carrying the 8-rating list; expected scores come
    // from the SAME Scala-emitted table the engine uses (t60 convention);
    // truncating // matches Long / and Spark div on negative deltas
    "tr6_elo" -> {
      val tab = graft.operators.Mining.eloExpectedPpm()
        .mkString("[", ",", "]")
      s"""WITH RECURSIVE
         |et AS MATERIALIZED (SELECT $tab::BIGINT[] AS t),
         |m AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY doc_id) AS i, a, b, win_a
         |  FROM (SELECT doc_id, doc_id % 8 AS a, (doc_id // 8) % 8 AS b,
         |          (('0x' || substr(md5('elo:' || doc_id), 1, 6))::BIGINT % 100)
         |            < 50 + 6 * ((doc_id // 8) % 8 - doc_id % 8) AS win_a
         |        FROM documents WHERE doc_id % 8 <> (doc_id // 8) % 8)),
         |nm AS (SELECT count(*)::BIGINT AS n FROM m),
         |st AS (
         |  SELECT 0::BIGINT AS i, list_transform(range(8), x -> 1000::BIGINT) AS r
         |  UNION ALL
         |  SELECT st.i + 1,
         |    list_transform(range(8), x ->
         |      CASE WHEN x = mm.a THEN st.r[x + 1] + (32 * (CASE WHEN mm.win_a THEN 1000000 ELSE 0 END
         |             - et.t[greatest(least(st.r[mm.b + 1] - st.r[mm.a + 1], 800), -800) + 801])) // 1000000
         |           WHEN x = mm.b THEN st.r[x + 1] - (32 * (CASE WHEN mm.win_a THEN 1000000 ELSE 0 END
         |             - et.t[greatest(least(st.r[mm.b + 1] - st.r[mm.a + 1], 800), -800) + 801])) // 1000000
         |           ELSE st.r[x + 1] END)
         |  FROM st, et, m mm, nm WHERE mm.i = st.i + 1 AND st.i < nm.n),
         |fin AS (SELECT r FROM st, nm WHERE st.i = nm.n),
         |wl AS (SELECT a AS item, sum(CASE WHEN win_a THEN 1 ELSE 0 END)::BIGINT AS w,
         |              count(*)::BIGINT AS c FROM m GROUP BY a),
         |wl2 AS (SELECT b AS item, sum(CASE WHEN NOT win_a THEN 1 ELSE 0 END)::BIGINT AS w,
         |               count(*)::BIGINT AS c FROM m GROUP BY b),
         |tot AS (SELECT item, sum(w)::BIGINT AS wins, sum(c)::BIGINT AS n_matches
         |        FROM (SELECT * FROM wl UNION ALL SELECT * FROM wl2) GROUP BY item)
         |SELECT t.item, t.n_matches, t.wins, f.r[t.item + 1] AS rating,
         |  row_number() OVER (ORDER BY f.r[t.item + 1] DESC, t.item) AS rank_pos
         |FROM tot t, fin f ORDER BY t.item""".stripMargin
    },

    "tr4_bt_strengths" ->
      """WITH RECURSIVE c AS (SELECT doc_id, doc_id % 8 AS a, (doc_id // 8) % 8 AS b,
        |  ('0x' || substr(md5('bt:' || doc_id), 1, 6))::BIGINT % 100 AS r
        |  FROM documents WHERE doc_id % 8 <> (doc_id // 8) % 8),
        |o AS (SELECT a, b, (r < 50 + 6 * (b - a)) AS win_a FROM c),
        |st AS (SELECT least(a, b) AS lo, greatest(a, b) AS hi,
        |         count(*) AS n,
        |         sum(CASE WHEN win_a = (a < b) THEN 1 ELSE 0 END) AS w_lo
        |       FROM o GROUP BY 1, 2),
        |items AS (SELECT DISTINCT i FROM (SELECT lo AS i FROM st UNION ALL SELECT hi FROM st)),
        |idx AS (SELECT i, (row_number() OVER (ORDER BY i) - 1)::BIGINT AS ix FROM items),
        |grid AS (SELECT ai.ix AS i, bj.ix AS j, ai.i AS item_i, bj.i AS item_j
        |         FROM idx ai CROSS JOIN idx bj),
        |pairs AS (SELECT g.i, g.j,
        |    CASE WHEN g.i = g.j OR st.n IS NULL THEN 0.0::DOUBLE
        |         ELSE (st.n + 1)::DOUBLE END AS ns,
        |    CASE WHEN g.i = g.j OR st.n IS NULL THEN 0.0::DOUBLE
        |         ELSE (CASE WHEN g.item_i < g.item_j THEN st.w_lo ELSE st.n - st.w_lo END)::DOUBLE + 0.5::DOUBLE END AS ws,
        |    CASE WHEN g.i = g.j OR st.n IS NULL THEN 0
        |         ELSE (CASE WHEN g.item_i < g.item_j THEN st.w_lo ELSE st.n - st.w_lo END) END AS wraw,
        |    CASE WHEN g.i = g.j OR st.n IS NULL THEN 0 ELSE st.n END AS nraw
        |  FROM grid g LEFT JOIN st
        |    ON st.lo = least(g.item_i, g.item_j) AND st.hi = greatest(g.item_i, g.item_j)),
        |rws AS (SELECT i, list(ns ORDER BY j) AS nrow, list(ws ORDER BY j) AS wrow,
        |          sum(wraw)::BIGINT AS n_wins, sum(nraw)::BIGINT AS n_comps
        |        FROM pairs GROUP BY i),
        |one AS (SELECT list(nrow ORDER BY i) AS nmat,
        |          list(list_sum(wrow) ORDER BY i) AS bigw,
        |          count(*)::BIGINT AS m FROM rws),
        |rec(t, p) AS (
        |  SELECT 0, list_transform(range(m), x -> 1.0::DOUBLE) FROM one
        |  UNION ALL
        |  SELECT sub.t + 1, list_transform(sub.p2, x -> x / list_sum(sub.p2))
        |  FROM (SELECT r.t,
        |          list_transform(range(o.m), i ->
        |            o.bigw[i + 1] / list_sum(list_transform(range(o.m), j ->
        |              CASE WHEN j = i THEN 0.0::DOUBLE
        |                   ELSE o.nmat[i + 1][j + 1] / (r.p[i + 1] + r.p[j + 1]) END)))
        |            AS p2
        |        FROM rec r, one o WHERE r.t < 20) sub)
        |SELECT idx.i AS item, rws.n_wins, rws.n_comps,
        |  floor(rec.p[idx.ix + 1] * 1000000.0)::BIGINT AS strength_fp
        |FROM rec, idx JOIN rws ON rws.i = idx.ix
        |WHERE rec.t = 20 ORDER BY item""".stripMargin,
    // Full PQ-pipeline replay: codebook = subvector slices of vec_id 0..15
    // (row_number order = Spark's orderBy(id).limit(k)), encode = argmin
    // L2^2 per 8-dim slice with first-index tiebreak, ADC = per-subspace
    // query·centroid dots folded i=0..7 (list() ORDER BY i keeps the fold
    // order identical to Spark's aggregate()).
    "v12_pq_adc" ->
      """WITH cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
        |    embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 16),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0),
        |d AS (SELECT e.vec_id, i.i, cb.c,
        |    list_sum(list_transform(range(8), j ->
        |      (v[i.i*8 + j + 1] - cv[i.i*8 + j + 1])
        |      * (v[i.i*8 + j + 1] - cv[i.i*8 + j + 1]))) AS dist
        |  FROM e, range(8) i(i), cb),
        |code AS (SELECT vec_id, i, c FROM (
        |    SELECT vec_id, i, c,
        |      row_number() OVER (PARTITION BY vec_id, i ORDER BY dist, c) AS rn
        |    FROM d) WHERE rn = 1),
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |part AS (SELECT code.vec_id, code.i, code.c,
        |    list_sum(list_transform(range(8), j ->
        |      qv[code.i*8 + j + 1] * cv[code.i*8 + j + 1])) AS p
        |  FROM code JOIN cb USING (c), q),
        |s AS (SELECT vec_id,
        |    array_to_string(list(c ORDER BY i), ',') AS codes,
        |    list_sum(list(p ORDER BY i)) AS adc_score
        |  FROM part GROUP BY vec_id)
        |SELECT vec_id, codes, adc_score FROM s
        |ORDER BY adc_score DESC, vec_id LIMIT 20""".stripMargin,
    // Full SQ8-pipeline replay: per-dim [min,max] over the WHOLE table
    // (train includes vec 0, matching SqIndex.train on the unfiltered
    // corpus), floor-clamp 8-bit encode with degenerate-dim guard, ADC =
    // query · bin-center reconstruction folded j=0..63 (list() ORDER BY j
    // keeps the fold order identical to Spark's aggregate()).
    "v14_sq_adc" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |mm AS (SELECT j, min(v[j+1]) AS mn,
        |         (max(v[j+1]) - min(v[j+1])) / 256.0 AS st
        |       FROM e, range(64) j(j) GROUP BY j),
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT e.vec_id, mm.j, mn, st,
        |        CASE WHEN st = 0 THEN 0
        |             ELSE least(255.0, greatest(0.0, floor((v[j+1] - mn) / st)))::INT
        |        END AS code
        |      FROM e, mm WHERE e.vec_id <> 0),
        |s AS (SELECT vec_id,
        |        array_to_string(list(code ORDER BY j), ',') AS codes,
        |        list_sum(list(qv[j+1] * (mn + (code + 0.5) * st) ORDER BY j)) AS adc_score
        |      FROM c, q GROUP BY vec_id)
        |SELECT vec_id, codes, adc_score FROM s
        |ORDER BY adc_score DESC, vec_id LIMIT 20""".stripMargin,
    "v1_knn_topk" -> exactTop10,
    // the set of vectors at least 0.25-similar to vec 0 (threshold compare
    // on the raw cosine; the scores round at 6dp like v1)
    "v16_range_search" ->
      s"""SELECT vec_id,
         |  round(list_cosine_similarity(embedding::DOUBLE[], $qv), 6) AS score
         |FROM embeddings
         |WHERE vec_id <> 0 AND list_cosine_similarity(embedding::DOUBLE[], $qv) >= 0.25
         |ORDER BY vec_id""".stripMargin,
    // replay of the derandomized JL draw: sign (j,i) = parity of the
    // first hex digit of md5('jl:j:i'); components floor-scale to 1e-6
    // units so every output is an exact integer sum in both engines.
    // Output is one (vec_id, j, component) row per projected dimension —
    // driver-sortable scalars, never a top-level array column (the r8
    // harness wall: pandas cannot canonicalize array cells; Verify now
    // rejects such schemas outright).
    "v18_jl_project" ->
      """WITH s AS (SELECT r1.j, r2.i,
        |    CASE WHEN ('0x' || substr(md5('jl:' || r1.j || ':' || r2.i), 1, 1))::BIGINT % 2 = 0
        |         THEN 1 ELSE -1 END AS sgn
        |  FROM range(16) r1(j), range(64) r2(i)),
        |q AS (SELECT vec_id, r.i, floor(embedding[r.i + 1]::DOUBLE * 1000000)::BIGINT AS qv
        |      FROM embeddings, range(64) r(i))
        |SELECT q.vec_id, s.j, sum(s.sgn * q.qv)::BIGINT AS component
        |FROM q JOIN s ON q.i = s.i GROUP BY q.vec_id, s.j
        |ORDER BY vec_id, j""".stripMargin,
    // full-probe IVF must reproduce the exact result
    "v8_ivf_exact" -> exactTop10,
    // E2 zero-vector fallback: the dead-embedder arm scores EVERY vector
    // exactly 0 (zero-denominator cosine contract), so its top-10 is the
    // tie order — first 10 vec_ids; the live arm is the v1 ranking
    "s12_embed_fallback" ->
      s"""WITH fb AS (SELECT 'fallback' AS arm, vec_id, 0.0 AS score
         |  FROM embeddings WHERE vec_id <> 0 ORDER BY vec_id LIMIT 10),
         |live AS (SELECT 'live' AS arm, vec_id,
         |    round(list_cosine_similarity(embedding::DOUBLE[], $qv), 6) AS score
         |  FROM embeddings WHERE vec_id <> 0
         |  ORDER BY list_cosine_similarity(embedding::DOUBLE[], $qv) DESC, vec_id
         |  LIMIT 10)
         |SELECT arm, vec_id, score FROM fb
         |UNION ALL SELECT arm, vec_id, score FROM live
         |ORDER BY arm, score DESC, vec_id""".stripMargin,
    // E3/E4 empty-multivector fallback: MaxSim vs an empty query = 0.0
    // for every label (tie order = first 5 labels); live arm = v5's
    // MaxSim ranking against label 0, top-5 by (rounded maxsim, label)
    "s13_colpali_fallback" ->
      """WITH mv AS (SELECT label, list(embedding::DOUBLE[] ORDER BY vec_id) AS vecs
        |            FROM embeddings GROUP BY label),
        |fb AS (SELECT 'fallback' AS arm, label::BIGINT AS label,
        |         0.0::DOUBLE AS maxsim
        |       FROM mv ORDER BY label LIMIT 5),
        |live AS (SELECT 'live' AS arm, a.label::BIGINT AS label,
        |    round(list_sum(list_transform(q.vecs, qv ->
        |      list_max(list_transform(a.vecs, dv -> list_dot_product(qv, dv))))), 4) AS maxsim
        |  FROM mv a, (SELECT vecs FROM mv WHERE label = 0) q
        |  ORDER BY maxsim DESC, a.label LIMIT 5)
        |SELECT arm, label, maxsim FROM fb
        |UNION ALL SELECT arm, label, maxsim FROM live
        |ORDER BY arm, label""".stripMargin,
    // seeded zero-Lloyd IVF, replayed end-to-end: codebook = 16 lowest-id
    // vectors, squared-L2 argmin assignment with ties to the lower index
    // (the k1 fold: list_sum of a left-to-right list_transform matches the
    // codegen kernel bit-for-bit), nprobe=8 probe choice by the same
    // metric, exact cosine top-10 + rank inside the probed lists
    "v7_ivf_knn" ->
      """WITH cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
        |    embedding::DOUBLE[] AS cv
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |d AS (SELECT e.vec_id, cb.c,
        |    list_sum(list_transform(range(64), j ->
        |      (v[j+1]-cv[j+1])*(v[j+1]-cv[j+1]))) AS dist
        |  FROM e, cb),
        |asg AS (SELECT vec_id, c AS cluster_id FROM (
        |    SELECT vec_id, c,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
        |    FROM d) WHERE rn = 1),
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |pd AS (SELECT cb.c, list_sum(list_transform(range(64), j ->
        |    (qv[j+1]-cv[j+1])*(qv[j+1]-cv[j+1]))) AS dist FROM cb, q),
        |probe AS (SELECT c FROM pd ORDER BY dist, c LIMIT 8),
        |hits AS (SELECT e.vec_id, asg.cluster_id,
        |    list_cosine_similarity(v, (SELECT qv FROM q)) AS raw
        |  FROM e JOIN asg USING (vec_id)
        |  WHERE asg.cluster_id IN (SELECT c FROM probe) AND e.vec_id <> 0)
        |SELECT vec_id, cluster_id, round(raw, 6) AS score,
        |  row_number() OVER (ORDER BY raw DESC, vec_id) AS rank
        |FROM hits ORDER BY raw DESC, vec_id LIMIT 10""".stripMargin,
    // the v12 PQ replay lifted to the multivector composition: sampled
    // codebook, argmin encode, TWO query LUT folds, per-label max + sum
    "v22_mv_pq_maxsim" ->
      """WITH cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
        |    embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 16),
        |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |d AS (SELECT e.vec_id, e.label, i.i, cb.c,
        |    list_sum(list_transform(range(8), j ->
        |      (v[i.i*8 + j + 1] - cv[i.i*8 + j + 1])
        |      * (v[i.i*8 + j + 1] - cv[i.i*8 + j + 1]))) AS dist
        |  FROM e, range(8) i(i), cb),
        |code AS (SELECT vec_id, label, i, c FROM (
        |    SELECT vec_id, label, i, c,
        |      row_number() OVER (PARTITION BY vec_id, i ORDER BY dist, c) AS rn
        |    FROM d) WHERE rn = 1),
        |q0 AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |q1 AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 1),
        |part AS (SELECT code.vec_id, code.label, code.i,
        |    list_sum(list_transform(range(8), j ->
        |      q0.qv[code.i*8 + j + 1] * cv[code.i*8 + j + 1])) AS p0,
        |    list_sum(list_transform(range(8), j ->
        |      q1.qv[code.i*8 + j + 1] * cv[code.i*8 + j + 1])) AS p1
        |  FROM code JOIN cb USING (c), q0, q1),
        |s AS (SELECT vec_id, label,
        |    list_sum(list(p0 ORDER BY i)) AS s0,
        |    list_sum(list(p1 ORDER BY i)) AS s1
        |  FROM part GROUP BY vec_id, label)
        |SELECT label::BIGINT AS label, round(max(s0) + max(s1), 4) AS adc_maxsim
        |FROM s GROUP BY label ORDER BY adc_maxsim DESC, label""".stripMargin,
    // binary two-phase replay: Hamming over sign bits (the v4 unpacked
    // compare) top-50, full cosine rerank top-10
    "v21_binary_rescore" ->
      s"""WITH q AS (SELECT embedding AS qe, embedding::DOUBLE[] AS qv
        |          FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT vec_id, embedding AS e, embedding::DOUBLE[] AS v
        |      FROM embeddings WHERE vec_id <> 0),
        |p1 AS (SELECT vec_id, v FROM c, q
        |       ORDER BY len(list_filter(range(len(e)), i ->
        |         (e[i+1] > 0) <> (qe[i+1] > 0))) ASC, vec_id
        |       LIMIT 50)
        |SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS score
        |FROM p1, q
        |ORDER BY list_cosine_similarity(v, qv) DESC, vec_id LIMIT 10""".stripMargin,
    // MRL two-phase replay: prefix-16 cosine top-50, full-dim rerank
    // top-10 — both phases exact SQL over array slices
    "v20_matryoshka" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0),
        |p1 AS (SELECT vec_id, v FROM c, q
        |       ORDER BY list_cosine_similarity(v[1:16], qv[1:16]) DESC, vec_id
        |       LIMIT 50)
        |SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS score
        |FROM p1, q
        |ORDER BY list_cosine_similarity(v, qv) DESC, vec_id LIMIT 10""".stripMargin,
    // The nprobe recall curve is a FIXTURE CONSTANT (seeded k-means +
    // integer probe selection, design rule 13), re-derived by the engine
    // on every gate run and pinned here: nprobe=16 MUST be 10/1.0 (full
    // probe == exact, the v8 bridge); the partial-probe rows are the
    // measured seeded values at this sf, FIXTURE-VERSIONED by deriving
    // the tag from the live parquet (count + exact component-sum hash,
    // the same integer arithmetic as VectorQueries.fixtureTag) — a
    // regenerated fixture flips the row red at the tag column, naming
    // fixture drift, not a phantom ANN regression. Any k-means/probe/
    // scoring drift that moves recall still flips hits/recall red.
    "v19_ivf_recall" ->
      """WITH ft AS (SELECT md5(count(*) || ':' ||
        |    sum(floor(embedding[1]*1e6)::BIGINT))[1:8] AS fixture
        |  FROM embeddings)
        |SELECT nprobe, hits, recall::DOUBLE AS recall,
        |  CASE WHEN fixture = 'd731e9e0' THEN fixture
        |       ELSE 'REGENERATED-FIXTURE(' || fixture ||
        |            ')-REMEASURE-PARTIAL-PROBE-ROWS' END AS fixture
        |FROM (VALUES
        |  (1::BIGINT, 1::BIGINT, 0.1),
        |  (2::BIGINT, 4::BIGINT, 0.4),
        |  (4::BIGINT, 4::BIGINT, 0.4),
        |  (8::BIGINT, 10::BIGINT, 1.0),
        |  (16::BIGINT, 10::BIGINT, 1.0)) t(nprobe, hits, recall), ft
        |ORDER BY nprobe""".stripMargin,
    // full-probe + corpus-covering oversample IVF-PQ must too
    "v13_ivfpq" -> exactTop10,
    "v17_ivfpq_residual" -> exactTop10,
    "tr1_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
        |           label AS ql FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
        |s AS (SELECT query_id, c.vec_id,
        |        list_cosine_similarity(v, qv) AS sc,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY list_cosine_similarity(v, qv) DESC, c.vec_id) AS rank
        |      FROM q JOIN c ON c.label <> q.ql)
        |SELECT query_id, rank::BIGINT AS rank, vec_id AS neg_id,
        |  round(sc, 6) AS score
        |FROM s WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // triplet replay: positive = same-label rank 1 (self excluded),
    // negatives = the tr1 fragment at k=3, joined per anchor
    "tr3_triplets" ->
      """WITH q AS (SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS qv,
        |           label AS ql FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
        |p AS (SELECT anchor_id, vec_id AS pos_id, sc AS pos_score FROM (
        |    SELECT q.anchor_id, c.vec_id, list_cosine_similarity(v, qv) AS sc,
        |      row_number() OVER (PARTITION BY anchor_id
        |        ORDER BY list_cosine_similarity(v, qv) DESC, c.vec_id) AS rn
        |    FROM q JOIN c ON c.label = q.ql AND c.vec_id <> q.anchor_id)
        |  WHERE rn = 1),
        |n AS (SELECT anchor_id, rank, vec_id AS neg_id, sc AS neg_score FROM (
        |    SELECT q.anchor_id, c.vec_id, list_cosine_similarity(v, qv) AS sc,
        |      row_number() OVER (PARTITION BY anchor_id
        |        ORDER BY list_cosine_similarity(v, qv) DESC, c.vec_id) AS rank
        |    FROM q JOIN c ON c.label <> q.ql) WHERE rank <= 3)
        |SELECT p.anchor_id, pos_id, round(pos_score, 6) AS pos_score,
        |  rank::BIGINT AS rank, neg_id, round(neg_score, 6) AS neg_score
        |FROM p JOIN n USING (anchor_id) ORDER BY anchor_id, rank""".stripMargin,
    "tr2_semihard" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
        |           label AS ql FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
        |s AS (SELECT query_id, ql, c.vec_id, c.label,
        |        list_cosine_similarity(v, qv) AS sc FROM q, c),
        |p AS (SELECT query_id, max(sc) AS ps FROM s
        |      WHERE label = ql AND vec_id <> query_id GROUP BY query_id),
        |b AS (SELECT s.query_id, s.vec_id, s.sc, p.ps,
        |        row_number() OVER (PARTITION BY s.query_id
        |          ORDER BY s.sc DESC, s.vec_id) AS rank
        |      FROM s JOIN p USING (query_id)
        |      WHERE s.label <> s.ql AND s.sc > p.ps - 0.05 AND s.sc < p.ps)
        |SELECT query_id, rank::BIGINT AS rank, vec_id AS neg_id,
        |  round(sc, 6) AS score, round(ps, 6) AS pos_score
        |FROM b WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // ... and IVF-SQ8, bridging the v14 quantizer into the pruned layout
    "v15_ivfsq" -> exactTop10,
    "v2_knn_batch" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |     c AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings WHERE vec_id >= 5),
        |     s AS (SELECT query_id, c.vec_id,
        |             list_cosine_similarity(v, qv) AS sc,
        |             row_number() OVER (PARTITION BY query_id
        |                                ORDER BY list_cosine_similarity(v, qv) DESC, c.vec_id) AS rank
        |           FROM q, c)
        |SELECT query_id, rank, vec_id, round(sc, 6) AS score
        |FROM s WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "v10_emb_lsh_neardups" ->
      """WITH s AS (SELECT vec_id, embedding,
        |    unnest(range(4)) AS block_idx FROM embeddings),
        |k AS (SELECT vec_id, embedding, block_idx,
        |    block_idx || ':' || array_to_string(
        |      list_transform(list_slice(embedding, block_idx*16 + 1, block_idx*16 + 16),
        |        x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '') AS block_key
        |  FROM s)
        |SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
        |FROM k a JOIN k b ON a.block_key = b.block_key AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "v3_neardup_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS score
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    "v4_quantize_hamming" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id,
         |  lower(list_aggregate(list_transform(range(cast(ceil(len(embedding)/8.0) AS BIGINT)), j ->
         |    lpad(to_hex(list_sum(list_transform(range(8), i ->
         |      CASE WHEN j*8+i < len(embedding) AND embedding[j*8+i+1] > 0
         |           THEN 1<<(7-i) ELSE 0 END))), 2, '0')), 'string_agg', '')) AS packed_hex,
         |  len(list_filter(range(len(embedding)), i ->
         |    (embedding[i+1] > 0) <> (qe[i+1] > 0))) AS hamming
         |FROM embeddings, q WHERE vec_id < 50 ORDER BY vec_id""".stripMargin,
    "v9_fde_twophase" ->
      """WITH mv AS (SELECT label, list(embedding::DOUBLE[] ORDER BY vec_id) AS vecs
        |            FROM embeddings GROUP BY label)
        |SELECT a.label::BIGINT AS label,
        |  round(list_sum(list_transform(q.vecs, qv ->
        |    list_max(list_transform(a.vecs, dv -> list_dot_product(qv, dv))))), 4) AS maxsim
        |FROM mv a, (SELECT vecs FROM mv WHERE label = 0) q
        |ORDER BY maxsim DESC, label LIMIT 3""".stripMargin,
    // full-probe FDE-over-IVF must reproduce the exact MaxSim top-k
    "v11_fde_ivf" ->
      """WITH mv AS (SELECT label, list(embedding::DOUBLE[] ORDER BY vec_id) AS vecs
        |            FROM embeddings GROUP BY label)
        |SELECT a.label::BIGINT AS label,
        |  round(list_sum(list_transform(q.vecs, qv ->
        |    list_max(list_transform(a.vecs, dv -> list_dot_product(qv, dv))))), 4) AS maxsim
        |FROM mv a, (SELECT vecs FROM mv WHERE label = 0) q
        |ORDER BY maxsim DESC, label LIMIT 3""".stripMargin,
    "v5_maxsim_float" ->
      """WITH mv AS (SELECT label, list(embedding::DOUBLE[] ORDER BY vec_id) AS vecs
        |            FROM embeddings GROUP BY label)
        |SELECT a.label::BIGINT AS label,
        |  round(list_sum(list_transform(q.vecs, qv ->
        |    list_max(list_transform(a.vecs, dv -> list_dot_product(qv, dv))))), 4) AS maxsim
        |FROM mv a, (SELECT vecs FROM mv WHERE label = 0) q
        |ORDER BY label""".stripMargin,
    "v6_maxsim_binary" ->
      """WITH mv AS (SELECT label, list(embedding ORDER BY vec_id) AS vecs
        |            FROM embeddings GROUP BY label)
        |SELECT a.label::BIGINT AS label,
        |  round(list_sum(list_transform(q.vecs, qv ->
        |    list_max(list_transform(a.vecs, dv ->
        |      1.0 - len(list_filter(range(len(qv)), i ->
        |        (qv[i+1] > 0) <> (dv[i+1] > 0))) / len(qv))))), 6) AS maxsim
        |FROM mv a, (SELECT vecs FROM mv WHERE label = 0) q
        |ORDER BY label""".stripMargin,
    "s1_search_docs" ->
      s"""WITH hits AS (
         |  SELECT e.vec_id AS doc_id,
         |    list_cosine_similarity(e.embedding::DOUBLE[], $qv) AS sc
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE d.lang = 'en' AND e.vec_id <> 0
         |  ORDER BY sc DESC, e.vec_id LIMIT 20)
         |SELECT h.doc_id AS doc_id, round(max(h.sc), 6) AS score,
         |       any_value(d.source) AS source, count(*) AS chunk_hits
         |FROM hits h JOIN documents d ON h.doc_id = d.doc_id
         |GROUP BY h.doc_id
         |ORDER BY score DESC, h.doc_id""".stripMargin,
    "s2_colpali_padding" ->
      s"""WITH $colpaliOracleBase
         |flat AS (
         |  SELECT document_id, chunk_number, score, false AS is_padding FROM ih
         |  UNION ALL SELECT * FROM padrows)
         |SELECT document_id, chunk_number, round(score, 4) AS score, is_padding
         |FROM flat ORDER BY score DESC, document_id, chunk_number""".stripMargin,
    "s3_colpali_groups" ->
      s"""WITH $colpaliOracleBase
         |claims AS (
         |  SELECT pr.document_id, pr.chunk_number, m.chunk_number AS main_chunk,
         |    row_number() OVER (PARTITION BY pr.document_id, pr.chunk_number
         |                       ORDER BY m.score DESC, m.chunk_number) AS rn
         |  FROM padrows pr JOIN ih m
         |    ON pr.document_id = m.document_id
         |   AND abs(pr.chunk_number - m.chunk_number) <= 1),
         |members AS (
         |  SELECT document_id, chunk_number AS member, chunk_number AS main_chunk,
         |         score, false AS is_padding FROM ih
         |  UNION ALL
         |  SELECT document_id, chunk_number, main_chunk, 0.0, true
         |  FROM claims WHERE rn = 1),
         |g AS (SELECT document_id, main_chunk,
         |        string_agg(member::VARCHAR, ',' ORDER BY member) AS members,
         |        max(CASE WHEN NOT is_padding THEN score END) AS score
         |      FROM members GROUP BY document_id, main_chunk)
         |SELECT document_id, main_chunk::BIGINT AS main_chunk, members,
         |       round(score, 4) AS score
         |FROM g ORDER BY document_id, main_chunk""".stripMargin,
    // Full dispatcher replay, rerank config: folder scope (/en exact) →
    // cosine against vec 0 → min_score 0.05 → top-15 oversample
    // (max(5, min(15, 20))) → token-overlap rerank over the query's 4
    // distinct tokens → top-5 by (rerank desc, id). The rerank model is
    // the deterministic CI stand-in (Serving.tokenOverlapScore) replayed
    // verbatim: |distinct passage tokens ∩ query tokens| / 4.
    "s5_dispatcher_rerank" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |ch AS (SELECT e.vec_id AS document_id, d.text AS content,
        |         e.embedding::DOUBLE[] AS v
        |       FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        |       WHERE d.lang = 'en'),
        |hits AS (SELECT document_id, content,
        |           list_cosine_similarity(v, qv) AS cos
        |         FROM ch, q
        |         WHERE list_cosine_similarity(v, qv) >= 0.05
        |         ORDER BY cos DESC, document_id LIMIT 15),
        |tok AS (SELECT document_id,
        |          list_distinct(list_filter(string_split(
        |            trim(regexp_replace(lower(content), '\s+', ' ', 'g')), ' '),
        |            t -> len(t) > 0)) AS tk
        |        FROM hits),
        |rr AS (SELECT document_id,
        |         len(list_filter(tk,
        |           t -> t IN ('scan', 'vector', 'small', 'merge'))) / 4.0 AS rscore
        |       FROM tok)
        |SELECT document_id, round(rscore, 6) AS score
        |FROM (SELECT document_id, rscore,
        |        row_number() OVER (ORDER BY rscore DESC, document_id) AS rn
        |      FROM rr)
        |WHERE rn <= 5 ORDER BY score DESC, document_id""".stripMargin,
    // Config 4 replay: MaxSim top-18 over the synthesized colpali chunk
    // table (scores fold in the MaxSimFloat op order), then the
    // token-overlap rerank over the synthesized content — text chunks
    // overlap 1.0 and leapfrog every image data-URI (overlap 0), the cut
    // at 6 resolving ties on (doc, chunk).
    "s6_dispatcher_colpali_rerank" ->
      """WITH ch AS (
        |  SELECT label::BIGINT AS document_id,
        |    (row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1)::BIGINT
        |      AS chunk_number,
        |    vec_id, embedding::DOUBLE[] AS e,
        |    CASE WHEN vec_id % 3 <> 2 THEN 'data:image/png;base64,x' || vec_id
        |         ELSE 'text chunk ' || vec_id END AS content
        |  FROM embeddings),
        |q AS (SELECT list(embedding::DOUBLE[] ORDER BY vec_id) AS qv
        |      FROM embeddings WHERE vec_id IN (0, 1)),
        |scored AS (
        |  SELECT document_id, chunk_number, content,
        |    list_sum(list_transform(q.qv, v -> list_dot_product(v, e))) AS score
        |  FROM ch, q),
        |hits AS (SELECT * FROM scored
        |         ORDER BY score DESC, document_id, chunk_number LIMIT 18),
        |tok AS (SELECT document_id, chunk_number,
        |         list_distinct(list_filter(string_split(
        |           trim(regexp_replace(lower(content), '\s+', ' ', 'g')), ' '),
        |           t -> len(t) > 0)) AS tk
        |       FROM hits),
        |rr AS (SELECT document_id, chunk_number,
        |        len(list_filter(tk, t -> t IN ('text', 'chunk'))) / 2.0 AS rscore
        |       FROM tok),
        |sel AS (SELECT document_id, chunk_number, rscore,
        |         row_number() OVER (ORDER BY rscore DESC, document_id,
        |           chunk_number) AS rn
        |       FROM rr)
        |SELECT document_id, chunk_number, round(rscore, 6) AS score
        |FROM sel WHERE rn <= 6
        |ORDER BY score DESC, document_id, chunk_number""".stripMargin,
    // image-query replay: the probe is uniform gray (luma 77), so the
    // engine's decode→4×4 area-average grid provably yields 16 cells of
    // exactly 77, and the HashMultiVectorEmbedder patch vectors are
    // re-derivable symbolically from md5('px:<cell>:77') — component j is
    // md5 byte j%16, mapped ((b-128)/128, exact in binary). MaxSim over
    // singleton chunk multivectors = the ordered dot-product sum
    // (list_sum over a list ORDER BY qi = MaxSimFloat's qi loop order,
    // double accumulation both sides).
    "s7_image_retrieve" ->
      """WITH hexmap AS (SELECT printf('%02x', i) AS hx, i AS bv
        |  FROM range(256) t(i)),
        |qtok AS (SELECT i AS qi, md5('px:' || i || ':77') AS h
        |  FROM range(16) t(i)),
        |qcomp AS (SELECT qi, j, (bv - 128) / 128.0 AS c
        |  FROM qtok CROSS JOIN range(64) r(j)
        |  JOIN hexmap ON hx = substr(h, ((j % 16) * 2) + 1, 2)),
        |qv0 AS (SELECT qi, list(c ORDER BY j) AS v FROM qcomp GROUP BY qi),
        |q AS (SELECT list(v ORDER BY qi) AS qv FROM qv0),
        |ch AS (
        |  SELECT label::BIGINT AS document_id,
        |    (row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1)::BIGINT
        |      AS chunk_number,
        |    embedding::DOUBLE[] AS e
        |  FROM embeddings),
        |scored AS (SELECT document_id, chunk_number,
        |    list_sum(list_transform(q.qv, v -> list_dot_product(v, e))) AS score
        |  FROM ch, q)
        |SELECT document_id, chunk_number, round(score, 6) AS score
        |FROM scored ORDER BY score DESC, document_id, chunk_number
        |LIMIT 6""".stripMargin,
    // pruned-configuration recall constants, fixture-versioned exactly
    // like v19 (same derived-tag CTE): a quantizer/probe/rerank change
    // moves hits red; a testdata regen moves the tag column red with an
    // explanatory value.
    "v23_ann_recall" ->
      """WITH ft AS (SELECT md5(count(*) || ':' ||
        |    sum(floor(embedding[1]*1e6)::BIGINT))[1:8] AS fx
        |  FROM embeddings)
        |SELECT rung, hits, k, recall::DOUBLE AS recall,
        |  CASE WHEN fx = 'd731e9e0' THEN fx
        |       ELSE 'REGENERATED-FIXTURE(' || fx ||
        |            ')-REMEASURE-RECALL-ROWS' END AS fixture
        |FROM (VALUES
        |  ('v12_pq_adc', 2::BIGINT, 10::BIGINT, 0.2),
        |  ('v13_ivfpq', 4::BIGINT, 10::BIGINT, 0.4),
        |  ('v14_sq_adc', 10::BIGINT, 10::BIGINT, 1.0),
        |  ('v15_ivfsq', 4::BIGINT, 10::BIGINT, 0.4),
        |  ('v17_ivfpq_residual', 4::BIGINT, 10::BIGINT, 0.4),
        |  ('v20_matryoshka', 1::BIGINT, 10::BIGINT, 0.1),
        |  ('v21_binary_rescore', 5::BIGINT, 10::BIGINT, 0.5),
        |  ('v22_mv_pq_maxsim', 3::BIGINT, 5::BIGINT, 0.6))
        |  t(rung, hits, k, recall), ft
        |ORDER BY rung""".stripMargin,
    // full metric replay: the v2 per-query ranking CTE at rank<=10,
    // binary label relevance, DCG folded in RANK order (list ORDER BY
    // rank = the engine's sorted-struct fold), IDCG over a literal range
    "v24_ranking_metrics" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
        |       label AS ql FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
        |      FROM embeddings WHERE vec_id >= 20),
        |s AS (SELECT query_id, c.vec_id, c.label, ql,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY list_cosine_similarity(v, qv) DESC, c.vec_id) AS rank
        |      FROM q, c),
        |r10 AS (SELECT query_id, rank,
        |         CASE WHEN label = ql THEN 1 ELSE 0 END AS rel
        |        FROM s WHERE rank <= 10),
        |nr AS (SELECT query_id, count(*) AS n_rel FROM q
        |       JOIN c ON c.label = q.ql GROUP BY query_id),
        |m AS (SELECT query_id, sum(rel)::BIGINT AS hits,
        |        min(CASE WHEN rel = 1 THEN rank END) AS fr,
        |        list_sum(list(rel / log2(rank + 1.0) ORDER BY rank)) AS dcg
        |      FROM r10 GROUP BY query_id),
        |f AS (SELECT m.query_id, n_rel, hits, least(n_rel, 10) AS ideal,
        |        list_sum(list_transform(range(1, least(n_rel, 10)+1),
        |          i -> 1.0/log2(i + 1.0))) AS idcg,
        |        dcg, fr
        |      FROM m JOIN nr USING (query_id))
        |SELECT query_id, n_rel::BIGINT AS n_rel, hits,
        |  round(hits / ideal, 6) AS recall_at_k,
        |  round(coalesce(1.0 / fr, 0.0), 6) AS mrr,
        |  round(dcg / idcg, 6) AS ndcg_at_k
        |FROM f ORDER BY query_id""".stripMargin,
    // the visual stack replayed symbolically from the planting rule: block
    // lumas -> md5 patch vectors (the s7 machinery) -> MaxSim -> chunk
    // top-10 -> doc ranking -> the v24 metric fold
    "s11_colpali_e2e_quality" ->
      """WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 100),
        |pages AS (SELECT doc_id, p FROM docs, range(2) t(p) WHERE p < 1 + doc_id % 2),
        |pb AS (SELECT doc_id, p, i,
        |    CASE WHEN i < 14 THEN 40 + ((doc_id % 10) * 13 + i * 7) % 150
        |         ELSE 40 + (doc_id * 11 + p * 3 + i) % 150 END AS v
        |  FROM pages, range(16) b(i)),
        |hexmap AS (SELECT printf('%02x', i) AS hx, i AS bv FROM range(256) t(i)),
        |ph AS (SELECT doc_id, p, i, md5('px:' || i || ':' || v) AS h FROM pb),
        |pc AS (SELECT doc_id, p, i, j, (bv - 128) / 128.0 AS c
        |  FROM ph CROSS JOIN range(16) r(j) JOIN hexmap ON hx = substr(h, (j * 2) + 1, 2)),
        |pvv AS (SELECT doc_id, p, i, list(c ORDER BY j) AS v FROM pc GROUP BY 1, 2, 3),
        |pg AS (SELECT doc_id, p, list(v ORDER BY i) AS pv FROM pvv GROUP BY 1, 2),
        |qb AS (SELECT g, i,
        |    CASE WHEN i < 14 THEN 40 + (g * 13 + i * 7) % 150
        |         ELSE 40 + (g * 17 + i) % 150 END AS v
        |  FROM range(10) q(g), range(16) b(i)),
        |qh AS (SELECT g, i, md5('px:' || i || ':' || v) AS h FROM qb),
        |qc AS (SELECT g, i, j, (bv - 128) / 128.0 AS c
        |  FROM qh CROSS JOIN range(16) r(j) JOIN hexmap ON hx = substr(h, (j * 2) + 1, 2)),
        |qvv AS (SELECT g, i, list(c ORDER BY j) AS v FROM qc GROUP BY 1, 2),
        |qg AS (SELECT g, list(v ORDER BY i) AS qv FROM qvv GROUP BY 1),
        |sc AS (SELECT g, doc_id, p,
        |    list_sum(list_transform(qv, q ->
        |      list_max(list_transform(pv, e -> list_dot_product(q, e))))) AS score
        |  FROM qg, pg),
        |top AS (SELECT g, doc_id, score,
        |    row_number() OVER (PARTITION BY g ORDER BY score DESC, doc_id, p) AS cr
        |  FROM sc),
        |dr AS (SELECT g, doc_id, max(score) AS ds FROM top WHERE cr <= 10 GROUP BY 1, 2),
        |rk AS (SELECT g, doc_id,
        |    row_number() OVER (PARTITION BY g ORDER BY ds DESC, doc_id) AS rank FROM dr),
        |rel AS (SELECT (doc_id % 10) AS g, doc_id FROM docs),
        |r10 AS (SELECT rk.g, rank,
        |    CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
        |  FROM rk LEFT JOIN rel ON rel.g = rk.g AND rel.doc_id = rk.doc_id
        |  WHERE rank <= 10),
        |nr AS (SELECT g, count(*) AS n_rel FROM rel GROUP BY g),
        |m AS (SELECT g, sum(is_rel)::BIGINT AS hits,
        |    min(CASE WHEN is_rel = 1 THEN rank END) AS fr,
        |    list_sum(list(is_rel / log2(rank + 1.0) ORDER BY rank)) AS dcg
        |  FROM r10 GROUP BY g),
        |f AS (SELECT m.g, n_rel, hits, least(n_rel, 10) AS ideal,
        |    list_sum(list_transform(range(1, least(n_rel, 10) + 1),
        |      i -> 1.0/log2(i + 1.0))) AS idcg,
        |    dcg, fr
        |  FROM m JOIN nr USING (g))
        |SELECT g::BIGINT AS query_id, n_rel::BIGINT AS n_rel, hits,
        |  round(hits / ideal, 6) AS recall_at_k,
        |  round(coalesce(1.0 / fr, 0.0), 6) AS mrr,
        |  round(dcg / idcg, 6) AS ndcg_at_k
        |FROM f ORDER BY query_id""".stripMargin,

    // both rankings replayed (v2's cosine order + v21's sign-bit Hamming
    // order), then the EXACT-rational RBO: coefficients interpolated from
    // Evals.rboCoefficients — the identical integers the engine multiplies
    "v26_rbo" -> {
      val (cs, dd) = graft.operators.Evals.rboCoefficients(10, 9, 10)
      val terms = (1 to 10).map(d =>
        s"${cs(d - 1)}::HUGEINT * len(list_intersect(a[1:$d], b[1:$d]))")
        .mkString(" + ")
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
         |           embedding AS qe FROM embeddings WHERE vec_id < 20),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS v, embedding AS e
         |      FROM embeddings WHERE vec_id >= 20),
         |s AS (SELECT query_id, c.vec_id,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY list_cosine_similarity(v, qv) DESC, c.vec_id) AS ra,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY len(list_filter(range(len(e)), i ->
         |            (e[i+1] > 0) <> (qe[i+1] > 0))) ASC, c.vec_id) AS rb
         |      FROM q, c),
         |la AS (SELECT query_id, list(vec_id ORDER BY ra) AS a FROM s
         |       WHERE ra <= 10 GROUP BY query_id),
         |lb AS (SELECT query_id, list(vec_id ORDER BY rb) AS b FROM s
         |       WHERE rb <= 10 GROUP BY query_id),
         |j AS (SELECT query_id, a, b FROM la JOIN lb USING (query_id))
         |SELECT query_id, len(list_intersect(a, b))::BIGINT AS overlap_at_k,
         |  (($terms) // $dd::HUGEINT)::BIGINT AS rbo_ppm
         |FROM j ORDER BY query_id""".stripMargin
    },
    // full-stack replay: p1's chunk+hash-bucket CTEs -> exact-integer
    // cosine (dot / (sqrt(nq)*sqrt(nc)), the engine's parenthesization) ->
    // chunk top-10 per query -> doc-level max -> v24's metric fold
    "s8_e2e_quality" ->
      """WITH docs AS (SELECT doc_id, text, lang, source FROM documents WHERE doc_id < 100),
        |ch AS (
        |  SELECT doc_id, (s - 1) // 160 AS chunk_number, substr(text, s::INT, 200) AS chunk
        |  FROM docs, generate_series(1, 100000, 160) AS t(s)
        |  WHERE s <= greatest(len(text) - 40, 1)
        |    AND len(substr(text, s::INT, 200)) > 0),
        |cb AS (
        |  SELECT doc_id, chunk_number,
        |    ('0x' || substr(md5('42:' || tok), 1, 4))::BIGINT % 64 AS idx,
        |    sum(CASE WHEN ('0x' || substr(md5('42:' || tok), 5, 2))::BIGINT % 2 = 0
        |             THEN 1 ELSE -1 END) AS s
        |  FROM ch, unnest(list_filter(string_split_regex(lower(chunk), '\s+'), t -> len(t) > 0)) AS u(tok)
        |  GROUP BY doc_id, chunk_number, idx),
        |q AS (SELECT doc_id AS query_id, substr(text, 81, 80) AS qtext FROM docs WHERE doc_id < 10),
        |qb AS (
        |  SELECT query_id,
        |    ('0x' || substr(md5('42:' || tok), 1, 4))::BIGINT % 64 AS idx,
        |    sum(CASE WHEN ('0x' || substr(md5('42:' || tok), 5, 2))::BIGINT % 2 = 0
        |             THEN 1 ELSE -1 END) AS s
        |  FROM q, unnest(list_filter(string_split_regex(lower(qtext), '\s+'), t -> len(t) > 0)) AS u(tok)
        |  GROUP BY query_id, idx),
        |qn AS (SELECT query_id, sum(s * s) AS nq FROM qb GROUP BY query_id),
        |cn AS (SELECT doc_id, chunk_number, sum(s * s) AS nc FROM cb GROUP BY doc_id, chunk_number),
        |dots AS (
        |  SELECT qb.query_id, cb.doc_id, cb.chunk_number, sum(qb.s * cb.s) AS dot
        |  FROM qb JOIN cb ON qb.idx = cb.idx
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  -- LEFT JOIN qn + coalesce: a token-less query embeds to the zero
        |  -- vector and scores 0.0 against EVERY chunk (the engine's
        |  -- denom==0 rule) -- it must still rank docs, not vanish
        |  SELECT q.query_id, cn.doc_id, cn.chunk_number,
        |    CASE WHEN sqrt(coalesce(qn.nq, 0)::DOUBLE) * sqrt(cn.nc::DOUBLE) = 0 THEN 0.0
        |         ELSE coalesce(dots.dot, 0)::DOUBLE / (sqrt(qn.nq::DOUBLE) * sqrt(cn.nc::DOUBLE))
        |    END AS score
        |  FROM q LEFT JOIN qn ON q.query_id = qn.query_id
        |  CROSS JOIN cn
        |  LEFT JOIN dots ON dots.query_id = q.query_id
        |    AND dots.doc_id = cn.doc_id AND dots.chunk_number = cn.chunk_number),
        |hits AS (
        |  SELECT query_id, doc_id, score,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id) AS crank
        |  FROM scored),
        |dl AS (
        |  SELECT query_id, doc_id, max(score) AS dscore
        |  FROM hits WHERE crank <= 10 GROUP BY query_id, doc_id),
        |ranked AS (
        |  SELECT query_id, doc_id AS id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dscore DESC, doc_id) AS rank
        |  FROM dl),
        |rel AS (
        |  SELECT q.query_id, d.doc_id AS id
        |  FROM (SELECT doc_id AS query_id, lang, source FROM docs WHERE doc_id < 10) q
        |  JOIN docs d ON d.lang = q.lang AND d.source = q.source),
        |r10 AS (
        |  SELECT r.query_id, r.rank,
        |    CASE WHEN rel.id IS NOT NULL THEN 1 ELSE 0 END AS relv
        |  FROM ranked r LEFT JOIN rel ON r.query_id = rel.query_id AND r.id = rel.id
        |  WHERE r.rank <= 10),
        |nr AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY query_id),
        |m AS (SELECT query_id, sum(relv)::BIGINT AS hits,
        |        min(CASE WHEN relv = 1 THEN rank END) AS fr,
        |        list_sum(list(relv / log2(rank + 1.0) ORDER BY rank)) AS dcg
        |      FROM r10 GROUP BY query_id),
        |f AS (SELECT nr.query_id, n_rel, coalesce(hits, 0) AS hits, least(n_rel, 10) AS ideal,
        |        list_sum(list_transform(range(1, least(n_rel, 10) + 1),
        |          i -> 1.0 / log2(i + 1.0))) AS idcg,
        |        coalesce(dcg, 0.0) AS dcg, fr
        |      FROM nr LEFT JOIN m ON nr.query_id = m.query_id)
        |SELECT query_id, n_rel::BIGINT AS n_rel, hits,
        |  round(hits / ideal, 6) AS recall_at_k,
        |  round(coalesce(1.0 / fr, 0.0), 6) AS mrr,
        |  round(dcg / idcg, 6) AS ndcg_at_k
        |FROM f ORDER BY query_id""".stripMargin,
    // s8's replay with the config-3 stages spliced in: cosine top-20
    // (oversample max(k, min(3k, 20))) -> token-overlap rerank (distinct
    // passage tokens ∩ distinct query tokens / |query tokens|) -> cut 10
    // on the (rscore, doc, chunk) total order -> doc-level max
    "s9_e2e_quality_rerank" ->
      """WITH docs AS (SELECT doc_id, text, lang, source FROM documents WHERE doc_id < 100),
        |ch AS (
        |  SELECT doc_id, (s - 1) // 160 AS chunk_number, substr(text, s::INT, 200) AS chunk
        |  FROM docs, generate_series(1, 100000, 160) AS t(s)
        |  WHERE s <= greatest(len(text) - 40, 1)
        |    AND len(substr(text, s::INT, 200)) > 0),
        |cb AS (
        |  SELECT doc_id, chunk_number,
        |    ('0x' || substr(md5('42:' || tok), 1, 4))::BIGINT % 64 AS idx,
        |    sum(CASE WHEN ('0x' || substr(md5('42:' || tok), 5, 2))::BIGINT % 2 = 0
        |             THEN 1 ELSE -1 END) AS s
        |  FROM ch, unnest(list_filter(string_split_regex(lower(chunk), '\s+'), t -> len(t) > 0)) AS u(tok)
        |  GROUP BY doc_id, chunk_number, idx),
        |q AS (SELECT doc_id AS query_id, substr(text, 81, 80) AS qtext FROM docs WHERE doc_id < 10),
        |qb AS (
        |  SELECT query_id,
        |    ('0x' || substr(md5('42:' || tok), 1, 4))::BIGINT % 64 AS idx,
        |    sum(CASE WHEN ('0x' || substr(md5('42:' || tok), 5, 2))::BIGINT % 2 = 0
        |             THEN 1 ELSE -1 END) AS s
        |  FROM q, unnest(list_filter(string_split_regex(lower(qtext), '\s+'), t -> len(t) > 0)) AS u(tok)
        |  GROUP BY query_id, idx),
        |qn AS (SELECT query_id, sum(s * s) AS nq FROM qb GROUP BY query_id),
        |cn AS (SELECT doc_id, chunk_number, sum(s * s) AS nc FROM cb GROUP BY doc_id, chunk_number),
        |dots AS (
        |  SELECT qb.query_id, cb.doc_id, cb.chunk_number, sum(qb.s * cb.s) AS dot
        |  FROM qb JOIN cb ON qb.idx = cb.idx
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT q.query_id, cn.doc_id, cn.chunk_number,
        |    CASE WHEN sqrt(coalesce(qn.nq, 0)::DOUBLE) * sqrt(cn.nc::DOUBLE) = 0 THEN 0.0
        |         ELSE coalesce(dots.dot, 0)::DOUBLE / (sqrt(qn.nq::DOUBLE) * sqrt(cn.nc::DOUBLE))
        |    END AS score
        |  FROM q LEFT JOIN qn ON q.query_id = qn.query_id
        |  CROSS JOIN cn
        |  LEFT JOIN dots ON dots.query_id = q.query_id
        |    AND dots.doc_id = cn.doc_id AND dots.chunk_number = cn.chunk_number),
        |cand AS (
        |  SELECT query_id, doc_id, chunk_number FROM (
        |    SELECT query_id, doc_id, chunk_number,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, doc_id) AS crank
        |    FROM scored) WHERE crank <= 20),
        |qtk AS (SELECT query_id,
        |    list_distinct(list_filter(string_split_regex(lower(qtext), '\s+'),
        |      t -> len(t) > 0)) AS qt FROM q),
        |rr AS (
        |  SELECT c.query_id, c.doc_id, c.chunk_number,
        |    CASE WHEN len(qt) = 0 THEN 0.0
        |         ELSE len(list_filter(
        |            list_distinct(list_filter(
        |              string_split(trim(regexp_replace(lower(ch.chunk), '\s+', ' ', 'g')), ' '),
        |              t -> len(t) > 0)),
        |            t -> list_contains(qt, t)))::DOUBLE / len(qt)
        |    END AS rscore
        |  FROM cand c
        |  JOIN ch ON ch.doc_id = c.doc_id AND ch.chunk_number = c.chunk_number
        |  JOIN qtk ON qtk.query_id = c.query_id),
        |kept AS (
        |  SELECT query_id, doc_id, rscore FROM (
        |    SELECT query_id, doc_id, rscore,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY rscore DESC, doc_id, chunk_number) AS rk
        |    FROM rr) WHERE rk <= 10),
        |dl AS (
        |  SELECT query_id, doc_id, max(rscore) AS dscore
        |  FROM kept GROUP BY query_id, doc_id),
        |ranked AS (
        |  SELECT query_id, doc_id AS id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dscore DESC, doc_id) AS rank
        |  FROM dl),
        |rel AS (
        |  SELECT q.query_id, d.doc_id AS id
        |  FROM (SELECT doc_id AS query_id, lang, source FROM docs WHERE doc_id < 10) q
        |  JOIN docs d ON d.lang = q.lang AND d.source = q.source),
        |r10 AS (
        |  SELECT r.query_id, r.rank,
        |    CASE WHEN rel.id IS NOT NULL THEN 1 ELSE 0 END AS relv
        |  FROM ranked r LEFT JOIN rel ON r.query_id = rel.query_id AND r.id = rel.id
        |  WHERE r.rank <= 10),
        |nr AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY query_id),
        |m AS (SELECT query_id, sum(relv)::BIGINT AS hits,
        |        min(CASE WHEN relv = 1 THEN rank END) AS fr,
        |        list_sum(list(relv / log2(rank + 1.0) ORDER BY rank)) AS dcg
        |      FROM r10 GROUP BY query_id),
        |f AS (SELECT nr.query_id, n_rel, coalesce(hits, 0) AS hits, least(n_rel, 10) AS ideal,
        |        list_sum(list_transform(range(1, least(n_rel, 10) + 1),
        |          i -> 1.0 / log2(i + 1.0))) AS idcg,
        |        coalesce(dcg, 0.0) AS dcg, fr
        |      FROM nr LEFT JOIN m ON nr.query_id = m.query_id)
        |SELECT query_id, n_rel::BIGINT AS n_rel, hits,
        |  round(hits / ideal, 6) AS recall_at_k,
        |  round(coalesce(1.0 / fr, 0.0), 6) AS mrr,
        |  round(dcg / idcg, 6) AS ndcg_at_k
        |FROM f ORDER BY query_id""".stripMargin,
    // s8's retrieval replay cut at CHUNK level on the total (score desc,
    // doc, chunk) order, then the RAGAS pair: context_precision@10 via
    // the lcm(1..10)=2520 exact-integer rank weights, faithfulness via
    // distinct-normalized-token evidence of the planted answer
    // (substr(text,1,120)) in the union of retrieved chunk texts
    "ev19_ragas" ->
      """WITH docs AS (SELECT doc_id, text, lang, source FROM documents WHERE doc_id < 100),
        |ch AS (
        |  SELECT doc_id, (s - 1) // 160 AS chunk_number, substr(text, s::INT, 200) AS chunk
        |  FROM docs, generate_series(1, 100000, 160) AS t(s)
        |  WHERE s <= greatest(len(text) - 40, 1)
        |    AND len(substr(text, s::INT, 200)) > 0),
        |cb AS (
        |  SELECT doc_id, chunk_number,
        |    ('0x' || substr(md5('42:' || tok), 1, 4))::BIGINT % 64 AS idx,
        |    sum(CASE WHEN ('0x' || substr(md5('42:' || tok), 5, 2))::BIGINT % 2 = 0
        |             THEN 1 ELSE -1 END) AS s
        |  FROM ch, unnest(list_filter(string_split_regex(lower(chunk), '\s+'), t -> len(t) > 0)) AS u(tok)
        |  GROUP BY doc_id, chunk_number, idx),
        |q AS (SELECT doc_id AS query_id, substr(text, 81, 80) AS qtext FROM docs WHERE doc_id < 10),
        |qb AS (
        |  SELECT query_id,
        |    ('0x' || substr(md5('42:' || tok), 1, 4))::BIGINT % 64 AS idx,
        |    sum(CASE WHEN ('0x' || substr(md5('42:' || tok), 5, 2))::BIGINT % 2 = 0
        |             THEN 1 ELSE -1 END) AS s
        |  FROM q, unnest(list_filter(string_split_regex(lower(qtext), '\s+'), t -> len(t) > 0)) AS u(tok)
        |  GROUP BY query_id, idx),
        |qn AS (SELECT query_id, sum(s * s) AS nq FROM qb GROUP BY query_id),
        |cn AS (SELECT doc_id, chunk_number, sum(s * s) AS nc FROM cb GROUP BY doc_id, chunk_number),
        |dots AS (
        |  SELECT qb.query_id, cb.doc_id, cb.chunk_number, sum(qb.s * cb.s) AS dot
        |  FROM qb JOIN cb ON qb.idx = cb.idx
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT q.query_id, cn.doc_id, cn.chunk_number,
        |    CASE WHEN sqrt(coalesce(qn.nq, 0)::DOUBLE) * sqrt(cn.nc::DOUBLE) = 0 THEN 0.0
        |         ELSE coalesce(dots.dot, 0)::DOUBLE / (sqrt(qn.nq::DOUBLE) * sqrt(cn.nc::DOUBLE))
        |    END AS score
        |  FROM q LEFT JOIN qn ON q.query_id = qn.query_id
        |  CROSS JOIN cn
        |  LEFT JOIN dots ON dots.query_id = q.query_id
        |    AND dots.doc_id = cn.doc_id AND dots.chunk_number = cn.chunk_number),
        |r10 AS (
        |  SELECT query_id, doc_id, chunk_number, rank FROM (
        |    SELECT query_id, doc_id, chunk_number,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, doc_id, chunk_number) AS rank
        |    FROM scored) WHERE rank <= 10),
        |rel AS (
        |  SELECT q2.query_id, d.doc_id AS id
        |  FROM (SELECT doc_id AS query_id, lang, source FROM docs WHERE doc_id < 10) q2
        |  JOIN docs d ON d.lang = q2.lang AND d.source = q2.source),
        |rv AS (
        |  SELECT r.query_id, r.rank, r.doc_id, r.chunk_number,
        |    CASE WHEN rel.id IS NOT NULL THEN 1 ELSE 0 END AS relv
        |  FROM r10 r LEFT JOIN rel ON r.query_id = rel.query_id AND r.doc_id = rel.id),
        |cum AS (SELECT *, sum(relv) OVER (PARTITION BY query_id ORDER BY rank) AS cum_hits FROM rv),
        |cp AS (SELECT query_id, count(*)::BIGINT AS n_contexts, sum(relv)::BIGINT AS rel_in_k,
        |         sum(relv * cum_hits * (2520 // rank))::BIGINT AS num
        |       FROM cum GROUP BY query_id),
        |ans AS (SELECT doc_id AS query_id, substr(text, 1, 120) AS answer FROM docs WHERE doc_id < 10),
        |claims AS (SELECT query_id,
        |    unnest(list_distinct(list_filter(
        |      string_split(trim(regexp_replace(lower(answer), '\s+', ' ', 'g')), ' '),
        |      t -> len(t) > 0))) AS tok FROM ans),
        |ctok AS (SELECT DISTINCT r.query_id, u.tok
        |  FROM r10 r JOIN ch ON ch.doc_id = r.doc_id AND ch.chunk_number = r.chunk_number,
        |  unnest(list_filter(
        |    string_split(trim(regexp_replace(lower(ch.chunk), '\s+', ' ', 'g')), ' '),
        |    t -> len(t) > 0)) AS u(tok)),
        |ncl AS (SELECT query_id, count(*)::BIGINT AS n_claims FROM claims GROUP BY query_id),
        |sup AS (SELECT c.query_id, count(x.tok)::BIGINT AS n_supported
        |  FROM claims c LEFT JOIN ctok x
        |    ON c.query_id = x.query_id AND c.tok = x.tok
        |  GROUP BY c.query_id)
        |SELECT cp.query_id, n_contexts, rel_in_k,
        |  (CASE WHEN rel_in_k > 0 THEN (num * 1000000) // (2520 * rel_in_k)
        |        ELSE 0 END)::BIGINT AS context_precision_ppm,
        |  coalesce(n_claims, 0)::BIGINT AS n_claims,
        |  coalesce(n_supported, 0)::BIGINT AS n_supported,
        |  (CASE WHEN coalesce(n_claims, 0) > 0
        |        THEN (n_supported * 1000000) // n_claims
        |        ELSE 0 END)::BIGINT AS faithfulness_ppm
        |FROM cp LEFT JOIN ncl ON cp.query_id = ncl.query_id
        |LEFT JOIN sup ON cp.query_id = sup.query_id
        |ORDER BY cp.query_id""".stripMargin
  )

  /** Shared s2/s3 oracle prefix: chunk-table synthesis, MaxSim scoring
    * (double accumulation in the same order as MaxSimFloat → bitwise
    * equal), top-k, image filter, ±1 padding keys, image-only pad rows. */
  private def colpaliOracleBase: String =
    """ch AS (
      |  SELECT label::BIGINT AS document_id,
      |    (row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1)::BIGINT
      |      AS chunk_number,
      |    vec_id, embedding::DOUBLE[] AS e,
      |    CASE WHEN vec_id % 11 = 5 THEN true
      |         WHEN vec_id % 11 = 7 THEN false
      |         ELSE vec_id % 3 <> 2 END AS is_image
      |  FROM embeddings),
      |q AS (SELECT list(embedding::DOUBLE[] ORDER BY vec_id) AS qv
      |      FROM embeddings WHERE vec_id IN (0, 1)),
      |scored AS (
      |  SELECT document_id, chunk_number, is_image,
      |    list_sum(list_transform(q.qv, v -> list_dot_product(v, e))) AS score
      |  FROM ch, q),
      |hits AS (SELECT * FROM scored
      |         ORDER BY score DESC, document_id, chunk_number LIMIT 8),
      |ih AS (SELECT * FROM hits WHERE is_image),
      |pad AS (SELECT DISTINCT h.document_id, h.chunk_number + o AS cn
      |        FROM ih h, (VALUES (-1), (1)) t(o)),
      |pad2 AS (SELECT p.document_id, p.cn FROM pad p
      |         LEFT JOIN ih h
      |           ON p.document_id = h.document_id AND p.cn = h.chunk_number
      |         WHERE h.document_id IS NULL),
      |padrows AS (
      |  SELECT c.document_id, c.chunk_number, 0.0 AS score, true AS is_padding
      |  FROM pad2 p JOIN ch c
      |    ON p.document_id = c.document_id AND p.cn = c.chunk_number
      |  WHERE c.is_image),""".stripMargin
}
