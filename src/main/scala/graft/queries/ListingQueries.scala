package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.filters.ScopeFilters
import graft.operators.Listing

/** Listing / pagination / scope / aggregate coverage (SURVEY §2.6 L1-L8,
  * §2.4 F11) over the driver's testdata. `documents` plays the Morphik
  * documents table with a synthesized `folder_path`; `orders` exercises the
  * sort+offset+limit+projection path.
  */
object ListingQueries {

  /** documents with a 2-3 level folder path: /srcN/lang[/big]. */
  def docsWithFolders(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).withColumn(
      "folder_path",
      concat(lit("/"), col("source"), lit("/"), col("lang"),
        when(col("n_chars") > 300, "/big").otherwise("")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l1_listing_page" -> ((s, d) => listingPage(s, d)),
    "l2_listing_hasmore" -> ((s, d) => listingHasMore(s, d)),
    "l4_status_counts" -> ((s, d) =>
      Listing.statusCounts(Tables.orders(s, d), "o_orderstatus")),
    "l5_folder_counts" -> ((s, d) =>
      Listing.folderCounts(docsWithFolders(s, d).withColumn("folder_name", col("lang")),
        "folder_path", "folder_name")),
    "l6_folder_scope_depth" -> ((s, d) => folderScopeDepth(s, d)),
    "l7_folder_move" -> ((s, d) => folderMove(s, d)),
    "l16_folder_tree_ops" -> ((s, d) => folderTreeOps(s, d)),
    "l8_usage_by_source" -> ((s, d) => usageBySource(s, d)),
    "l9_folder_summary" -> ((s, d) => folderSummary(s, d)),
    "l10_usage_fold" -> ((s, d) => usageFold(s, d)),
    "l11_usage_app" -> ((s, d) => usageApp(s, d)),
    "l12_listing_flexible" -> ((s, d) => listingFlexible(s, d)),
    "l13_projection" -> ((s, d) => listingProjection(s, d)),
    "l14_keyset_page" -> ((s, d) => keysetPage(s, d)),
    "l15_total_count" -> ((s, d) => totalCounts(s, d)),
    "l17_status_polling" -> ((s, d) => statusPollingQ(s, d)),
    "l18_requeue_ladder" -> ((s, d) => requeueLadderQ(s, d))
  )

  /** L9 status polling ([[graft.streaming.IngestPipeline.progressLadder]])
    * over a deterministic ingest batch: the first 100 docs, chunked at the
    * p1 configuration (200/40), with doc_id % 17 == 0 planted EMPTY (the
    * t18/t37 planted-input convention) so the no-chunks arm — steps 4/5
    * absent, terminal `no_content_extracted` — value-exercises beside the
    * completed ladder. The oracle replays chunk counts with p1's chunk CTE
    * and the ladder as a VALUES join. */
  def statusPollingQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 100)
      .withColumn("text",
        when(col("doc_id") % 17 === 0, lit("")).otherwise(col("text")))
    val chunks = graft.operators.Chunker.fixedChunks(
      docs, "doc_id", "text", n = 200, overlap = 40)
    graft.streaming.IngestPipeline.progressLadder(docs, chunks)
      .orderBy("doc_id", "step")
  }

  /** S2's failure→requeue replay
    * ([[graft.streaming.IngestPipeline.requeueLadder]], r13 verdict ask
    * #5b) over the l17 batch: docs < 100 at the p1 chunk configuration
    * (200/40), doc_id % 13 == 0 planted as the attempt-1 TRANSIENT
    * failure (8 docs take the worker's exception path: status `failed` +
    * error, nothing indexed), doc_id 0 ADDITIONALLY planted empty so its
    * requeue lands on the accept-but-mark arm — all three terminal
    * statuses populate across the two attempts. The requeue set derives
    * from the status table (the retry endpoint reads failed ids back),
    * and the oracle replays chunk counts with p1's chunk CTE plus both
    * attempts' status rules. */
  def requeueLadderQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 100)
      .withColumn("text",
        when(col("doc_id") === 0, lit("")).otherwise(col("text")))
    graft.streaming.IngestPipeline.requeueLadder(docs,
      failWhen = col("doc_id") % 13 === 0,
      error = "planted transient parse failure",
      chunker = d => graft.operators.Chunker.fixedChunks(
        d, "doc_id", "text", n = 200, overlap = 40))
      .orderBy("doc_id", "attempt")
  }

  /** L3 oracle-gated: the listing's companion COUNT — every filtered page
    * the reference serves carries a total alongside has_more, computed
    * with the SAME compiled predicate as the page scan. Three
    * request-shaped scopes ([[Listing.totalCount]] each): unscoped, a
    * field filter, and a folder-descendants scope via
    * [[ScopeFilters.folderScope]] (depth −1) — so the count path is gated
    * against the identical scope compiler the listing gate (l6) uses.
    * Driver-side state is three Longs (design rule 17). */
  def totalCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = docsWithFolders(spark, dir)
    Seq(
      ("all", Listing.totalCount(docs, lit(true))),
      ("en_big", Listing.totalCount(docs,
        col("lang") === "en" && col("n_chars") > 300)),
      ("folder_src1", Listing.totalCount(docs, ScopeFilters.folderScope(
        col("folder_path"), Seq(Some("/src1")), Some(-1)))))
      .toDF("scope", "total").orderBy("scope")
  }

  /** Keyset pagination: one cursor-anchored page of open orders — the
    * deep-listing idiom whose cost is depth-independent (OFFSET discards
    * `skip` sorted rows per page; the keyset predicate prunes into the
    * scan). Cursor planted mid-keyspace; ties on the sort value are
    * crossed correctly via the (sort, id) tuple compare. */
  def keysetPage(spark: SparkSession, dir: String): DataFrame =
    Listing.keysetPage(
      Tables.orders(spark, dir),
      where = col("o_orderstatus") === "O",
      sortCol = "o_orderdate", tiebreak = "o_orderkey",
      after = Some((lit("1995-06-15"), lit(1000L))),
      limit = 50)
      .select(col("o_orderkey"), col("o_orderdate").cast("string").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"))

  /** L2 field projection end to end over struct-typed document columns:
    * a cheap status key, a nested metadata subkey, and the derived
    * page_count. NOTE page_count deliberately resolves the FULL
    * system_metadata (the reference's own resolution table does the same,
    * `postgres_database.py:672-675`), so this query exercises the
    * full-column + derived path; the content-never-read nested-pruning
    * claim is the status-only shape, plan-asserted in
    * ListingProjectionSpec. Flattened to scalars for the gate (the
    * driver's comparator can't hash struct cells). */
  def listingProjection(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Listing.Projection
    val docs = Tables.documents(spark, dir).select(
      col("doc_id").cast("string").as("external_id"),
      struct(col("lang"), col("source")).as("metadata"),
      struct(
        element_at(array(lit("processing"), lit("completed"), lit("failed")),
          (col("doc_id") % 3 + 1).cast("int")).as("status"),
        col("text").as("content")).as("system_metadata"),
      when(col("doc_id") % 4 === 0, array().cast("array<bigint>"))
        .otherwise(sequence(lit(1L), col("doc_id") % 4)).as("chunk_ids"))
    Projection.project(docs, Seq("status", "metadata.lang", "page_count"))
      .select(col("external_id"), col("metadata.lang").as("lang"),
        col("system_metadata.status").as("status"), col("page_count"))
      .orderBy("external_id")
  }

  /** The SURVEY §7.1 "minimum slice" composed end to end — the reference's
    * `list_documents_flexible`: metadata DSL + multi-path folder scope +
    * status filter → sort desc nulls-last + tiebreak → offset/limit →
    * projection, all predicates landing before the sort so Catalyst pushes
    * them into the scan. */
  def listingFlexible(spark: SparkSession, dir: String): DataFrame = {
    import graft.filters.MetadataFilter
    val docs = docsWithFolders(spark, dir)
      .withColumn("status",
        element_at(array(lit("processing"), lit("completed"), lit("failed")),
          (col("doc_id") % 3 + 1).cast("int")))
      .withColumn("metadata", map(
        lit("lang"), col("lang"), lit("nchars"), col("n_chars").cast("string")))
      .withColumn("metadata_types",
        typedLit(Map("lang" -> "string", "nchars" -> "number")))
    val scope =
      MetadataFilter.compile(
        """{"nchars": {"$gte": 120}, "lang": {"$in": ["en", "de", "fr"]}}""",
        col("metadata"), col("metadata_types")) &&
      graft.filters.ScopeFilters.folderScope(col("folder_path"),
        Seq(Some("/src1"), Some("/src2"), Some("/src3")), Some(-1)) &&
      col("status") === "completed"
    Listing.list(docs,
      where = scope,
      sorts = Seq(Listing.Sort("n_chars", desc = true)),
      tiebreak = "doc_id",
      skip = 10, limit = 20)
      .select("doc_id", "folder_path", "n_chars")
  }

  /** L6: per-folder stats + embedded first page (skip 0, limit 3) with a
    * synthesized deterministic status column. */
  def folderSummary(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Folders.folderSummary(
      docsWithFolders(spark, dir).withColumn("status",
        element_at(array(lit("processing"), lit("completed"), lit("failed")),
          (col("doc_id") % 3 + 1).cast("int"))),
      "folder_path", "doc_id", "status", limit = 3)
      .orderBy("folder_path")

  /** L8 write side: two delta waves per document (ingest, then a shrinking
    * re-ingest plus a multivector write) — clamp-free by construction so
    * the DuckDB oracle can compute plain per-key sums; the order-dependent
    * clamping semantics are spec-gated in UsageSpec. */
  def usageDeltas(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val e1 = d.select(
      col("doc_id").cast("string").as("document_id"), col("source").as("app_id"),
      lit(1L).as("seq"), col("n_chars").cast("long").as("raw_delta"),
      (col("n_chars") * 2).cast("long").as("chunk_delta"), lit(0L).as("mv_delta"))
    val e2 = d.select(
      col("doc_id").cast("string").as("document_id"), col("source").as("app_id"),
      lit(2L).as("seq"), (-floor(col("n_chars") / 2)).cast("long").as("raw_delta"),
      lit(0L).as("chunk_delta"), (col("n_chars") % 7).cast("long").as("mv_delta"))
    e1.unionByName(e2)
  }

  def usageFold(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Usage.foldDocDeltas(usageDeltas(spark, dir))
      .orderBy("document_id")

  def usageApp(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Usage.foldAppFromDocs(usageDeltas(spark, dir))
      .select(col("app_id"), col("raw_bytes").cast("long").as("raw_bytes"),
        col("chunk_bytes").cast("long").as("chunk_bytes"),
        col("multivector_bytes").cast("long").as("multivector_bytes"))
      .orderBy("app_id")

  /** L7 subtree move: the /src1 subtree re-pathed under /archive, with
    * depth/id/parent_id recomputed — value-checks the whole path-rewrite
    * (deterministic md5 ids replicate in SQL). */
  /** L7's remaining tree ops in ONE composed dataflow (round-11 verdict
    * #5; reference `postgres_database.py:1437-2296`, only move was
    * oracle-gated before): ensure-with-parents creates `/new` →
    * `/new/reports` → `/new/reports/q3` (three ancestors, deterministic
    * md5(app, path) ids), rename re-paths the `/src2` subtree to
    * `/legacy` (ids/depths/parent links recomputed), then add-doc twice +
    * remove-doc once leave exactly `doc-7` on the q3 folder — so every
    * mutation's final state (paths, depths, id graph, membership) is
    * hash-gated. All four ops are pure DataFrame transforms: path-prefix
    * predicates and per-row column edits, never recursion — subtree
    * renames at 100 TB are one scan with a prefix filter. */
  def folderTreeOps(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Folders
    val base = docsWithFolders(spark, dir)
      .select(col("folder_path").as("full_path")).distinct()
      .withColumn("app_id", lit("app"))
      .withColumn("document_ids", array().cast("array<string>"))
    val ensured = Folders.ensurePath(base, "app", "/new/reports/q3")
    val renamed = Folders.rename(ensured, "app", "/src2", "legacy")
    val q3id = java.security.MessageDigest.getInstance("MD5")
      .digest("app\u0000/new/reports/q3".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val mutated = Folders.removeDocument(
      Folders.addDocument(
        Folders.addDocument(renamed, q3id, "doc-42"), q3id, "doc-7"),
      q3id, "doc-42")
    mutated.select(col("full_path"), col("depth").cast("long").as("depth"),
      col("id"), col("parent_id"),
      concat_ws(",", coalesce(col("document_ids"),
        array().cast("array<string>"))).as("doc_ids"))
      .orderBy("full_path")
  }

  def folderMove(spark: SparkSession, dir: String): DataFrame = {
    val folders = docsWithFolders(spark, dir)
      .select(col("folder_path").as("full_path")).distinct()
      .withColumn("app_id", lit("app"))
    graft.operators.Folders.moveSubtree(folders, "app", "/src1", "/archive/src1")
      .select("full_path", "depth", "id", "parent_id")
      .orderBy("full_path")
  }

  /** L1/L2: filter → sort desc nulls-last + tiebreak → offset/limit → project. */
  def listingPage(spark: SparkSession, dir: String): DataFrame =
    Listing.list(
      Tables.orders(spark, dir),
      where = col("o_orderstatus") === "O",
      sorts = Seq(Listing.Sort("o_totalprice", desc = true)),
      tiebreak = "o_orderkey",
      skip = 100, limit = 50)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"),
        col("o_orderpriority"))

  /** L1 has-more probe: page rows plus the limit+1 / next_skip cursor fields
    * (`postgres_database.py:448-622`). */
  def listingHasMore(spark: SparkSession, dir: String): DataFrame = {
    val p = Listing.page(
      Tables.orders(spark, dir),
      where = col("o_orderstatus") === "P",
      sorts = Seq(Listing.Sort("o_totalprice", desc = true)),
      tiebreak = "o_orderkey",
      skip = 40, limit = 25)
    p.rows.select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      .withColumn("has_more", lit(p.hasMore))
      .withColumn("next_skip", lit(p.nextSkip))
  }

  /** F11: folder_path_prefix_depth scoping — '/src1' subtree, total depth <=2
    * (excludes the '/big' third level and does NOT match '/src11/...'). */
  def folderScopeDepth(spark: SparkSession, dir: String): DataFrame =
    docsWithFolders(spark, dir)
      .filter(ScopeFilters.folderPathPrefixDepth(col("folder_path"), "/src1", 2))
      .select("doc_id", "folder_path").orderBy("doc_id")

  /** L8: per-app storage accounting analog — one shuffle of pre-aggregated
    * partials on a low-cardinality key. */
  def usageBySource(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("source")
      .agg(sum("n_chars").cast("long").as("total_chars"), count(lit(1)).as("doc_count"))
      .orderBy("source")

  def oracles: Map[String, String] = Map(
    // L9: the 6-step progress ladder + terminal status replayed — chunk
    // counts via p1's chunk CTE, the ladder as a VALUES join, steps 4/5
    // gated on n_chunks > 0 exactly like the worker's processed_chunks gate
    "l17_status_polling" ->
      """WITH d AS (SELECT doc_id, CASE WHEN doc_id % 17 = 0 THEN '' ELSE text END AS text
        |           FROM documents WHERE doc_id < 100),
        |ch AS (SELECT doc_id, count(*) AS n_chunks FROM (
        |         SELECT doc_id FROM d, generate_series(1, 100000, 160) AS t(s)
        |         WHERE s <= greatest(len(text) - 40, 1)
        |           AND len(substr(text, s::INT, 200)) > 0) GROUP BY doc_id),
        |st AS (SELECT d.doc_id, coalesce(ch.n_chunks, 0)::BIGINT AS n_chunks
        |       FROM d LEFT JOIN ch USING (doc_id)),
        |steps(step, step_name, percentage, needs) AS (VALUES
        |  (1, 'Downloading file', 17, false), (2, 'Parsing file', 33, false),
        |  (3, 'Splitting into chunks', 50, false), (4, 'Generating embeddings', 67, true),
        |  (5, 'Storing chunks', 83, true), (6, 'Finalizing', 100, false)),
        |ladder AS (
        |  SELECT doc_id, step::BIGINT AS step, step_name,
        |    percentage::BIGINT AS percentage, 'processing' AS status, n_chunks
        |  FROM st, steps WHERE (NOT needs) OR n_chunks > 0
        |  UNION ALL
        |  SELECT doc_id, 7::BIGINT, 'terminal', 100::BIGINT,
        |    CASE WHEN n_chunks > 0 THEN 'completed' ELSE 'no_content_extracted' END,
        |    n_chunks
        |  FROM st)
        |SELECT doc_id, step, step_name, percentage, status, n_chunks
        |FROM ladder ORDER BY doc_id, step""".stripMargin,
    // S2: failure->requeue replay — p1's chunk CTE for counts; attempt 1
    // fails the planted set (error string, 0 chunks), attempt 2 re-ingests
    // exactly the failed ids with the normal status rules
    "l18_requeue_ladder" ->
      """WITH d AS (SELECT doc_id, CASE WHEN doc_id = 0 THEN '' ELSE text END AS text
        |           FROM documents WHERE doc_id < 100),
        |ch AS (SELECT doc_id, count(*) AS n_chunks FROM (
        |         SELECT doc_id FROM d, generate_series(1, 100000, 160) AS t(s)
        |         WHERE s <= greatest(len(text) - 40, 1)
        |           AND len(substr(text, s::INT, 200)) > 0) GROUP BY doc_id),
        |st AS (SELECT d.doc_id, coalesce(ch.n_chunks, 0)::BIGINT AS n_chunks
        |       FROM d LEFT JOIN ch USING (doc_id)),
        |a1 AS (SELECT doc_id, 1::BIGINT AS attempt,
        |         CASE WHEN doc_id % 13 = 0 THEN 'failed'
        |              WHEN n_chunks > 0 THEN 'completed'
        |              ELSE 'no_content_extracted' END AS status,
        |         CASE WHEN doc_id % 13 = 0
        |              THEN 'planted transient parse failure' END AS error,
        |         (CASE WHEN doc_id % 13 = 0 THEN 0 ELSE n_chunks END)::BIGINT AS n_chunks
        |       FROM st),
        |a2 AS (SELECT doc_id, 2::BIGINT AS attempt,
        |         CASE WHEN n_chunks > 0 THEN 'completed'
        |              ELSE 'no_content_extracted' END AS status,
        |         NULL::VARCHAR AS error, n_chunks
        |       FROM st WHERE doc_id % 13 = 0)
        |SELECT doc_id, attempt, status, error, n_chunks FROM a1
        |UNION ALL SELECT doc_id, attempt, status, error, n_chunks FROM a2
        |ORDER BY doc_id, attempt""".stripMargin,
    // L3: totals re-derived from the raw table, the folder scope replayed
    // as exact-or-descendant path match on the synthesized folder_path
    "l15_total_count" ->
      """WITH f AS (SELECT lang, n_chars,
        |  '/' || source || '/' || lang ||
        |    CASE WHEN n_chars > 300 THEN '/big' ELSE '' END AS fp
        |  FROM documents)
        |SELECT 'all' AS scope, count(*)::BIGINT AS total FROM f
        |UNION ALL SELECT 'en_big', count(*)::BIGINT FROM f
        |  WHERE lang = 'en' AND n_chars > 300
        |UNION ALL SELECT 'folder_src1', count(*)::BIGINT FROM f
        |  WHERE fp = '/src1' OR fp LIKE '/src1/%'
        |ORDER BY scope""".stripMargin,
    "l1_listing_page" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
        |LIMIT 50 OFFSET 100""".stripMargin,
    "l14_keyset_page" ->
      """SELECT o_orderkey, o_orderdate::VARCHAR AS o_orderdate,
        |  round(o_totalprice, 2) AS o_totalprice
        |FROM orders
        |WHERE o_orderstatus = 'O'
        |  AND (o_orderdate > DATE '1995-06-15'
        |       OR (o_orderdate = DATE '1995-06-15' AND o_orderkey > 1000))
        |ORDER BY o_orderdate, o_orderkey LIMIT 50""".stripMargin,
    "l2_listing_hasmore" ->
      """WITH flt AS (SELECT * FROM orders WHERE o_orderstatus = 'P'),
        |     pg AS (SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |            FROM flt ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
        |            LIMIT 25 OFFSET 40)
        |SELECT pg.*, (SELECT count(*) FROM flt) > 65 AS has_more,
        |       40 + (SELECT count(*) FROM pg) AS next_skip
        |FROM pg""".stripMargin,
    "l4_status_counts" ->
      """SELECT coalesce(nullif(o_orderstatus, ''), 'unknown') AS status,
        |       count(*) AS count
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,
    "l5_folder_counts" ->
      """SELECT '/' || source || '/' || lang ||
        |         (CASE WHEN n_chars > 300 THEN '/big' ELSE '' END) AS folder,
        |       count(*) AS count
        |FROM documents GROUP BY 1 ORDER BY folder""".stripMargin,
    "l6_folder_scope_depth" ->
      """WITH d AS (SELECT doc_id, '/' || source || '/' || lang ||
        |    (CASE WHEN n_chars > 300 THEN '/big' ELSE '' END) AS folder_path
        |  FROM documents)
        |SELECT doc_id, folder_path FROM d
        |WHERE (folder_path = '/src1' OR folder_path LIKE '/src1/%')
        |  AND len(string_split(trim(folder_path, '/'), '/')) <= 2
        |ORDER BY doc_id""".stripMargin,
    "l16_folder_tree_ops" ->
      """WITH d AS (SELECT DISTINCT '/' || source || '/' || lang ||
        |    (CASE WHEN n_chars > 300 THEN '/big' ELSE '' END) AS fp FROM documents),
        |ens AS (SELECT fp FROM (VALUES ('/new'), ('/new/reports'), ('/new/reports/q3')) v(fp)
        |        WHERE fp NOT IN (SELECT fp FROM d)),
        |allf AS (SELECT fp FROM d UNION ALL SELECT fp FROM ens),
        |ren AS (SELECT CASE WHEN fp = '/src2' OR fp LIKE '/src2/%'
        |         THEN '/legacy' || substring(fp, 6) ELSE fp END AS full_path FROM allf)
        |SELECT full_path,
        |  len(string_split(trim(full_path, '/'), '/')) AS depth,
        |  md5('app' || chr(0) || full_path) AS id,
        |  CASE WHEN len(string_split(trim(full_path, '/'), '/')) > 1
        |    THEN md5('app' || chr(0) || regexp_replace(full_path, '/[^/]+$', '')) END AS parent_id,
        |  CASE WHEN full_path = '/new/reports/q3' THEN 'doc-7' ELSE '' END AS doc_ids
        |FROM ren ORDER BY full_path""".stripMargin,
    "l7_folder_move" ->
      """WITH d AS (SELECT DISTINCT '/' || source || '/' || lang ||
        |    (CASE WHEN n_chars > 300 THEN '/big' ELSE '' END) AS fp FROM documents),
        |m AS (SELECT CASE WHEN fp = '/src1' OR fp LIKE '/src1/%'
        |        THEN '/archive/src1' || substring(fp, 6) ELSE fp END AS full_path FROM d)
        |SELECT full_path,
        |  len(string_split(trim(full_path, '/'), '/')) AS depth,
        |  md5('app' || chr(0) || full_path) AS id,
        |  CASE WHEN len(string_split(trim(full_path, '/'), '/')) > 1
        |    THEN md5('app' || chr(0) || regexp_replace(full_path, '/[^/]+$', '')) END AS parent_id
        |FROM m ORDER BY full_path""".stripMargin,
    "l8_usage_by_source" ->
      // sum(INT) is HUGEINT in DuckDB; cast to BIGINT so both engines emit
      // int64 (the driver hashes the rendered values, and int128 prints
      // through pandas differently).
      """SELECT source, sum(n_chars)::BIGINT AS total_chars, count(*) AS doc_count
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "l9_folder_summary" ->
      """WITH d AS (SELECT doc_id,
        |    '/' || source || '/' || lang ||
        |      (CASE WHEN n_chars > 300 THEN '/big' ELSE '' END) AS folder_path,
        |    ['processing','completed','failed'][(doc_id % 3 + 1)::INT] AS status
        |  FROM documents),
        |pg AS (SELECT folder_path, doc_id,
        |    row_number() OVER (PARTITION BY folder_path ORDER BY doc_id) AS rn
        |  FROM d),
        |page AS (SELECT folder_path,
        |    array_to_string(list_sort(list(doc_id)), ',') AS page_ids,
        |    count(*) AS returned_count
        |  FROM pg WHERE rn <= 3 GROUP BY folder_path),
        |sc AS (SELECT folder_path, status, count(*) AS c FROM d GROUP BY 1, 2),
        |st AS (SELECT folder_path, sum(c)::BIGINT AS document_count,
        |    array_to_string(list_sort(list(status || ':' || c)), ',') AS status_counts
        |  FROM sc GROUP BY folder_path)
        |SELECT st.folder_path, document_count, status_counts,
        |  coalesce(page_ids, '') AS page_ids,
        |  coalesce(returned_count, 0) AS returned_count,
        |  document_count > coalesce(returned_count, 0) AS has_more,
        |  CASE WHEN document_count > coalesce(returned_count, 0)
        |       THEN coalesce(returned_count, 0) ELSE -1 END AS next_skip
        |FROM st LEFT JOIN page USING (folder_path)
        |ORDER BY st.folder_path""".stripMargin,
    "l10_usage_fold" ->
      // clamp-free by construction -> the ordered fold equals plain sums
      """SELECT doc_id::VARCHAR AS document_id, source AS app_id,
        |  (n_chars - n_chars // 2)::BIGINT AS raw_bytes,
        |  (n_chars * 2)::BIGINT AS chunk_bytes,
        |  (n_chars % 7)::BIGINT AS multivector_bytes
        |FROM documents ORDER BY document_id""".stripMargin,
    "l11_usage_app" ->
      """SELECT source AS app_id,
        |  sum(n_chars - n_chars // 2)::BIGINT AS raw_bytes,
        |  sum(n_chars * 2)::BIGINT AS chunk_bytes,
        |  sum(n_chars % 7)::BIGINT AS multivector_bytes
        |FROM documents GROUP BY source ORDER BY app_id""".stripMargin,
    "l13_projection" ->
      """SELECT doc_id::VARCHAR AS external_id, lang,
        |  ['processing','completed','failed'][(doc_id % 3 + 1)::INT] AS status,
        |  (doc_id % 4)::BIGINT AS page_count
        |FROM documents ORDER BY external_id""".stripMargin,
    "l12_listing_flexible" ->
      """WITH d AS (SELECT doc_id, n_chars, lang,
        |    '/' || source || '/' || lang ||
        |      (CASE WHEN n_chars > 300 THEN '/big' ELSE '' END) AS folder_path,
        |    ['processing','completed','failed'][(doc_id % 3 + 1)::INT] AS status
        |  FROM documents)
        |SELECT doc_id, folder_path, n_chars FROM d
        |WHERE n_chars >= 120 AND lang IN ('en','de','fr')
        |  AND status = 'completed'
        |  AND (folder_path = '/src1' OR folder_path LIKE '/src1/%'
        |    OR folder_path = '/src2' OR folder_path LIKE '/src2/%'
        |    OR folder_path = '/src3' OR folder_path LIKE '/src3/%')
        |ORDER BY n_chars DESC NULLS LAST, doc_id
        |LIMIT 20 OFFSET 10""".stripMargin
  )
}
