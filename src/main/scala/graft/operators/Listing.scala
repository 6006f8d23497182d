package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-listing engine (SURVEY §2.6 L1-L5), re-expressing
  * `core/database/postgres_database.py:448-723`.
  *
  * filter → sort (nulls-last + stable tiebreak) → offset/limit+1 → project.
  * The limit+1 "has more" probe and `next_skip` cursor mirror the reference's
  * pagination contract exactly (`postgres_database.py:448-622`).
  *
  * Scale note: `offset+limit+1` rows flow through a single
  * TakeOrderedAndProject (no global sort materialization) — each partition
  * keeps a bounded heap, the driver merges |partitions| heaps. Deep OFFSET
  * pagination degrades at extreme depths on any engine; the cursor-style
  * `next_skip` contract is what callers should use for full scans.
  */
object Listing {

  /** Sort spec: column name, descending?, nulls-last always (reference emits
    * NULLS LAST on every user sort, `postgres_database.py:522-546`). */
  case class Sort(column: String, desc: Boolean = false)

  case class Page(rows: DataFrame, hasMore: Boolean, nextSkip: Long)

  def sortCols(sorts: Seq[Sort], tiebreak: String): Seq[Column] =
    sorts.map(s => if (s.desc) col(s.column).desc_nulls_last else col(s.column).asc_nulls_last) :+
      col(tiebreak).asc

  /** L1: the listing query as a lazily-planned DataFrame (no driver-side
    * materialization; fetches offset+limit+1 rows only). */
  def list(df: DataFrame, where: Column, sorts: Seq[Sort], tiebreak: String,
           skip: Long, limit: Int, projection: Seq[String] = Nil): DataFrame = {
    val ordered = df.filter(where).orderBy(sortCols(sorts, tiebreak): _*)
    val page = ordered.offset(skip.toInt).limit(limit)
    // L2 projection: tiebreak (external_id analog) is always included
    // (`postgres_database.py:624-723`); Catalyst prunes the rest at the scan.
    if (projection.isEmpty) page
    else page.select((projection :+ tiebreak).distinct.map(col): _*)
  }

  /** L1 with the limit+1 has-more probe materialized. */
  def page(df: DataFrame, where: Column, sorts: Seq[Sort], tiebreak: String,
           skip: Long, limit: Int, projection: Seq[String] = Nil): Page = {
    val probe = list(df, where, sorts, tiebreak, skip, limit + 1, projection).collect()
    val hasMore = probe.length > limit
    val rows = probe.take(limit)
    val out = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      if (projection.isEmpty) df.schema
      else org.apache.spark.sql.types.StructType(
        (projection :+ tiebreak).distinct.map(df.schema(_))))
    Page(out, hasMore, skip + rows.length)
  }

  /** Keyset (cursor) pagination — the scale-correct deep-listing idiom.
    * OFFSET-based paging (the reference's skip/limit,
    * `postgres_database.py:624-723`, mirrored by [[list]]) computes and
    * DISCARDS `skip` rows on every page: page 1,000,000 of a 100 TB corpus
    * sorts and throws away 50M rows. The keyset predicate
    * `sort > cs OR (sort == cs AND id > ci)` instead pushes into the scan
    * (min/max pruning on the sort column) and every page is one top-n,
    * independent of depth. The cursor is the LAST ROW of the previous page
    * — opaque to the client, total order pinned by the id tiebreak. Walking
    * pages by cursor visits exactly the offset-walk's rows in the same
    * order (spec-gated). Ascending single sort column; descending flips
    * the comparisons (not needed by the reference's listing surface). */
  def keysetPage(df: DataFrame, where: Column, sortCol: String,
                 tiebreak: String, after: Option[(Column, Column)],
                 limit: Int): DataFrame = {
    require(limit >= 1, s"keysetPage needs limit>=1 (got $limit)")
    val base = df.filter(where)
    val paged = after match {
      case Some((cs, ci)) => base.filter(
        col(sortCol) > cs || (col(sortCol) === cs && col(tiebreak) > ci))
      case None => base
    }
    paged.orderBy(col(sortCol).asc, col(tiebreak).asc).limit(limit)
  }

  /** L3: total count under the same WHERE. */
  def totalCount(df: DataFrame, where: Column): Long = df.filter(where).count()

  /** L4: status counts — GROUP BY COALESCE(NULLIF(status,''),'unknown')
    * (`postgres_database.py:556-571`). */
  def statusCounts(df: DataFrame, statusCol: String): DataFrame =
    df.groupBy(coalesce(nullif(col(statusCol), lit("")), lit("unknown")).as("status"))
      .agg(count(lit(1)).as("count"))
      .orderBy("status")

  /** L5: folder counts — GROUP BY COALESCE(folder_path, folder_name)
    * ORDER BY name NULLS FIRST (`postgres_database.py:573-588`). */
  def folderCounts(df: DataFrame, pathCol: String, nameCol: String): DataFrame =
    df.groupBy(coalesce(col(pathCol), col(nameCol)).as("folder"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("folder").asc_nulls_first)

  // ------------------------------------------------------------ projection

  /** L2 field projection, porting the reference's resolution semantics
    * (`postgres_database.py:26-72,647-678`, `routes/utils.py:41-82`):
    *
    *  - the id is ALWAYS included;
    *  - a nested request like `metadata.client` resolves to its root column
    *    and projects just that subfield;
    *  - lightweight status keys (`status`, `error`, `created_at`,
    *    `updated_at`, `progress`, `version`) read a single
    *    `system_metadata` SUBFIELD, never the full blob (which holds the
    *    document text) — the reference's `system_metadata->>'key'` JSON
    *    path is Spark's nested-schema pruning: projecting a struct
    *    subfield reaches the parquet scan as `ReadSchema:
    *    struct<system_metadata:struct<status>>` (spec-asserted);
    *  - `summary_*` keys are derived top-level from the full
    *    `system_metadata`; `page_count` derives from `chunk_ids`;
    *  - null container normalization: null map/array roots (`metadata` as
    *    a map, `chunk_ids`) project as empty containers; struct-typed
    *    roots have no natural empty value and stay null.
    */
  object Projection {
    /** Public field → real table column (DOCUMENT_PROJECTION_COLUMN_MAP). */
    val columnFields: Set[String] = Set(
      "external_id", "content_type", "filename", "metadata",
      "metadata_types", "storage_info", "system_metadata",
      "additional_metadata", "chunk_ids", "folder_name", "folder_path",
      "folder_id", "app_id", "end_user_id")
    /** Cheap system_metadata scalars (DOCUMENT_STATUS_PROJECTION_KEYS). */
    val statusKeys: Set[String] = Set(
      "status", "error", "created_at", "updated_at", "progress", "version")
    /** Derived from the full system_metadata (SUMMARY_METADATA_KEYS). */
    val summaryKeys: Set[String] = Set(
      "summary_storage_key", "summary_version", "summary_bucket",
      "summary_updated_at")

    /** Field list → required roots; `sm:<key>` marks a cheap subfield read.
      * None = no projection (caller keeps every column). */
    def resolve(fields: Seq[String]): Option[Set[String]] = {
      val roots = Option(fields).getOrElse(Nil)
        .filter(f => f != null && f.trim.nonEmpty)
        .map(_.trim.split("\\.", 2)(0)).toSet
      if (roots.isEmpty) None
      else Some(roots.foldLeft(Set("external_id")) { (acc, root) =>
        if (columnFields(root)) acc + root
        else if (statusKeys(root)) acc + s"sm:$root"
        else if (summaryKeys(root)) acc + "system_metadata"
        else if (root == "page_count") acc + "system_metadata" + "chunk_ids"
        else acc
      })
    }

    /** Apply the projection to a documents frame whose `metadata` /
      * `system_metadata` are struct columns. Missing roots are skipped
      * (the reference's dict walk does the same). */
    def project(df: DataFrame, fields: Seq[String],
                idCol: String = "external_id"): DataFrame =
      resolve(fields) match {
        case None => df
        case Some(roots) =>
          val has = df.columns.toSet
          def structKeys(column: String): Set[String] = df.schema(column).dataType match {
            case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSet
            case _ => Set.empty
          }
          val smSlim = roots.collect { case r if r.startsWith("sm:") => r.drop(3) }
            .filter(k => has("system_metadata") && structKeys("system_metadata")(k))
          // subkey-only metadata projection applies unless the bare root was
          // ALSO requested (then the whole map wins, routes/utils.py:61-77)
          val bareMetadata = fields.exists(_.trim == "metadata")
          val metaSubRequested = !bareMetadata &&
            fields.exists(_.trim.startsWith("metadata."))
          val metaIsMap = has("metadata") && (df.schema("metadata").dataType match {
            case _: org.apache.spark.sql.types.MapType => true
            case _ => false
          })
          // For struct metadata, key existence is a schema fact — filter at
          // plan time. For MAP metadata it is a per-row fact (the reference
          // projects the subkey from JSONB regardless); keep every requested
          // key and let map_filter drop the per-row absentees below.
          val metaSub =
            if (bareMetadata) Nil
            else fields.map(_.trim).filter(_.startsWith("metadata."))
              .map(_.stripPrefix("metadata.")).filter(_.nonEmpty).distinct
              .filter(k => has("metadata") && (metaIsMap || structKeys("metadata")(k)))
          /** null containers normalize to empty like the reference's
            * row_to_dict (map/array roots only; a struct has no natural
            * empty value and stays null). */
          def normalized(r: String): Column = df.schema(r).dataType match {
            case _: org.apache.spark.sql.types.MapType =>
              coalesce(col(r), map()).as(r)
            case _: org.apache.spark.sql.types.ArrayType =>
              coalesce(col(r), array()).as(r)
            case _ => col(r)
          }
          val cols = Seq.newBuilder[Column]
          cols += col(idCol)
          roots.toSeq.sorted.foreach {
            case "external_id" => // already first
            case r if r.startsWith("sm:") => // handled as one slim struct below
            case "metadata" if metaSubRequested =>
              // only the requested subkeys survive; when NONE of them exist
              // in the schema the root is dropped entirely (the reference's
              // dict walk sets nothing — emitting the full column here
              // would leak every other key AND defeat the pruning)
              if (metaSub.nonEmpty) {
                if (metaIsMap)
                  cols += map_filter(col("metadata"),
                    (k, _) => k.isin(metaSub: _*)).as("metadata")
                else
                  cols += struct(metaSub.map(k => col(s"metadata.$k").as(k)): _*)
                    .as("metadata")
              }
            case r if has(r) => cols += normalized(r)
            case _ => // unknown/missing root: reference's dict walk drops it
          }
          if (smSlim.nonEmpty && !roots("system_metadata"))
            // slim struct of just the cheap keys — nested-schema pruning
            // keeps the scan from reading system_metadata.content. When the
            // FULL column is also resolved (summary_*/page_count), it
            // already carries the cheap keys — emitting the slim struct too
            // would duplicate the column (reference merges the slim dict
            // into the existing one, same outcome).
            cols += struct(smSlim.toSeq.sorted.map(k =>
              col(s"system_metadata.$k").as(k)): _*).as("system_metadata")
          val base = df.select(cols.result(): _*)
          val withSummary =
            if (roots("system_metadata") && has("system_metadata"))
              summaryKeys.toSeq.sorted
                .filter(structKeys("system_metadata"))
                .foldLeft(base)((d, k) => d.withColumn(k, col(s"system_metadata.$k")))
            else base
          if (fields.exists(_.trim == "page_count") && has("chunk_ids"))
            withSummary.withColumn("page_count",
              size(coalesce(col("chunk_ids"), array())).cast("long"))
          else withSummary
      }
  }
}
