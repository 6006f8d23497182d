package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Update-in-place and delete-cascade (SURVEY S13/S14) without a
  * transactional table format: expressed as pure relational upsert/delete
  * transforms. On a lakehouse deployment these become literal
  * `MERGE INTO` / `DELETE WHERE` on Delta/Iceberg; here the same semantics
  * are produced by anti-join + union (the classic parquet overwrite
  * pattern), so the engine stays format-agnostic.
  */
object Mutations {

  /** Upsert by key: rows in `updates` replace same-key rows in `base`
    * (`MERGE INTO base USING updates ON key WHEN MATCHED UPDATE * WHEN NOT
    * MATCHED INSERT *`). Mirrors re-ingest-by-external_id
    * (`ingestion_service.py:852-1145`). */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    base.join(updates.select(key), Seq(key), "left_anti")
      .unionByName(updates, allowMissingColumns = true)

  /** Ordered change-log application — the "apply a CDC feed" merge every
    * lakehouse replication path runs (Delta CDF / Hudi deltastreamer /
    * Debezium→table): given a base snapshot and a changelog of
    * (key, seq, op ∈ I/U/D, payload…), produce the snapshot AFTER the log,
    * with per-key last-writer-wins — semantically a row-by-row fold in
    * `seq` order, computed WITHOUT a fold: each key's final outcome
    * depends only on its highest-seq row (D ⇒ absent; I/U ⇒ that
    * payload), so ONE key-partitioned window over the LOG (log-sized,
    * never snapshot-sized) picks the survivor, then the [[upsert]]-shaped
    * anti-join + union applies it. Contract: (key, seq) unique — a feed
    * with seq ties has no defined order (same class as [[AsOfJoin]]'s
    * unique-(key,ts) contract); resurrection (D then I at higher seq)
    * works by construction. Payload columns of D rows are ignored.
    *
    * 100 TB shape: window over the log, one equi anti-join on the base,
    * one union — the two-branch MERGE INTO on Delta/Iceberg. */
  def applyChangelog(base: DataFrame, log: DataFrame, key: String,
                     seqCol: String, opCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(seqCol).desc)
    val last = log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val ups = last.filter(col(opCol) =!= "D").drop("__rn", seqCol, opCol)
    base.join(last.select(key), Seq(key), "left_anti")
      .unionByName(ups)
  }

  /** Crawl-snapshot DIFF — the delta report a data-ops team reads after
    * each crawl/ingest cycle (and the input to incremental downstream
    * work: only `added`/`changed` keys re-chunk, re-embed, re-index):
    * full outer join of two snapshots on the key with content compared
    * BY FINGERPRINT — md5 of the normalized text, so 16 bytes per row
    * cross the shuffle, never document bodies — each key labeled
    * added / removed / changed / same. One equi-join of two
    * fingerprint tables; both sides are one map-side fingerprint scan. */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String,
                   textCol: String): DataFrame = {
    val a = before.select(col(key).cast("long").as(key),
      graft.functions.text.fingerprint(col(textCol)).as("__fa"))
    val b = after.select(col(key).cast("long").as(key),
      graft.functions.text.fingerprint(col(textCol)).as("__fb"))
    a.join(b, Seq(key), "full_outer")
      .withColumn("status",
        when(col("__fa").isNull, "added")
          .when(col("__fb").isNull, "removed")
          .when(col("__fa") === col("__fb"), "same")
          .otherwise("changed"))
      .select(col(key), col("status"))
  }

  /** SCD Type-2 dimension merge — the lakehouse slowly-changing-dimension
    * pattern the plain [[upsert]] (Type-1, overwrite) cannot express:
    * history is KEPT, every version carries a validity interval. Given the
    * current dimension (`valid_from_us`/`valid_to_us` columns, null
    * valid_to = current) and an update snapshot keyed by `key` with the
    * same attribute columns, at effective time `effUs`:
    * - a key absent from the dimension inserts (valid_from=eff, open);
    * - a key whose CURRENT attributes differ closes the current row
    *   (valid_to=eff) and inserts the new version (valid_from=eff, open);
    * - an unchanged key, a closed historical row, and a non-updated key
    *   pass through untouched.
    * Change detection compares the attribute STRUCT with null-safe
    * equality (<=>), so a null-vs-value flip counts as a change.
    *
    * 100 TB shape: ONE equi-join of the current slice against the update
    * snapshot on the key (historical rows never join — they filter out
    * map-side), then a union of the four disjoint slices; on Delta/Iceberg
    * this is the standard two-branch MERGE INTO. Deterministic given
    * `effUs` (the caller passes the batch's effective time — never a
    * wall-clock read inside the operator). */
  def scd2Merge(dim: DataFrame, updates: DataFrame, key: String,
                attrCols: Seq[String], effUs: Long): DataFrame = {
    require(attrCols.nonEmpty, "scd2Merge needs at least one attribute column")
    val attrs = struct(attrCols.map(col): _*)
    val hist = dim.where(col("valid_to_us").isNotNull)
    val cur = dim.where(col("valid_to_us").isNull)
    val upd = updates.select((col(key) +: attrCols.map(col)): _*)
    val joined = cur.as("c").join(upd.as("u"), col(s"c.$key") === col(s"u.$key"),
      "full_outer")
    val curAttrs = struct(attrCols.map(a => col(s"c.$a")): _*)
    val updAttrs = struct(attrCols.map(a => col(s"u.$a")): _*)
    val untouchedCur = joined.where(col(s"u.$key").isNull ||
        (col(s"c.$key").isNotNull && (curAttrs <=> updAttrs)))
      .select(col("c.*"))
    val closed = joined.where(col(s"c.$key").isNotNull &&
        col(s"u.$key").isNotNull && !(curAttrs <=> updAttrs))
      .select(col("c.*"))
      .withColumn("valid_to_us", lit(effUs))
    val opened = joined.where(col(s"u.$key").isNotNull &&
        (col(s"c.$key").isNull || !(curAttrs <=> updAttrs)))
      .select((col(s"u.$key").as(key) +: attrCols.map(a => col(s"u.$a").as(a))): _*)
      .withColumn("valid_from_us", lit(effUs))
      .withColumn("valid_to_us", lit(null).cast("long"))
    hist.unionByName(untouchedCur).unionByName(closed)
      .unionByName(opened.select(hist.columns.map(col): _*))
  }

  /** Time-travel read over an SCD2 dimension: the table's state as of
    * `asOfUs` — rows whose validity interval covers the instant, with the
    * half-open [valid_from, valid_to) convention [[scd2Merge]] writes: at
    * exactly the merge's effective time the NEW version is visible and
    * the closed one is not. A pure partition-prunable filter — on a
    * valid_to-partitioned (or deletion-vectored) layout the scan touches
    * only segments whose intervals can cover the instant; no shuffle. */
  def asOfSnapshot(dim: DataFrame, asOfUs: Long): DataFrame =
    dim.where(col("valid_from_us") <= asOfUs &&
      (col("valid_to_us").isNull || col("valid_to_us") > asOfUs))

  /** Migration ingest (`routes/migrate.py:20-66`): ingest documents
    * PRESERVING their source ids, with the route's `on_conflict` policy —
    * "skip" keeps the existing row and marks the incoming one skipped,
    * "fail" throws if any incoming id already exists (the 409). Returns
    * (resulting table, per-incoming-id status rows "created"/"skipped").
    * One anti-join on the key — the bulk-migration shape: at scale the
    * incoming batch streams against the (bucketed) existing table. */
  def migrateIngest(existing: DataFrame, incoming: DataFrame, key: String,
                    onConflict: String = "skip"): (DataFrame, DataFrame) = {
    require(Set("skip", "fail")(onConflict), s"on_conflict: skip|fail, got $onConflict")
    // collapse within-batch duplicate ids first — the route ingests one
    // document per request so its batches never carry dupes, but a bulk
    // caller's duplicated id must not break the preserve-source-ids
    // invariant (two rows with one id) or multiply status rows
    val batch = incoming.dropDuplicates(key)
    val dupes = batch.select(key).join(existing.select(key), Seq(key), "left_semi")
      .distinct()
    if (onConflict == "fail") {
      val clash = dupes.limit(20).collect().map(_.get(0)).mkString(", ")
      if (clash.nonEmpty)
        throw new IllegalStateException(s"documents already exist in target: $clash")
    }
    val created = batch.join(existing.select(key), Seq(key), "left_anti")
    val status = batch.select(col(key))
      .join(dupes.withColumn("__dup", lit(true)), Seq(key), "left")
      .select(col(key),
        when(col("__dup").isNotNull, lit("skipped")).otherwise(lit("created"))
          .as("status"))
    (existing.unionByName(created, allowMissingColumns = true), status)
  }

  /** Metadata merge update (`update_metadata` semantics): merge the update
    * map into the existing metadata map (update wins per key), bump
    * updated_at. */
  def mergeMetadata(docs: DataFrame, docId: Column, patch: Map[String, String],
                    metaCol: String = "metadata"): DataFrame = {
    val patchMap = map(patch.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
    docs.withColumn(metaCol,
      when(docId, map_concat_keeping_last(col(metaCol), patchMap))
        .otherwise(col(metaCol)))
  }

  /** map_concat with right-side-wins semantics (Spark's map_concat errors on
    * duplicate keys under ANSI): rebuild from entries. */
  private def map_concat_keeping_last(a: Column, b: Column): Column =
    map_from_entries(
      array_union(
        filter(map_entries(coalesce(a, map())),
          e => !map_contains_key(b, e.getField("key"))),
        map_entries(b)))

  /** Reserved-field validation for user-supplied metadata on ingest/update
    * (`ingestion_service.py:74-214` `_enforce_no_user_mutable_fields` and
    * helpers; unit table `core/tests/unit/
    * test_ingestion_service_metadata_update.py`). Pure driver-side request
    * validation — it guards what reaches [[mergeMetadata]]/[[upsert]]. */
  object ManagedMetadata {

    /** `_USER_IMMUTABLE_FIELDS`. */
    val UserImmutableFields: Set[String] = Set(
      "folder_name", "folder_id", "folder_path", "external_id", "filename",
      "app_id", "owner_id", "end_user_id")

    /** `_FOLDER_PATH_UPDATE_ERROR`. */
    val FolderPathUpdateError: String =
      "folder_path is managed and cannot be changed using the update " +
        "metadata endpoint. Use the folder endpoints to move the document " +
        "or folder instead."

    /** The document state the validator compares against. */
    case class DocState(
        externalId: String,
        metadata: Map[String, String] = Map.empty,
        metadataTypes: Map[String, String] = Map.empty,
        folderName: Option[String] = None,
        folderPath: Option[String] = None,
        folderId: Option[String] = None)

    /** `_current_managed_metadata_values`: managed values as currently
      * exposed — existing metadata keys win; external_id always present;
      * the folder metadata value is folder_path-or-folder_name. */
    def currentManagedValues(doc: DocState): Map[String, String] = {
      var out = doc.metadata
      if (!out.contains("external_id")) out += "external_id" -> doc.externalId
      doc.folderPath.orElse(doc.folderName).foreach { f =>
        if (!out.contains("folder_name")) out += "folder_name" -> f
      }
      doc.folderId.foreach { id =>
        if (!out.contains("folder_id")) out += "folder_id" -> id
      }
      out
    }

    private def unchangedValue(doc: DocState, key: String, value: String): Boolean =
      currentManagedValues(doc).get(key).contains(value)

    /** `_is_unchanged_managed_metadata_type`: compare canonicalized type
      * names, falling back to raw equality for unknown names. */
    private def unchangedType(doc: DocState, key: String, value: String): Boolean = {
      var current = doc.metadataTypes
      if (doc.externalId.nonEmpty && !current.contains("external_id"))
        current += "external_id" -> "string"
      currentManagedValues(doc).foreach { case (k, _) =>
        if (!current.contains(k)) current += k -> "string"
      }
      current.get(key) match {
        case None => false
        case Some(cur) =>
          try graft.filters.TypedMetadata.canonicalize(value) ==
            graft.filters.TypedMetadata.canonicalize(cur)
          catch { case _: Exception => value == cur }
      }
    }

    /** `_enforce_no_user_mutable_fields`: throws IllegalArgumentException
      * naming the offending fields. `allowUnchangedMetadata` is the
      * metadata-only-update concession — a managed key may be RESTATED with
      * its current value (clients echo back what they read), never changed;
      * content updates keep the strict rule. `folder_path` is rejected
      * outright in every context with a use-the-folder-endpoints message. */
    def enforceNoUserMutableFields(
        metadata: Map[String, String],
        extraFields: Map[String, String] = Map.empty,
        metadataTypes: Map[String, String] = Map.empty,
        context: String = "ingest",
        existingDoc: Option[DocState] = None,
        allowUnchangedMetadata: Boolean = false): Unit = {
      if (metadata.contains("folder_path") || extraFields.contains("folder_path") ||
          metadataTypes.contains("folder_path")) {
        if (context == "update")
          throw new IllegalArgumentException(FolderPathUpdateError)
        throw new IllegalArgumentException(
          s"folder_path is managed and cannot be set directly during $context. " +
            "Use folder parameters or folder endpoints to manage document placement.")
      }
      val invalid = scala.collection.mutable.SortedSet.empty[String]
      metadata.foreach { case (k, v) =>
        if (UserImmutableFields(k) &&
            !(allowUnchangedMetadata && existingDoc.exists(unchangedValue(_, k, v))))
          invalid += k
      }
      extraFields.keys.foreach { k => if (UserImmutableFields(k)) invalid += k }
      metadataTypes.foreach { case (k, v) =>
        if (UserImmutableFields(k) &&
            !(allowUnchangedMetadata && existingDoc.exists(unchangedType(_, k, v))))
          invalid += k
      }
      if (invalid.nonEmpty)
        throw new IllegalArgumentException(
          s"The following fields are managed and cannot be set during " +
            s"$context: ${invalid.mkString(", ")}. Remove them from the request.")
    }
  }

  /** `IngestTextRequest` content validation (`core/models/request.py`;
    * unit table `test_request_models.py`): blank or whitespace-only text
    * is a request error, not an empty document. */
  def validateIngestText(content: String): Unit =
    require(content != null && content.trim.nonEmpty,
      "content must not be empty or whitespace-only")

  /** Delete cascade (`document_service.py:1800-1899`): drop documents by id
    * and every dependent chunk/usage row. Returns the surviving relations. */
  case class CascadeResult(documents: DataFrame, chunks: DataFrame, usage: DataFrame)

  def deleteCascade(documents: DataFrame, chunks: DataFrame, usage: DataFrame,
                    docIds: Seq[Long], docKey: String = "doc_id",
                    chunkDocKey: String = "doc_id", usageDocKey: String = "doc_id"): CascadeResult = {
    val gone = docIds.map(lit(_))
    CascadeResult(
      documents.filter(!col(docKey).isin(gone: _*)),
      chunks.filter(!col(chunkDocKey).isin(gone: _*)),
      usage.filter(!col(usageDocKey).isin(gone: _*)))
  }
}
