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
