package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mutations
import graft.operators.Mutations.ManagedMetadata
import graft.operators.Mutations.ManagedMetadata.DocState

/** Port of the reference's ingestion metadata-update unit table
  * (`core/tests/unit/test_ingestion_service_metadata_update.py`) plus the
  * IngestTextRequest content rule (`test_request_models.py`): managed
  * fields may be restated unchanged on a metadata-only update, never
  * changed; folder_path is always routed to the folder endpoints; content
  * updates keep the strict rule.
  */
class ManagedMetadataSpec extends AnyFunSuite {

  /** The test_ingestion_service_metadata_update fixture document. */
  private def doc = DocState(
    externalId = "doc-1",
    metadata = Map(
      "external_id" -> "doc-1",
      "folder_name" -> "/Team/Reports",
      "folder_id" -> "folder-1",
      "custom" -> "old"),
    metadataTypes = Map(
      "external_id" -> "string",
      "folder_name" -> "string",
      "folder_id" -> "string",
      "custom" -> "string"),
    folderName = Some("Reports"),
    folderPath = Some("/Team/Reports"),
    folderId = Some("folder-1"))

  test("metadata-only update allows unchanged managed metadata fields") {
    ManagedMetadata.enforceNoUserMutableFields(
      metadata = Map(
        "external_id" -> "doc-1",
        "folder_name" -> "/Team/Reports",
        "folder_id" -> "folder-1",
        "custom" -> "new"),
      metadataTypes = Map(
        "external_id" -> "string",
        "folder_name" -> "string",
        "folder_id" -> "string",
        "custom" -> "string"),
      context = "update",
      existingDoc = Some(doc),
      allowUnchangedMetadata = true) // no throw
  }

  test("metadata-only update rejects folder_path with the folder-endpoint message") {
    val e = intercept[IllegalArgumentException] {
      ManagedMetadata.enforceNoUserMutableFields(
        metadata = Map("folder_path" -> "/Team/Reports", "custom" -> "new"),
        context = "update",
        existingDoc = Some(doc),
        allowUnchangedMetadata = true)
    }
    assert(e.getMessage.contains("folder_path"))
    assert(e.getMessage.contains("update metadata endpoint"))
    assert(e.getMessage.contains("folder"))
  }

  test("metadata-only update rejects CHANGED managed metadata fields") {
    val e = intercept[IllegalArgumentException] {
      ManagedMetadata.enforceNoUserMutableFields(
        metadata = Map("folder_name" -> "/Team/Other", "custom" -> "new"),
        context = "update",
        existingDoc = Some(doc),
        allowUnchangedMetadata = true)
    }
    assert(e.getMessage.contains("folder_name"))
  }

  test("content update still rejects UNCHANGED managed metadata fields") {
    val e = intercept[IllegalArgumentException] {
      ManagedMetadata.enforceNoUserMutableFields(
        metadata = Map("external_id" -> "doc-1"),
        context = "update",
        existingDoc = Some(doc),
        allowUnchangedMetadata = false) // content update: strict
    }
    assert(e.getMessage.contains("external_id"))
  }

  test("ingest context rejects folder_path with the ingest-flavored message") {
    val e = intercept[IllegalArgumentException] {
      ManagedMetadata.enforceNoUserMutableFields(
        metadata = Map("folder_path" -> "/x"), context = "ingest")
    }
    assert(e.getMessage.contains("during ingest"))
    assert(e.getMessage.contains("folder"))
  }

  test("extra_fields never get the unchanged concession") {
    val e = intercept[IllegalArgumentException] {
      ManagedMetadata.enforceNoUserMutableFields(
        metadata = Map.empty,
        extraFields = Map("filename" -> "report.txt"),
        context = "update",
        existingDoc = Some(doc),
        allowUnchangedMetadata = true)
    }
    assert(e.getMessage.contains("filename"))
  }

  test("metadata_types compare by canonical type name (aliases are unchanged)") {
    // 'str' canonicalizes to 'string' -> restating the type via an alias
    // passes; an actually different type fails
    ManagedMetadata.enforceNoUserMutableFields(
      metadata = Map.empty,
      metadataTypes = Map("external_id" -> "str"),
      context = "update",
      existingDoc = Some(doc),
      allowUnchangedMetadata = true)
    val e = intercept[IllegalArgumentException] {
      ManagedMetadata.enforceNoUserMutableFields(
        metadata = Map.empty,
        metadataTypes = Map("external_id" -> "number"),
        context = "update",
        existingDoc = Some(doc),
        allowUnchangedMetadata = true)
    }
    assert(e.getMessage.contains("external_id"))
  }

  test("managed-value exposure: folder_path wins over folder_name; metadata keys win over doc columns") {
    val bare = DocState(externalId = "d2",
      folderName = Some("Reports"), folderPath = Some("/Team/Reports"))
    val cur = ManagedMetadata.currentManagedValues(bare)
    assert(cur("external_id") == "d2")
    assert(cur("folder_name") == "/Team/Reports") // path, not bare name
    // explicit metadata keys are NOT overwritten by doc columns
    val withMeta = bare.copy(metadata = Map("folder_name" -> "custom-value"))
    assert(ManagedMetadata.currentManagedValues(withMeta)("folder_name") == "custom-value")
  }

  test("multiple offenders are reported sorted, comma-joined") {
    val e = intercept[IllegalArgumentException] {
      ManagedMetadata.enforceNoUserMutableFields(
        metadata = Map("owner_id" -> "x", "app_id" -> "y"), context = "ingest")
    }
    assert(e.getMessage.contains("app_id, owner_id"))
  }

  test("IngestTextRequest content rule: blank and whitespace-only rejected") {
    Seq("", "   ", "\n\t").foreach { c =>
      intercept[IllegalArgumentException](Mutations.validateIngestText(c))
    }
    intercept[IllegalArgumentException](Mutations.validateIngestText(null))
    Mutations.validateIngestText("hello world") // no throw
  }
}
