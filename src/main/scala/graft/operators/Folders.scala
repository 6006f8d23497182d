package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Folder-tree operations (SURVEY L6/L7, `postgres_database.py:1437-2296`,
  * models `core/database/models.py:83-126`).
  *
  * The folders relation: (id, name, full_path, parent_id, depth, app_id,
  * document_ids). All mutations are pure DataFrame -> DataFrame transforms
  * (the storage layer applies them as an overwrite/MERGE); subtree
  * operations are path-prefix predicates, never recursion.
  */
object Folders {

  /** Ensure a path and all its ancestors exist (create-with-parents,
    * `ingestion_service.py:245-327`): returns folders ∪ missing ancestors.
    * Deterministic ids: md5 of (app_id, path). */
  def ensurePath(folders: DataFrame, appId: String, path: String): DataFrame = {
    val spark = folders.sparkSession
    import spark.implicits._
    val parts = path.stripPrefix("/").stripSuffix("/").split("/").filter(_.nonEmpty)
    val rows = parts.indices.map { i =>
      val full = "/" + parts.take(i + 1).mkString("/")
      val parent = if (i == 0) null else "/" + parts.take(i).mkString("/")
      (appId, full, parts(i), parent, i + 1)
    }
    val wanted = rows.toDF("app_id", "full_path", "name", "parent_path", "depth")
      .withColumn("id", md5(concat_ws("\u0000", col("app_id"), col("full_path"))))
      .withColumn("parent_id",
        when(col("parent_path").isNull, lit(null).cast("string"))
          .otherwise(md5(concat_ws("\u0000", col("app_id"), col("parent_path")))))
      .drop("parent_path")
    val missing = wanted.join(
      folders.select(col("app_id"), col("full_path")),
      Seq("app_id", "full_path"), "left_anti")
    folders.unionByName(missing, allowMissingColumns = true)
  }

  /** Move a subtree: re-path every folder under `from` (exact + descendants)
    * to live under `to`, recomputing depth. */
  def moveSubtree(folders: DataFrame, appId: String, from: String, to: String): DataFrame = {
    val f = from.stripSuffix("/"); val t = to.stripSuffix("/")
    val inSubtree = col("app_id") === appId &&
      (col("full_path") === f || col("full_path").startsWith(f + "/"))
    folders.withColumn("full_path",
        when(inSubtree, concat(lit(t), expr(s"substring(full_path, ${f.length + 1})")))
          .otherwise(col("full_path")))
      .withColumn("depth",
        size(split(regexp_replace(col("full_path"), "^/|/$", ""), "/")))
      .withColumn("id", md5(concat_ws("\u0000", col("app_id"), col("full_path"))))
      .withColumn("parent_id",
        when(col("depth") > 1, md5(concat_ws("\u0000", col("app_id"),
          regexp_replace(col("full_path"), "/[^/]+$", ""))))
          .otherwise(lit(null).cast("string")))
  }

  /** Rename a leaf segment: move with the last path element replaced. */
  def rename(folders: DataFrame, appId: String, path: String, newName: String): DataFrame = {
    val parent = path.stripSuffix("/").reverse.dropWhile(_ != '/').reverse.stripSuffix("/")
    moveSubtree(folders, appId, path, s"$parent/$newName")
  }

  /** Delete a subtree (documents under it are the caller's cascade). */
  def deleteSubtree(folders: DataFrame, appId: String, path: String): DataFrame = {
    val p = path.stripSuffix("/")
    folders.filter(!(col("app_id") === appId &&
      (col("full_path") === p || col("full_path").startsWith(p + "/"))))
  }

  /** L6 folder details/summary (`core/routes/folders.py:149-306`): per
    * folder — total document count, per-status counts, and an embedded
    * paginated document-id page with the listing's has_more/next_skip
    * cursor contract. Status counts are emitted as a sorted
    * "status:count" string so the row stays scalar (oracle-hashable).
    *
    * Shape: two equi-key groupBys joined on the folder key — the page is
    * bounded by `limit` via a per-folder row_number window, so no folder
    * ever collects more than `skip+limit` ids. */
  def folderSummary(docs: DataFrame, folderCol: String, idCol: String,
                    statusCol: String, limit: Int, skip: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(folderCol)).orderBy(col(idCol))
    val page = docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > skip && col("__rn") <= skip + limit)
      .groupBy(col(folderCol))
      .agg(concat_ws(",", sort_array(collect_list(col(idCol)))).as("page_ids"),
        count(lit(1)).as("returned_count"))
    val stats = docs.groupBy(col(folderCol), col(statusCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(folderCol))
      .agg(sum("__c").as("document_count"),
        concat_ws(",", sort_array(collect_list(
          concat(col(statusCol), lit(":"), col("__c"))))).as("status_counts"))
    stats.join(page, Seq(folderCol), "left")
      .withColumn("page_ids", coalesce(col("page_ids"), lit("")))
      .withColumn("returned_count", coalesce(col("returned_count"), lit(0L)))
      .withColumn("has_more", col("document_count") > lit(skip) + col("returned_count"))
      // -1 = no further page (kept non-null for engine-stable hashing)
      .withColumn("next_skip",
        when(col("has_more"), lit(skip) + col("returned_count")).otherwise(lit(-1L)))
  }

  /** Add/remove a document id on a folder row. */
  def addDocument(folders: DataFrame, folderId: String, docId: String): DataFrame =
    folders.withColumn("document_ids",
      when(col("id") === folderId && !array_contains(
        coalesce(col("document_ids"), array()), docId),
        array_append(coalesce(col("document_ids"), array()), docId))
        .otherwise(col("document_ids")))

  def removeDocument(folders: DataFrame, folderId: String, docId: String): DataFrame =
    folders.withColumn("document_ids",
      when(col("id") === folderId,
        array_remove(coalesce(col("document_ids"), array()), docId))
        .otherwise(col("document_ids")))
}
