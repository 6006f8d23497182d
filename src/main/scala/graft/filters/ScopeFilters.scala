package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tenancy / folder / status scope predicates (SURVEY §2.4 F10-F12),
  * mirroring `core/database/postgres_database.py:1199-1312` and the
  * folder-depth semantics of `core/services/document_service.py:80-134`.
  *
  * All are plain Column predicates on flattened columns, so they partition-
  * prune (`app_id` is the partition key at scale) and push to the scan.
  */
object ScopeFilters {

  /** Mandatory access filter: cloud mode scopes by app, else by owner
    * (`postgres_database.py:1199-1217`). */
  def access(appId: Option[String], ownerId: Option[String],
             appCol: Column, ownerCol: Column): Column =
    appId.map(appCol === _).orElse(ownerId.map(ownerCol === _)).getOrElse(lit(true))

  /** Exact folder path; NULL and '' are equivalent (back-compat,
    * `postgres_database.py:1296-1301`). */
  def folderPathExact(pathCol: Column, path: String): Column =
    if (path == null || path.isEmpty) pathCol.isNull || pathCol === ""
    else pathCol === path

  /** Prefix scope: the folder itself or any descendant
    * (`postgres_database.py:1223-1290`). */
  def folderPathPrefix(pathCol: Column, prefix: String): Column = {
    val p = prefix.stripSuffix("/")
    pathCol === p || pathCol.startsWith(p + "/")
  }

  /** Depth-bounded prefix scope (`document_service.py:80-134`):
    * depth None/0 → exact, -1 → all descendants, n>0 → descendants whose
    * total path depth (segments of the trimmed path) is bounded. */
  def folderPathPrefixDepth(pathCol: Column, prefix: String, maxDepth: Int): Column =
    if (maxDepth == 0) folderPathExact(pathCol, prefix)
    else if (maxDepth < 0) folderPathPrefix(pathCol, prefix)
    else folderPathPrefix(pathCol, prefix) &&
      size(split(trimBoth(pathCol, "/"), "/")) <= maxDepth

  private def trimBoth(c: Column, ch: String): Column =
    regexp_replace(regexp_replace(c, s"^[$ch]+", ""), s"[$ch]+$$", "")

  /** The API's (folder_name, folder_depth) → predicate dispatcher
    * (`document_service.py:80-134` `_build_folder_scope_filters`): accepts
    * one or many FULL folder paths (None = unfiled docs, i.e. null/''
    * folder_path); depth None/0 → exact match per path, -1 → path + all
    * descendants, n > 0 → descendants at most n levels deeper than each
    * base path. Paths OR together. */
  def folderScope(pathCol: Column, paths: Seq[Option[String]],
                  depth: Option[Int]): Column = {
    def baseDepth(p: String): Int =
      if (p == "/") 0 else p.stripPrefix("/").stripSuffix("/").split("/").count(_.nonEmpty)
    val perPath = paths.map {
      case None => folderPathExact(pathCol, null)
      case Some(p) => depth match {
        case None | Some(0)          => folderPathExact(pathCol, p)
        case Some(d) if d < 0        => folderPathPrefix(pathCol, p)
        case Some(d)                 => folderPathPrefixDepth(pathCol, p, baseDepth(p) + d)
      }
    }
    perPath.reduceOption(_ || _).getOrElse(lit(true))
  }

  /** Status filter incl. NULL (`postgres_database.py:485-499,1145-1158`). */
  def status(statusCol: Column, statuses: Seq[String], includeNull: Boolean = false): Column = {
    val in = if (statuses.nonEmpty) statusCol.isin(statuses: _*) else lit(false)
    if (includeNull) in || statusCol.isNull else in
  }

  def endUser(endUserCol: Column, endUserId: String): Column = endUserCol === endUserId
}
