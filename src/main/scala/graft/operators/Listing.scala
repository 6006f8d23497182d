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
}
