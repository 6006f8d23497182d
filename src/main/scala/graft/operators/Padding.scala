package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Neighbor-padding + chunk grouping (SURVEY Q8/Q9,
  * `document_service.py:554-818`): for image-chunk hits, fetch chunks at
  * `chunk_number ± 1..p` from the same document, dedup against the
  * originals, mark `is_padding` with score 0.0, order by
  * `(-score, document_id, chunk_number)`; then group each main match with
  * its padding (display order before/main/after).
  *
  * Spark shape: explode the ±p offsets from the hits (a tiny relation) and
  * broadcast-join back to the chunk table on (document_id, chunk_number) —
  * no self-join of the big table, no window over the full corpus.
  */
object Padding {

  /** hits: (document_id, chunk_number, score, ...); chunks: the indexed
    * chunk table. Returns hits ∪ padding with `is_padding`, ordered. */
  def expand(hits: DataFrame, chunks: DataFrame, padding: Int,
             docCol: String = "document_id", numCol: String = "chunk_number",
             onlyWhere: Column = lit(true)): DataFrame = {
    val wanted = hits.filter(onlyWhere)
      .select(col(docCol), col(numCol),
        explode(sequence(lit(-padding), lit(padding))).as("__off"))
      .filter(col("__off") =!= 0)
      .select(col(docCol), (col(numCol) + col("__off")).as(numCol))
      .distinct()
    // drop padding positions that are themselves hits
    val padKeys = wanted.join(hits.select(col(docCol), col(numCol)),
      Seq(docCol, numCol), "left_anti")
    val padRows = chunks.join(broadcast(padKeys), Seq(docCol, numCol))
      .withColumn("score", lit(0.0))
      .withColumn("is_padding", lit(true))
    val main = hits.withColumn("is_padding", lit(false))
    main.unionByName(padRows, allowMissingColumns = true)
      .orderBy(col("score").desc, col(docCol).asc, col(numCol).asc)
  }

  /** `_is_image_chunk` (`document_service.py:578-589`): an explicit
    * boolean `is_image` metadata flag wins; otherwise content starting
    * with "data" (a data URI) counts as an image. (The storage-key
    * extension branch is serving-side path sniffing; chunk payloads here
    * are inline.) */
  def isImageChunk(content: Column, meta: Column): Column = {
    val flag = meta.getItem("is_image")
    // the reference flag is a JSONB bool; rows ported through a string map
    // may carry Python's str(True) — accept the common bool serializations
    when(flag.isNotNull, lower(flag).isin("true", "1"))
      .otherwise(coalesce(content.startsWith("data"), lit(false)))
  }

  /** `_apply_padding_to_chunks` (`document_service.py:554-688`), the
    * ColPali arm's padding: padding applies to IMAGE chunks only — text
    * hits are dropped when padding is on (pages are the padding unit, and
    * a text chunk has no page neighbors), and padding rows fetched from
    * the chunk table must themselves be images. No image hits → empty
    * result, which the filter composition yields naturally. */
  def expandImages(hits: DataFrame, chunks: DataFrame, padding: Int,
                   docCol: String = "document_id", numCol: String = "chunk_number",
                   contentCol: String = "content", metaCol: String = "metadata"): DataFrame =
    expand(
      hits.filter(isImageChunk(col(contentCol), col(metaCol))),
      chunks.filter(isImageChunk(col(contentCol), col(metaCol))),
      padding, docCol, numCol)

  /** Q9 grouping (`document_service.py:728-763`): each padding chunk is
    * claimed by the FIRST main hit within ±p in the reference's iteration
    * order — mains sorted (score desc, chunk asc), i.e. a higher-scored
    * main wins a contested padding chunk even when another main is nearer.
    * Mains always head their own group. Emits
    * (doc, main_chunk, members sorted by chunk_number = before/main/after
    * display order, score). */
  def group(expanded: DataFrame, padding: Int,
            docCol: String = "document_id", numCol: String = "chunk_number"): DataFrame = {
    val mains = expanded.filter(!col("is_padding"))
      .select(col(docCol), col(numCol).as("main_chunk"),
        col("score").as("main_score"))
    val selfRows = expanded.filter(!col("is_padding"))
      .select(col(docCol), col(numCol), col(numCol).as("main_chunk"),
        lit(false).as("is_padding"), col("score"))
    val padRows = expanded.filter(col("is_padding")).alias("e")
      .join(broadcast(mains).alias("m"),
        col(s"e.$docCol") === col(s"m.$docCol") &&
          abs(col(s"e.$numCol") - col("main_chunk")) <= padding)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(s"e.$docCol"), col(s"e.$numCol"))
          .orderBy(col("main_score").desc, col("main_chunk").asc)))
      .filter(col("rk") === 1)
      .select(col(s"e.$docCol").as(docCol), col(s"e.$numCol").as(numCol),
        col("main_chunk"), lit(true).as("is_padding"),
        col(s"e.score").as("score"))
    selfRows.unionByName(padRows)
      .groupBy(col(docCol), col("main_chunk"))
      .agg(sort_array(collect_list(col(numCol))).as("member_chunks"),
        max(when(!col("is_padding"), col("score"))).as("score"))
  }
}
