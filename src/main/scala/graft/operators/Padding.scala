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

  /** Q9 grouping: attach each padding row to its nearest main hit in the
    * same doc (reference groups a main match with its ±p neighbors);
    * emits (doc, main_chunk_number, members sorted by chunk_number). */
  def group(expanded: DataFrame, padding: Int,
            docCol: String = "document_id", numCol: String = "chunk_number"): DataFrame = {
    val mains = expanded.filter(!col("is_padding"))
      .select(col(docCol), col(numCol).as("main_chunk"))
    val members = expanded.alias("e")
      .join(broadcast(mains).alias("m"),
        col(s"e.$docCol") === col(s"m.$docCol") &&
          abs(col(s"e.$numCol") - col("main_chunk")) <= padding)
      // a padding chunk between two mains attaches to the nearest (ties ->
      // lower main_chunk)
      .withColumn("dist", abs(col(s"e.$numCol") - col("main_chunk")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(s"e.$docCol"), col(s"e.$numCol"))
          .orderBy(col("dist"), col("main_chunk"))))
      .filter(col("rk") === 1)
    members
      .groupBy(col(s"e.$docCol").as(docCol), col("main_chunk"))
      .agg(sort_array(collect_list(col(s"e.$numCol"))).as("member_chunks"),
        max(when(!col("is_padding"), col("score"))).as("score"))
  }
}
