package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markdown pipe-table extraction — the inverse of the ingest ladder's
  * table EMIT path: this engine renders Excel sheets as GitHub-style pipe
  * tables (`DocParser.parseExcelToMarkdown`, the reference's
  * `_parse_excel_to_markdown` shape) and Docling-class converters emit the
  * same dialect for PDFs, so a downstream pipeline that wants the table
  * DATA back (schema inference, per-cell quality gates, table-QA pair
  * construction) needs the md → (table, row, col, cell) explode. GitHub
  * dialect: a table is a pipe row followed by a `| --- |` separator row;
  * data rows follow until the first non-pipe line; `\|` escapes a literal
  * pipe inside a cell.
  *
  * Shape: ENTIRELY in-row — line classification, block segmentation
  * (a block = contiguous pipe lines, segmented by counting non-pipe lines
  * before each index, O(lines²) array folds on per-doc line counts),
  * separator validation, and cell splitting all happen inside the row;
  * the operator is map-only with zero shuffles, then one explode per
  * emitted cell. A pipe-looking block WITHOUT a separator second line is
  * prose and emits nothing (the classifier trap every naive line-filter
  * parser fails); extra dash-rows after the first separator are DATA
  * (stated — GitHub renders them that way).
  *
  * Escape handling: `\|` swaps to the U+0001 sentinel before the cell split and back
  * to `|` after — RE2-style engines (the oracle's) have no lookbehind, so
  * the sentinel swap is the one escape idiom both engines share. */
object MarkdownTables {

  private val Sentinel = "\u0001"

  private def isPipe(l: Column): Column = {
    val t = trim(l)
    t.startsWith("|") && length(t) >= 2
  }

  private def isSep(l: Column): Column =
    trim(l).rlike("^\\|( *:?-+:? *\\|)+$")

  /** One output row per cell: (id, tbl 1-based, row_idx 0=header,
    * col_idx 0-based, cell). */
  def extract(df: DataFrame, idCol: String, mdCol: String): DataFrame = {
    val lines = split(regexp_replace(col(mdCol), "\\\\\\|", Sentinel), "\n")
    val base = df.select(col(idCol), lines.as("__ln"))
      .withColumn("__n", size(col("__ln")))
      .where(col("__n") >= 2)
    // grp(i) = #non-pipe lines before i — contiguous pipe runs share a grp
    val withGrp = base.withColumn("__grp",
      transform(sequence(lit(1), col("__n")), i =>
        size(filter(slice(col("__ln"), lit(1), i - 1), x => !isPipe(x)))))
    // a grp is a TABLE iff its run has ≥ 2 lines and line 2 is a separator
    val withValid = withGrp
      .withColumn("__runs",
        transform(sequence(lit(1), col("__n")), i =>
          when(isPipe(element_at(col("__ln"), i)),
            element_at(col("__grp"), i))))
      .withColumn("__validGrps",
        filter(array_distinct(filter(col("__runs"), x => x.isNotNull)), g => {
          val run = filter(sequence(lit(1), col("__n")), i =>
            isPipe(element_at(col("__ln"), i)) &&
              element_at(col("__grp"), i) === g)
          size(run) >= 2 && isSep(element_at(col("__ln"), element_at(run, 2)))
        }))
    val rows = withValid.withColumn("__r", explode(
      filter(
        transform(sequence(lit(1), col("__n")), i => {
          val g = element_at(col("__grp"), i)
          val tbl = array_position(col("__validGrps"), g)
          // position of line i inside its pipe run (1-based). The scan runs
          // over sequence(0, i-1) with a j>0 guard — sequence(1, 0) DESCENDS
          // in Spark, which would make a table on the document's very first
          // line count itself and mis-slot every row (spec-pinned).
          val pos = size(filter(sequence(lit(0), i - 1), j =>
            j > 0 && isPipe(element_at(col("__ln"), j)) &&
              element_at(col("__grp"), j) === g)) + 1
          when(isPipe(element_at(col("__ln"), i)) && tbl > 0 && pos =!= 2,
            struct(tbl.as("tbl"),
              when(pos === 1, lit(0)).otherwise(pos - 2).as("row_idx"),
              element_at(col("__ln"), i).as("line")))
        }),
        x => x.isNotNull)))
    val cells = rows.withColumn("__cells",
      transform(
        split(regexp_replace(regexp_replace(trim(col("__r.line")),
          "^\\|", ""), "\\|$", ""), "\\|"),
        c => regexp_replace(trim(c), Sentinel, "|")))
    cells.select(col(idCol), col("__r.tbl").as("tbl"),
        col("__r.row_idx").cast("long").as("row_idx"),
        posexplode(col("__cells")).as(Seq("col_idx", "cell")))
      .select(col(idCol), col("tbl"), col("row_idx"),
        col("col_idx").cast("long").as("col_idx"), col("cell"))
  }
}
