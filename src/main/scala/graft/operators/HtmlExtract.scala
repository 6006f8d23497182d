package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the boilerplate-aware text rung for
  * `text/html` ingest (the CommonCrawl-shape problem: nav bars, footers,
  * link farms around the article body).
  *
  * The reference sidesteps extraction by rendering HTML to PDF
  * (`core/workers/ingestion_worker.py:507-520`, WeasyPrint seat) and
  * parsing the print layout; that is a renderer's answer. The engine-side
  * answer is jusText-lite (Pomikálek 2011, the trafilatura family): split
  * the document into BLOCKS at block-level tag boundaries and classify
  * each block by link density + length — the two features that carry most
  * of jusText's separation power and need no DOM, so the whole pipeline is
  * a codegen'd regex/string chain.
  *
  * Stated operation order (the oracle replays it verbatim):
  *   1. drop `<script>`/`<style>` elements and HTML comments;
  *   2. split on block-level tags (p, div, h1-6, li, ul, ol, br, tr, td,
  *      th, table, section, article, header, footer, nav, blockquote);
  *   3. per block: anchor text = concatenated `<a>…</a>` contents; then
  *      strip remaining tags, decode the named-entity subset
  *      (&nbsp; &lt; &gt; &quot; &#39; &amp; — amp LAST so `&amp;lt;`
  *      cannot double-decode), collapse whitespace;
  *   4. classify: boilerplate iff 2·link_chars > n_chars (link density
  *      > 50%, integer cross-multiplied) or n_chars < minChars.
  *
  * Map-only: no shuffle, no join; per-row cost linear in document size —
  * the plan is identical at 100 TB. [[mainText]] adds ONE doc-keyed
  * aggregation whose state is the doc's own block list (document-bounded).
  */
object HtmlExtract {

  private val blockTagRe =
    "(?i)</?(p|div|h[1-6]|li|ul|ol|br|tr|td|th|table|section|article|" +
      "header|footer|nav|blockquote)\\b[^>]*>"
  private val scriptRe = "(?is)<script\\b[^>]*>.*?</script>"
  private val styleRe = "(?is)<style\\b[^>]*>.*?</style>"
  private val commentRe = "(?s)<!--.*?-->"
  private val anchorRe = "(?is)<a\\b[^>]*>(.*?)</a>"
  private val tagRe = "<[^>]*>"

  /** Entity decode order is load-bearing: `&amp;` LAST, so already-escaped
    * entity spellings (`&amp;lt;`) decode to their literal text
    * (`&lt;`), never to a second round of markup. */
  private def decodeEntities(c: Column): Column =
    Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (pat, to)) => regexp_replace(acc, pat, to) }

  private def norm(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Per-block rows: (id, pos, btext, n_chars, link_chars, is_boiler).
    * `pos` is the block's index in the raw tag-boundary split (empty
    * blocks are dropped but keep their gap in the numbering, so positions
    * are stable under classifier changes). */
  def blocks(df: DataFrame, idCol: String, htmlCol: String,
             minChars: Int = 15): DataFrame = {
    val cleaned = regexp_replace(regexp_replace(regexp_replace(
      col("h"), scriptRe, " "), styleRe, " "), commentRe, " ")
    val blocksArr = split(regexp_replace(cleaned, blockTagRe, "\u0001"),
      "\u0001")
    graft.Tables.scaled(
      df.select(col(idCol).cast("long").as("id"), col(htmlCol).as("h")))
      .select(col("id"), posexplode(blocksArr).as(Seq("pos", "raw")))
      .withColumn("btext",
        norm(decodeEntities(regexp_replace(col("raw"), tagRe, " "))))
      .withColumn("ltext", norm(decodeEntities(regexp_replace(
        array_join(regexp_extract_all(col("raw"), lit(anchorRe), lit(1)),
          " "), tagRe, " "))))
      .select(col("id"), col("pos").cast("long").as("pos"), col("btext"),
        length(col("btext")).cast("long").as("n_chars"),
        length(col("ltext")).cast("long").as("link_chars"))
      .filter(col("n_chars") > 0)
      .withColumn("is_boiler",
        col("link_chars") * 2 > col("n_chars") || col("n_chars") < minChars)
  }

  /** Doc-level view: block tallies + the main text (non-boilerplate
    * blocks re-joined by '\n' in block order) — what feeds the chunker
    * when a `text/html` upload takes this rung instead of the reference's
    * render-to-PDF seat. */
  def mainText(df: DataFrame, idCol: String, htmlCol: String,
               minChars: Int = 15): DataFrame =
    blocks(df, idCol, htmlCol, minChars).groupBy("id").agg(
      count(lit(1)).as("n_blocks"),
      sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_boiler"),
      sum(when(!col("is_boiler"), 1L).otherwise(0L)).as("n_main"),
      sum(col("n_chars")).as("total_chars"),
      sum(col("link_chars")).as("total_link_chars"),
      concat_ws("\n", transform(
        filter(
          array_sort(collect_list(struct(col("pos").as("k"),
            col("btext").as("t"), col("is_boiler").as("b")))),
          x => !x.getField("b")),
        x => x.getField("t"))).as("main_text"))

  /** Scalar JVM twin of [[mainText]] for the per-row parser dispatch
    * ([[DocParser.parse]] routes .html/.htm/.xhtml here — the engine-side
    * stand-in for the reference's render-to-PDF seat,
    * `ingestion_worker.py:507-520`). Shares the exact regex constants with
    * the Column pipeline; HtmlExtractSpec pins scalar == Column on the
    * same page so the two paths cannot drift. */
  def mainTextString(html: String, minChars: Int = 15): String = {
    val cleaned = html.replaceAll(scriptRe, " ").replaceAll(styleRe, " ")
      .replaceAll(commentRe, " ")
    val anchorPat = java.util.regex.Pattern.compile(anchorRe)
    def decode(s: String): String =
      s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")
    def norm(s: String): String = s.replaceAll("\\s+", " ").trim
    cleaned.replaceAll(blockTagRe, "\u0001").split("\u0001", -1).iterator
      .map { raw =>
        val btext = norm(decode(raw.replaceAll(tagRe, " ")))
        val m = anchorPat.matcher(raw)
        val links = new StringBuilder
        while (m.find()) {
          if (links.nonEmpty) links.append(' ')
          links.append(m.group(1))
        }
        val ltext = norm(decode(links.toString.replaceAll(tagRe, " ")))
        (btext, ltext)
      }
      .filter { case (t, l) =>
        t.nonEmpty && !(2 * l.length > t.length || t.length < minChars)
      }
      .map(_._1).mkString("\n")
  }
}
