package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.xml.{Elem, Node, XML}

/** XML structural chunker (SURVEY S7, `core/parser/xml_chunker.py:26-368`):
  * profile the tree to pick a repeated "unit tag", emit one chunk per unit
  * with breadcrumbs, stable xml ids, prev/next links, and a token-bounded
  * recursive split for oversized units.
  *
  * Applied distributed as a flatMap generator — per-document imperative
  * parsing, no shuffle (the Spark tier-(d) case: genuine per-partition
  * logic over an opaque format).
  */
object XmlChunker {

  case class XmlChunk(
      xmlId: String,
      tag: String,
      breadcrumbs: Seq[String],
      chunkIndex: Int,
      content: String,
      prevId: Option[String],
      nextId: Option[String])

  /** Unit-tag selection (`xml_chunker.py` tree profiling): the most frequent
    * element tag with >= 2 occurrences that directly carries text; ties to
    * the shallower then lexically-first tag. Falls back to the root. */
  def pickUnitTag(root: Elem): String = {
    def walk(n: Node, depth: Int): Seq[(String, Int)] = n match {
      case e: Elem =>
        val self =
          if (e.child.exists(c => c.isInstanceOf[scala.xml.Text] && c.text.trim.nonEmpty) ||
            e.child.exists(_.isInstanceOf[Elem]))
            Seq(e.label -> depth)
          else Seq(e.label -> depth)
        self ++ e.child.flatMap(walk(_, depth + 1))
      case _ => Nil
    }
    val counts = walk(root, 0).groupBy(_._1)
      .map { case (tag, xs) => (tag, xs.size, xs.map(_._2).min) }
    val candidates = counts.filter(_._2 >= 2)
    if (candidates.isEmpty) root.label
    else candidates.toSeq.sortBy { case (tag, n, d) => (-n, d, tag) }.head._1
  }

  /** Chunk one XML document. `maxTokens` bounds chunk size in whitespace
    * tokens; oversized units split recursively by child elements, then by
    * token windows. */
  def chunk(xml: String, maxTokens: Int = 200): Seq[XmlChunk] = {
    val root =
      try XML.loadString(xml)
      catch { case _: Throwable => return Nil }
    val unit = pickUnitTag(root)

    def textOf(n: Node): String = n.text.trim.replaceAll("\\s+", " ")
    def tokens(s: String): Array[String] = s.split(" ").filter(_.nonEmpty)

    // collect units in document order with their breadcrumb paths
    def findUnits(n: Node, crumbs: Seq[String]): Seq[(Elem, Seq[String])] = n match {
      case e: Elem if e.label == unit => Seq((e, crumbs))
      case e: Elem => e.child.flatMap(c => findUnits(c, crumbs :+ e.label)).toSeq
      case _ => Nil
    }
    val units0 = findUnits(root, Nil)
    val units = if (units0.isEmpty) Seq((root, Seq.empty[String])) else units0

    // token-bounded split of one unit: children-first, windows as fallback
    def split(e: Elem): Seq[String] = {
      val t = textOf(e)
      if (tokens(t).length <= maxTokens) return if (t.isEmpty) Nil else Seq(t)
      val childElems = e.child.collect { case c: Elem => c }
      if (childElems.nonEmpty) childElems.flatMap(split)
      else tokens(t).grouped(maxTokens).map(_.mkString(" ")).toSeq
    }

    val pieces = units.zipWithIndex.flatMap { case ((e, crumbs), ui) =>
      split(e).zipWithIndex.map { case (content, pi) =>
        (s"$unit-$ui-$pi", e.label, crumbs, content)
      }
    }
    pieces.zipWithIndex.map { case ((id, tag, crumbs, content), i) =>
      XmlChunk(id, tag, crumbs, i, content,
        prevId = if (i > 0) Some(pieces(i - 1)._1) else None,
        nextId = if (i < pieces.length - 1) Some(pieces(i + 1)._1) else None)
    }
  }

  /** Distributed form: explode each XML document into chunk rows. */
  def chunkColumn(df: DataFrame, idCol: String, xmlCol: String,
                  maxTokens: Int = 200): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.Tables.scaled(df.select(col(idCol).cast("long"), col(xmlCol)))
      .as[(Long, String)]
      .flatMap { case (id, xml) =>
        chunk(Option(xml).getOrElse(""), maxTokens).map(c =>
          (id, c.xmlId, c.tag, c.breadcrumbs.mkString("/"), c.chunkIndex,
            c.content, c.prevId.orNull, c.nextId.orNull))
      }
      .toDF(idCol, "xml_id", "tag", "breadcrumbs", "chunk_index",
        "content", "prev_id", "next_id")
  }
}
