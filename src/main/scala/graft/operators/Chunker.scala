package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chunking operators (SURVEY §2.2).
  *
  * [[fixedChunks]] is the fully-declarative sliding-window splitter
  * (sequence + transform + posexplode — no UDF, SQL-oracle-able).
  * [[recursiveSplit]] is the reference's recursive character splitter
  * (`morphik_parser.py:54-107`, Rust twin `morphik_rust/src/chunking.rs`):
  * split on ["\n\n", "\n", ". ", " ", ""] recursively, greedily merge
  * pieces up to chunk_size, and prepend up to `overlap` chars of the
  * previous chunk's suffix. Pure deterministic Scala, applied as a flatMap
  * generator — one pass per document, no shuffle.
  */
object Chunker {

  /** Fixed-size sliding chunks: size `n`, stride `n - overlap`. Emits
    * (chunk_number starting at 0, chunk text). */
  def fixedChunks(df: DataFrame, idCol: String, textCol: String,
                  n: Int, overlap: Int): DataFrame = {
    val stride = n - overlap
    require(stride > 0, "overlap must be < chunk size")
    val t = col(textCol)
    val starts = sequence(lit(1), greatest(length(t) - (n - stride), lit(1)), lit(stride))
    df.select(col(idCol), posexplode(transform(starts, s => t.substr(s, lit(n))))
        .as(Seq("chunk_number", "chunk")))
      .filter(length(col("chunk")) > 0)
  }

  /** C2 contextual chunker (`morphik_parser.py:110-193`): each chunk gets a
    * situating context prepended as "{context}; {chunk}". The reference asks
    * an LLM per chunk; here the context is a deterministic doc-prefix
    * stand-in (the LLM slot is a `mapPartitions` stage like `Embedder`, and
    * swapping it in changes no plan shape), so the operator stays
    * oracle-checkable end to end. */
  def contextualChunks(df: DataFrame, idCol: String, textCol: String,
                       n: Int, overlap: Int, contextChars: Int = 40): DataFrame = {
    val stride = n - overlap
    require(stride > 0, "overlap must be < chunk size")
    val t = col(textCol)
    val starts = sequence(lit(1), greatest(length(t) - (n - stride), lit(1)), lit(stride))
    df.select(col(idCol), substring(t, 1, contextChars).as("__ctx"),
        posexplode(transform(starts, s => t.substr(s, lit(n))))
          .as(Seq("chunk_number", "chunk")))
      .filter(length(col("chunk")) > 0)
      .withColumn("chunk", concat(col("__ctx"), lit("; "), col("chunk")))
      .drop("__ctx")
  }

  /** Reference-faithful recursive character splitter. chunkSize/overlap
    * defaults mirror `morphik.toml:96-97` (6000/300). */
  def splitText(text: String, chunkSize: Int = 6000, overlap: Int = 300): Seq[String] = {
    val seps = Seq("\n\n", "\n", ". ", " ", "")

    def split(t: String, sepIdx: Int): Seq[String] = {
      if (t.length <= chunkSize) return if (t.isEmpty) Nil else Seq(t)
      if (sepIdx >= seps.length) return t.grouped(chunkSize).toSeq
      val sep = seps(sepIdx)
      if (sep.isEmpty) return t.grouped(chunkSize).toSeq
      val parts = splitKeepSep(t, sep)
      if (parts.length == 1) return split(t, sepIdx + 1)
      // Greedy merge of parts into <= chunkSize chunks; oversized parts
      // recurse with the next separator.
      val out = scala.collection.mutable.ArrayBuffer[String]()
      val cur = new StringBuilder
      for (p <- parts) {
        if (cur.length + p.length <= chunkSize) cur.append(p)
        else {
          if (cur.nonEmpty) { out += cur.toString; cur.clear() }
          if (p.length <= chunkSize) cur.append(p)
          else out ++= split(p, sepIdx + 1)
        }
      }
      if (cur.nonEmpty) out += cur.toString
      out.toSeq
    }

    // Split but keep the separator attached to the preceding piece.
    def splitKeepSep(t: String, sep: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var start = 0
      var idx = t.indexOf(sep, start)
      while (idx >= 0) {
        out += t.substring(start, idx + sep.length)
        start = idx + sep.length
        idx = t.indexOf(sep, start)
      }
      if (start < t.length) out += t.substring(start)
      out.toSeq
    }

    val base = split(text, 0)
    // Prev-suffix overlap stitching (`morphik_parser.py:54-107`): each chunk
    // after the first is prefixed with the previous chunk's last `overlap`
    // chars.
    if (overlap <= 0 || base.length <= 1) base
    else base.head +: base.sliding(2).map { case Seq(prev, cur) =>
      prev.takeRight(overlap) + cur
    }.toSeq
  }

  /** Distributed recursive splitter: one output row per chunk. */
  def recursiveChunks(df: DataFrame, idCol: String, textCol: String,
                      chunkSize: Int = 6000, overlap: Int = 300): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.Tables.scaled(df.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        splitText(Option(t).getOrElse(""), chunkSize, overlap)
          .zipWithIndex.map { case (c, i) => (id, i, c) }
      }
      .toDF(idCol, "chunk_number", "chunk")
  }
}
