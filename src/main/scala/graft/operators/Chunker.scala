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

  /** TextTiling topic segmentation (Hearst 1997, CL 23(1)) — the
    * SEMANTIC chunk-boundary signal the size-driven splitters above lack:
    * chunk where the topic shifts, not where a byte budget fills. Used as
    * the boundary stage of a RAG chunker and as a topic-drift diagnostic
    * over long documents.
    *
    * Shape, per document (all IN-ROW — the token list, the cohesion
    * profile, and the depth scoring never leave the row, so the operator
    * is map-only with zero shuffles):
    *  1. tokens group into pseudo-sentences of `w` tokens; `nb` blocks.
    *  2. at each inter-block gap g, cohesion = Dice overlap of the `k`
    *     blocks either side: sim_ppm = 2·Σ_t min(cnt_l, cnt_r)·10⁶ /
    *     (|left|+|right|) — the clipped-overlap primitive, EXACT integer
    *     (Hearst's cosine is replaced by Dice so no sqrt enters; the
    *     substitution is stated, standard, and keeps the whole profile
    *     oracle-replayable).
    *  3. depth(g) = max(0, peakL−sim) + max(0, peakR−sim) with peaks the
    *     windowed maxima over the `radius` gaps either side — the
    *     fixed-radius variant of Hearst's hill climb (a pure array slice;
    *     the climb variant needs unbounded scan state).
    *  4. boundary where depth_ppm ≥ `thresholdPpm` (Hearst's mean−σ/2 cut
    *     is corpus-relative; a fixed cut keeps rows independent — the
    *     caller can re-threshold from the emitted depths at will).
    *
    * Docs shorter than `w`+1 tokens carry no gap and emit nothing.
    * Integer-div is expressed as (a − pmod(a,b))/b: exact long arithmetic
    * into an exactly-representable quotient (numerators ≤ 2·k·w·10⁶). */
  def textTileGaps(df: DataFrame, idCol: String, textCol: String,
                   w: Int = 8, k: Int = 2, radius: Int = 3,
                   thresholdPpm: Long = 250000L): DataFrame = {
    require(w >= 2 && k >= 1 && radius >= 1, s"bad TextTiling params ($w,$k,$radius)")
    def idiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val base = df
      .select(col(idCol), graft.functions.text.tokens(col(textCol)).as("__tk"))
      .where(size(col("__tk")) >= w + 1)
      .withColumn("__nb", idiv((size(col("__tk")) + lit(w - 1)).cast("long"), lit(w.toLong)))
    val sims = transform(sequence(lit(1L), col("__nb") - 1), g => {
      val lo = greatest(g - k, lit(0L))
      val lft = slice(col("__tk"), (lo * w + 1).cast("int"), ((g - lo) * w).cast("int"))
      val rgt = slice(col("__tk"), (g * w + 1).cast("int"),
        ((least(col("__nb"), g + k) - g) * w).cast("int"))
      val m = graft.functions.text.clipped_overlap(lft, rgt)
      idiv(m * lit(2000000L), (size(lft) + size(rgt)).cast("long"))
    })
    base.withColumn("__sims", sims)
      .withColumn("__r", explode(
        transform(sequence(lit(1), size(col("__sims"))), i => {
          val s = element_at(col("__sims"), i)
          val ml = coalesce(array_max(slice(col("__sims"),
            greatest(i - radius, lit(1)), i - greatest(i - radius, lit(1)))), s)
          val mr = coalesce(array_max(slice(col("__sims"), i + 1, lit(radius))), s)
          val depth = greatest(ml - s, lit(0L)) + greatest(mr - s, lit(0L))
          struct(i.cast("long").as("gap"), s.as("sim_ppm"), depth.as("depth_ppm"))
        })))
      .select(col(idCol), col("__r.gap"), col("__r.sim_ppm"), col("__r.depth_ppm"),
        (col("__r.depth_ppm") >= thresholdPpm).as("is_boundary"))
  }

  /** The chunks TextTiling exists to produce: token spans between
    * boundary gaps (chunk c = tokens (g_{c-1}·w, g_c·w]). Emits
    * (id, chunk_number 0-based, n_tokens, chunk) — chunk text is the
    * space-join of the span, so concatenating a doc's chunks with single
    * spaces reconstructs its normalized token stream exactly (spec-gated).
    * Same map-only shape as [[textTileGaps]]; short docs (< w+1 tokens,
    * no gaps) emit their whole token stream as chunk 0. */
  def textTileChunks(df: DataFrame, idCol: String, textCol: String,
                     w: Int = 8, k: Int = 2, radius: Int = 3,
                     thresholdPpm: Long = 250000L): DataFrame = {
    val gaps = textTileGaps(df, idCol, textCol, w, k, radius, thresholdPpm)
      .where(col("is_boundary"))
      .groupBy(col(idCol)).agg(sort_array(collect_list(col("gap"))).as("__bnd"))
    df.select(col(idCol), graft.functions.text.tokens(col(textCol)).as("__tk"))
      .where(size(col("__tk")) >= 1)
      .join(gaps, Seq(idCol), "left")
      .withColumn("__bnd", coalesce(col("__bnd"), array().cast("array<long>")))
      .withColumn("__cuts", concat(array(lit(0L)), col("__bnd"),
        array(size(col("__tk")).cast("long"))))
      .withColumn("__r", explode(
        transform(sequence(lit(1), size(col("__cuts")) - 1), c => {
          val from = element_at(col("__cuts"), c) * w
          val cap = size(col("__tk")).cast("long")
          val start = least(from, cap)
          val until = when(c === size(col("__cuts")) - 1, cap)
            .otherwise(least(element_at(col("__cuts"), c + 1) * w, cap))
          struct((c - 1).cast("long").as("chunk_number"),
            (until - start).as("n_tokens"),
            concat_ws(" ", slice(col("__tk"), (start + 1).cast("int"),
              (until - start).cast("int"))).as("chunk"))
        })))
      .where(col("__r.n_tokens") > 0)
      .select(col(idCol), col("__r.chunk_number"), col("__r.n_tokens"),
        col("__r.chunk"))
  }
}
