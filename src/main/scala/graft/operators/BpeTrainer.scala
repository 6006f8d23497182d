package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.text

/** Distributed BPE vocabulary TRAINING (Sennrich, Haddow, Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 — the
  * subword-nmt `learn_bpe` loop). t25 replays ENCODING against a fixture
  * merge table; this learns the table from the corpus — the other half a
  * tokenizer-owning pipeline needs.
  *
  * The scale design is the standard one and the whole point: the ONLY
  * corpus-sized operation is the initial word-frequency aggregation (one
  * map-side-combined groupBy over the token stream). Every merge iteration
  * then runs on the BOUNDED distinct-word table — at 100 TB the corpus has
  * trillions of tokens but a word-frequency table orders of magnitude
  * smaller, and per-word cost is independent of how often the word occurs.
  * Per iteration: adjacent-pair counts weighted by word frequency (one
  * shuffle over the word table), a ONE-ROW argmax via TakeOrdered (never a
  * global sort), and a map-only rewrite. Driver state: one (pair, freq)
  * row per iteration — the merge table itself, N rows total (same bounded
  * contract as Clustering's k centroids).
  *
  * Determinism contract (both engines replay it exactly):
  * - words = whitespace tokens of text.normalize; symbols start as
  *   codepoint chars; a word rides as the DOUBLE-SPACED form
  *   '␣␣s1␣␣s2␣␣…␣␣sn␣␣'. A merge of (l, r) is then the plain built-in
  *   replace('␣l␣␣r␣' → '␣lr␣'): each match consumes ONE space of each
  *   boundary, leaving singles that recombine with the neighbors'
  *   leftovers into doubles — which makes sequential non-overlapping
  *   replace (identical semantics in Spark's StringReplace and DuckDB's
  *   replace()) EXACTLY the fold-left BPE merge, including on symbol runs
  *   ('a a a a' → 'aa aa', where a single-spaced replace would consume
  *   the shared boundary and yield the wrong 'aa a a'). No regex, no
  *   lookarounds (RE2 in either engine has none), no custom kernel.
  * - pair statistics count EVERY adjacent index pair (overlaps included:
  *   'a a a' counts (a,a) twice), weighted by word frequency.
  * - the winning pair is max by (freq desc, left asc, right asc) — binary
  *   UTF-8 string order, no collation — so ties can't diverge.
  */
object BpeTrainer {

  /** Double-spaced symbol form of a word: '␣␣h␣␣e␣␣l␣␣l␣␣o␣␣'. */
  private def spaced(word: Column): Column =
    concat(lit("  "), array_join(transform(
      sequence(lit(1), length(word)),
      i => word.substr(i, lit(1))), "  "), lit("  "))

  /** Adjacent symbol pairs of a spaced word (empty when < 2 symbols). */
  private def adjacentPairs(sym: Column): Column = {
    val syms = split(trim(sym), " +")
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
  }

  /** Learn `numMerges` BPE merges from the corpus. Returns the merge table
    * `(step, left, right, freq)` — step 1-based in learned order, freq the
    * weighted adjacent-pair count that won the step. Stops early (fewer
    * rows) if no pair remains. Eager: runs one Spark job per iteration
    * plus the initial word-frequency aggregation (word table
    * localCheckpoint()ed per step — the rewrite chain must not re-derive
    * N replaces against the corpus each iteration). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            driverWordCap: Int = 100000): DataFrame = {
    require(numMerges >= 1, s"train needs numMerges>=1 (got $numMerges)")
    val spark = df.sparkSession
    val wordTable = graft.Tables.scaled(df.select(col(textCol).as("__t")))
      .select(explode(text.tokens(col("__t"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(spaced(col("w")).as("sym"), col("cnt"))
    // the pageRank/hits execution split (rule 17, applied r18): the merge
    // ladder runs on the BOUNDED word table, and under the cap the whole
    // N-step fixed point replays DRIVER-SIDE after the one corpus-sized
    // aggregation — exact integer counts + binary-UTF8 tiebreaks make the
    // replay bit-identical to the distributed loop (BpeTrainerSpec gates
    // it), which otherwise pays ~1 driver job of pure latency per merge
    // (measured: the 30-rung ladder over sf0.1's 31-word vocabulary was
    // ~3 s of job scheduling for microseconds of arithmetic). Past the
    // cap — a real corpus vocabulary — the distributed ladder runs as
    // before.
    val probe = wordTable.limit(driverWordCap + 1).collect()
    if (probe.length <= driverWordCap)
      return trainDriver(spark,
        probe.map(r => (r.getString(0), r.getLong(1))), numMerges)
    var words = wordTable.localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val top = words
        .select(explode(adjacentPairs(col("sym"))).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("f"))
        .orderBy(col("f").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, f))
        val prev = words
        // LAZY checkpoint (r17 optimization round): the rewritten vocab
        // materializes inside the NEXT step's stats job instead of paying a
        // dedicated materialization job per merge — halves the ladder's
        // driver-job count (2 jobs/step -> 1) while keeping the same O(1)
        // lineage depth and the same per-step arithmetic.
        words = words
          .withColumn("sym", replace(col("sym"), lit(s" $l  $r "), lit(s" $l$r ")))
          .localCheckpoint(false)
        prev.unpersist()
        step += 1
      }
    }
    words.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("step", "left", "right", "freq")
      .select(col("step").cast("long"), col("left"), col("right"), col("freq"))
  }

  /** Rule-17 driver replay of the merge ladder over the collected word
    * table — value-identical to the distributed loop by exactness:
    *  - trim/split replicate Spark's `split(trim(sym), " +")` (trim strips
    *    0x20 only; the trimmed spaced form has no leading/trailing runs,
    *    so neither engine sees empty symbols);
    *  - pair counts are exact long sums (order-free);
    *  - the argmax tiebreak compares UTF-8 BYTES (UTF8String.compareTo),
    *    never UTF-16 chars — Java String ordering diverges from binary
    *    UTF-8 order for non-BMP codepoints;
    *  - the rewrite is Java String.replace — the same left-to-right
    *    non-overlapping literal replace as UTF8String.replace. */
  private def trainDriver(spark: org.apache.spark.sql.SparkSession,
                          table: Array[(String, Long)],
                          numMerges: Int): DataFrame = {
    def trimSpaces(s: String): String = {
      var a = 0; var b = s.length
      while (a < b && s.charAt(a) == ' ') a += 1
      while (b > a && s.charAt(b - 1) == ' ') b -= 1
      s.substring(a, b)
    }
    def byteLt(a: String, b: String): Boolean =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0
    var words = table
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (sym, cnt) =>
        val syms = trimSpaces(sym).split(" +")
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), cnt, (a, b) => a + b)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = (e.getKey, e.getValue)
          if (best == null || c._2 > best._2 ||
            (c._2 == best._2 && (byteLt(c._1._1, best._1._1) ||
              (c._1._1 == best._1._1 && byteLt(c._1._2, best._1._2)))))
            best = c
        }
        val ((l, r), f) = best
        merges += ((step, l, r, f))
        words = words.map { case (s, c) => (s.replace(s" $l  $r ", s" $l$r "), c) }
        step += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("step", "left", "right", "freq")
      .select(col("step").cast("long"), col("left"), col("right"), col("freq"))
  }
}
