package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real greedy byte-pair-encoding tokenizer (Sennrich et al. 2016; the
  * `bpe()` loop of the public GPT-2 encoder): split a word into character
  * symbols, then repeatedly find the LOWEST-RANK adjacent symbol pair
  * present in the merges table and merge every occurrence of that pair
  * (left-to-right, non-overlapping), until no adjacent pair is mergeable.
  *
  * This replaces approximating token counts with a whitespace/regex
  * heuristic: chunk budgets (6000/300) and sequence packing (t15) key off
  * token counts, and a trained pipeline budgets by REAL tokenizer output.
  * The merges table is data, not code — [[FixtureMerges]] is a small
  * deterministic stand-in; a deployment loads its model's learned merges
  * file (50k rules) into the same structures. Rank = merges-file line
  * number, exactly the learned-merge priority the real models use.
  *
  * Reference keys token budgets off whitespace counts / char heuristics
  * (`fast_ops.py:257-287`, `morphik_parser.py:54-107` chunk sizing); this
  * is the from-scratch upgrade a training pipeline needs.
  */
object BpeTokenizer {

  /** Deterministic merges fixture (rank = index). English-bigram shaped so
    * it actually fires on the synthetic corpus. Contains a rule chain
    * (t,h → th,e) and composing rules (a,n → an,d) so multi-level merges
    * are exercised. No (x,x) self-pair rule: the DuckDB oracle replays
    * merges by separator-aware string replace, which is exactly equivalent
    * only for a≠b pairs (the Scala scan handles self-pairs too). */
  val FixtureMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"),
    ("r", "e"), ("a", "t"), ("s", "t"), ("e", "n"), ("o", "r"), ("an", "d"),
    ("in", "g"), ("o", "u"), ("l", "e"), ("a", "r"))

  def ranks(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** One word (no whitespace) → BPE symbols. Symbols always concatenate
    * back to the word (lossless). */
  def tokenizeWord(word: String, rank: Map[(String, String), Int]): List[String] = {
    if (word.isEmpty) return Nil
    // split by CODE POINTS so surrogate pairs are one symbol
    var symbols: Vector[String] = {
      val b = Vector.newBuilder[String]
      var o = 0
      while (o < word.length) {
        val n = Character.charCount(word.codePointAt(o))
        b += word.substring(o, o + n)
        o += n
      }
      b.result()
    }
    var continue = symbols.length > 1
    while (continue) {
      // lowest-rank adjacent pair present anywhere in the symbol list
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < symbols.length - 1) {
        val r = rank.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) continue = false
      else {
        val a = symbols(bi); val b = symbols(bi + 1)
        // merge ALL occurrences of (a,b), left-to-right, non-overlapping
        val merged = Vector.newBuilder[String]
        var j = 0
        while (j < symbols.length) {
          if (j < symbols.length - 1 && symbols(j) == a && symbols(j + 1) == b) {
            merged += a + b
            j += 2
          } else {
            merged += symbols(j)
            j += 1
          }
        }
        symbols = merged.result()
        continue = symbols.length > 1
      }
    }
    symbols.toList
  }

  /** Whitespace pre-tokenize then per-word BPE (the standard two-stage
    * shape: a pre-tokenizer bounds merge scope to words, which is also
    * what keeps the merge loop O(word) not O(document)). */
  def encode(text: String, rank: Map[(String, String), Int]): List[String] =
    text.split("\\s+").iterator.filter(_.nonEmpty)
      .flatMap(w => tokenizeWord(w, rank)).toList

  /** Column form: text → array<string> of BPE tokens. The merges table
    * rides into the expression as a literal (sketch-probe pattern: small
    * model state broadcast via the plan, never a per-row join). */
  case class BpeEncode(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "bpe_encode"

    @transient private lazy val rank = ranks(merges)

    override def nullSafeEval(v: Any): Any = {
      val toks = encode(v.asInstanceOf[UTF8String].toString, rank)
      new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def bpe_encode(text: Column, merges: Seq[(String, String)] = FixtureMerges): Column =
    toCol(BpeEncode(toExpr(text), merges))
}
