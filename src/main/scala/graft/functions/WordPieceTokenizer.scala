package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenizer (Wu et al. 2016; the BERT `WordpieceTokenizer`
  * loop): per word, GREEDY LONGEST-PREFIX match against a vocabulary,
  * non-initial pieces spelled with the `##` continuation prefix; if no
  * piece matches at any position the WHOLE word becomes `[UNK]` — the
  * all-or-nothing rule that distinguishes WordPiece from BPE's
  * merge-driven segmentation ([[BpeTokenizer]]; together they cover both
  * mainstream subword families).
  *
  * The vocabulary is data, not code — [[FixtureVocab]] is a deterministic
  * stand-in shaped to the synthetic corpus (multi-char stems +
  * continuations + a char-fallback tier that deliberately omits x/z so
  * the `[UNK]` path is reachable); a deployment loads its model's real
  * vocab (30k pieces) into the same structure. Per-row cost is
  * O(word²·lookup) worst case on word length, bounded by `maxChars` —
  * never corpus-sized state. */
object WordPieceTokenizer {

  val Unk = "[UNK]"

  /** Char tier (no x/z), stems, and continuations — tuned so the corpus
    * vocabulary exercises multi-char matches, continuation chains, char
    * fallback, and single-piece words; planted z/x words hit [UNK]. */
  val FixtureVocab: Seq[String] = {
    val chars = "abcdefghijklmnopqrstuvwy".map(_.toString)
    val stems = Seq("tab", "sc", "st", "spa", "wind", "quer", "cust", "the",
      "row", "hash", "line", "sort", "part", "val", "fil", "me", "ba", "da",
      "gr", "jo", "ord", "ag", "key", "big", "small", "col")
    val conts = Seq("##le", "##scan", "##an", "##ream", "##rk", "##ow",
      "##y", "##omer", "##ue", "##ter", "##rge", "##tch", "##ta", "##oup",
      "##in", "##er", "##g", "##umn")
    chars ++ chars.map("##" + _) ++ stems ++ conts
  }

  /** One word → WordPiece pieces (greedy longest-prefix; all-or-nothing
    * [UNK]). Empty word → no pieces. */
  def tokenizeWord(word: String, vocab: Set[String],
                   maxChars: Int = 100): List[String] = {
    if (word.isEmpty) return Nil
    if (word.length > maxChars) return List(Unk)
    val out = scala.collection.mutable.ListBuffer[String]()
    var start = 0
    while (start < word.length) {
      var end = word.length
      var cur: String = null
      while (cur == null && end > start) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab.contains(sub)) cur = sub else end -= 1
      }
      if (cur == null) return List(Unk)
      out += cur
      start = end
    }
    out.toList
  }

  /** Whitespace pre-tokenize then per-word WordPiece (the BERT two-stage
    * shape — the pre-tokenizer bounds match scope to words). */
  def encode(text: String, vocab: Set[String]): List[String] =
    text.split("\\s+").iterator.filter(_.nonEmpty)
      .flatMap(w => tokenizeWord(w, vocab)).toList

  /** Column form: text → array<string> of WordPiece tokens. The vocab
    * rides into the expression as plan state (the BpeEncode pattern —
    * small model state broadcast via the plan, never a per-row join). */
  case class WordPieceEncode(child: Expression, vocab: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "wordpiece_encode"

    @transient private lazy val vocabSet = vocab.toSet

    override def nullSafeEval(v: Any): Any = {
      val toks = encode(v.asInstanceOf[UTF8String].toString, vocabSet)
      new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def wordpiece_encode(text: Column,
                       vocab: Seq[String] = FixtureVocab): Column =
    toCol(WordPieceEncode(toExpr(text), vocab))
}
