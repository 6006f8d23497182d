package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.BpeTokenizer

/** Greedy BPE: known-vector merges, GPT-2 loop semantics (lowest rank
  * first, all occurrences per pass, self-pair non-overlap), lossless
  * round-trip, and count relations vs the whitespace/regex baselines.
  */
class BpeTokenizerSpec extends AnyFunSuite {

  private val rank = BpeTokenizer.ranks(BpeTokenizer.FixtureMerges)
  private def tok(w: String): List[String] = BpeTokenizer.tokenizeWord(w, rank)

  test("known vectors walk the merge chain in rank order") {
    // 'the': t,h,e -> (t,h) rank 0 -> th,e -> (th,e) rank 1 -> the
    assert(tok("the") == List("the"))
    // 'then': (t,h)->th; (th,e)->the? pairs after th,e,n: (th,e) rank1 beats
    // (e,n) rank9 -> the,n; (the,n) unranked -> stop
    assert(tok("then") == List("the", "n"))
    // 'and': (a,n) rank 3 -> an,d; (an,d) rank 11 -> and
    assert(tok("and") == List("and"))
    // 'standing': s,t,a,n,d,i,n,g: (i,n) rank2 beats (a,n) rank3 and (s,t)
    // rank8 -> s,t,a,n,d,in,g; (a,n) -> s,t,an,d,in,g; (s,t) -> st,an,d,in,g;
    // (an,d) rank11 -> st,and,in,g; (in,g) rank12 -> st,and,ing
    assert(tok("standing") == List("st", "and", "ing"))
    // unmergeable stays characters
    assert(tok("xyz") == List("x", "y", "z"))
    assert(tok("") == Nil)
    assert(tok("q") == List("q"))
  }

  test("lowest-rank pair wins even when a later pair appears first in the word") {
    // 'ain': pairs (a,i) unranked, (i,n) rank 2 -> a,in
    assert(tok("ain") == List("a", "in"))
    // 'anin': (a,n) rank3 at pos 0, (i,n) rank2 at pos 2 -> merge (i,n)
    // first: a,n,in; then (a,n): an,in
    assert(tok("anin") == List("an", "in"))
  }

  test("a merge pass takes all occurrences, left-to-right, non-overlapping") {
    // custom table with a self-pair to pin the scan semantics
    val selfRank = BpeTokenizer.ranks(Seq(("a", "a")))
    assert(BpeTokenizer.tokenizeWord("aaa", selfRank) == List("aa", "a"))
    assert(BpeTokenizer.tokenizeWord("aaaa", selfRank) == List("aa", "aa"))
    // (aa,a) chain on top
    val chain = BpeTokenizer.ranks(Seq(("a", "a"), ("aa", "aa")))
    assert(BpeTokenizer.tokenizeWord("aaaa", chain) == List("aaaa"))
    // all occurrences of the chosen pair in one pass
    val rk = BpeTokenizer.ranks(Seq(("a", "b"), ("ab", "ab")))
    assert(BpeTokenizer.tokenizeWord("abab", rk) == List("abab"))
  }

  test("encode splits on whitespace and keeps word order") {
    assert(BpeTokenizer.encode("the and", rank) == List("the", "and"))
    assert(BpeTokenizer.encode("  the \n and ", rank) == List("the", "and"))
    assert(BpeTokenizer.encode("", rank) == Nil)
  }

  private val params = Gen.Parameters.default
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(params, Seed(i.toLong)))
  private val wordGen: Gen[String] =
    Gen.listOfN(12, Gen.frequency(
      8 -> Gen.alphaLowerChar, 1 -> Gen.numChar, 1 -> Gen.const('é')))
      .map(_.mkString)

  test("property: tokens always concatenate back to the word (lossless)") {
    samples(wordGen, 200).foreach { w =>
      val ts = tok(w)
      assert(ts.mkString == w, s"round-trip failed for '$w'")
      assert(ts.forall(_.nonEmpty))
    }
  }

  test("property: token count bounded by [1, #codepoints] and <= whitespace-regex baseline char count") {
    samples(wordGen, 200).filter(_.nonEmpty).foreach { w =>
      val n = tok(w).size
      val cp = w.codePointCount(0, w.length)
      assert(n >= 1 && n <= cp, s"count $n out of [1,$cp] for '$w'")
    }
    // text-level: BPE tokens per text never exceed codepoint count and are
    // never fewer than the whitespace token count (merges stop at word
    // boundaries, so each word yields >= 1 token)
    val texts = samples(Gen.listOfN(10, wordGen).map(_.mkString(" ")), 50)
    texts.foreach { t =>
      val n = BpeTokenizer.encode(t, rank).size
      val ws = t.split("\\s+").count(_.nonEmpty)
      assert(n >= ws, s"bpe count $n < whitespace count $ws for '$t'")
    }
  }

  test("property: adding a merge rule never increases the token count") {
    val base = BpeTokenizer.FixtureMerges
    val extended = BpeTokenizer.ranks(base :+ ("e", "s"))
    samples(wordGen, 100).foreach { w =>
      val n0 = tok(w).size
      val n1 = BpeTokenizer.tokenizeWord(w, extended).size
      assert(n1 <= n0, s"extended table grew count for '$w'")
    }
  }

  test("wordpiece: greedy longest-prefix, ## chains, all-or-nothing [UNK]") {
    import graft.functions.WordPieceTokenizer._
    val v = FixtureVocab.toSet
    assert(tokenizeWord("table", v) == List("tab", "##le"))
    assert(tokenizeWord("tablescan", v) == List("tab", "##le", "##scan"))
    // greedy takes the LONGEST prefix, not the first char
    assert(tokenizeWord("stream", v) == List("st", "##ream"))
    assert(tokenizeWord("spark", v) == List("spa", "##rk"))
    // char fallback keeps unknown-stem words segmentable
    assert(tokenizeWord("dup", v) == List("d", "##u", "##p"))
    // all-or-nothing: one uncoverable char kills the WHOLE word
    assert(tokenizeWord("zebra", v) == List(Unk))
    assert(tokenizeWord("size", v) == List(Unk), "z mid-word must also UNK")
    // lossless law: stripping ## reconstructs the word (non-UNK)
    Seq("table", "customer", "windowframe", "query", "agg").foreach { w =>
      val ps = tokenizeWord(w, v)
      assert(ps.head + ps.tail.map(_.drop(2)).mkString == w, s"$w: $ps")
    }
    // maxChars guard
    assert(tokenizeWord("a" * 101, v) == List(Unk))
    assert(encode("table  stream", v) ==
      List("tab", "##le", "st", "##ream"))
  }
}
