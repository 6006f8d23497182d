package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Corpus, TextRepair}

/** Semantic laws for the mojibake repair (the t37 oracle proves
  * engine-equivalence of the replace fold; this proves the fold actually
  * UNDOES the corruption) plus edge behavior of the OOV-rate gate. */
class TextRepairSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def repair(rows: Seq[String]): Seq[(String, String, Long)] =
    TextRepair.fixMojibake(
      rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t"), "t")
      .orderBy("id").select(col("t"), col("repaired"), col("n_fixed"))
      .as[(String, String, Long)].collect().toSeq

  test("repair ∘ corrupt = identity for every char in the repair table") {
    val clean = "It’s élite — «naïve» café… ça coûte 5° über señor ¿qué? ¡sí!"
    val Seq((_, repaired, n)) = repair(Seq(TextRepair.corrupt(clean)))
    assert(repaired == clean)
    assert(n == clean.count(_ > 127), "every non-ASCII char was one marker")
  }

  test("clean ASCII and already-correct UTF-8 pass through untouched") {
    val rows = Seq("plain ascii text.", "déjà vu — it’s café…", "")
    repair(rows).foreach { case (orig, repaired, n) =>
      assert(repaired == orig)
      assert(n == 0L, s"false positive on: $orig")
    }
  }

  test("counts are per-occurrence and measured on the input") {
    val bad = TextRepair.corrupt("’’é") + " plain"
    val Seq((_, repaired, n)) = repair(Seq(bad))
    assert(repaired == "’’é plain")
    assert(n == 3L)
  }

  test("undefined-CP1252-byte targets are excluded by construction") {
    // "”" (E2 80 9D) crosses undefined 0x9D — must NOT be in the table,
    // and text containing its common partial rendering must survive
    // unmodified except for defined markers
    assert(!TextRepair.pairs.exists(_._2 == "”"))
    assert(TextRepair.pairs.nonEmpty)
    assert(TextRepair.pairs.map(_._1).distinct.size == TextRepair.pairs.size)
  }

  test("no marker is a substring of another (counts never nest)") {
    val ms = TextRepair.pairs.map(_._1)
    for (a <- ms; b <- ms if a != b) assert(!b.contains(a), s"'$a' inside '$b'")
  }

  test("oovRate: vocab boundary deterministic, token-less docs kept at 0") {
    val df = Seq(
      (1L, "aa bb aa cc"), // aa,bb,cc in-vocab (k=3 → top3 by cnt,tok asc)
      (2L, "aa zz qq"),    // zz,qq out-of-vocab
      (3L, "   ")          // no tokens at all
    ).toDF("doc_id", "text")
    val out = Corpus.oovRate(df, "doc_id", "text", vocabK = 3)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 0L, 0L),
      (2L, 3L, 2L, 6666L),
      (3L, 0L, 0L, 0L)))
  }
}
