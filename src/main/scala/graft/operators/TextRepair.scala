package graft.operators

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encoding-damage repair for corpus curation — the ftfy-class "fix
  * mojibake" pass every web-crawl pipeline (CCNet and descendants) runs
  * before quality gates: text that was UTF-8 on the wire but got decoded as
  * Windows-1252 somewhere upstream reads as marker sequences ("â€™" where
  * "’" was meant, "Ã©" for "é"), poisons token statistics, and survives
  * every downstream filter unless repaired here.
  *
  * Scope is the deterministic core of the fix: a fixed, auditable table of
  * CP1252-mojibake marker → repaired-character pairs, applied as one
  * chained `replace` fold (all codegen'd string built-ins — no UDF). The
  * pair table is COMPUTED, not hand-typed: for each target char, the marker
  * is `new String(target.getBytes(UTF_8), windows-1252)` — the exact
  * corruption being undone — restricted to targets whose UTF-8 bytes all
  * map to defined, printable CP1252 positions (bytes 0x81/0x8D/0x8F/0x90/
  * 0x9D are undefined in CP1252 and real-world decoders disagree on them,
  * so e.g. "”" E2 80 9D is deliberately NOT in the table — a wrong repair
  * is worse than no repair). One pass, one fixed order: counts are
  * measured on the INPUT text (exact — no marker nests in another), the
  * repair fold applies in declared order, and the oracle replays the same
  * order, so both engines agree bit-for-bit even on adversarial
  * half-corrupted fragments. Twice-encoded text needs a second application
  * (ftfy's iterative multi-encode recovery is out of scope — stated, not
  * silent).
  *
  * 100 TB shape: stateless map-only — no shuffle, no join, no driver
  * state; the marker table is ~30 string literals baked into the plan.
  */
object TextRepair {

  private val Cp1252: Charset = Charset.forName("windows-1252")

  /** Characters the repair targets: curly quotes/dashes/ellipsis, the
    * Latin-1 letters common in European-language crawls, NBSP and
    * guillemets/degree. Every byte of each target's UTF-8 encoding maps to
    * a DEFINED CP1252 char (checked at init) — which is why Á (C3 81) and
    * Í (C3 8D) are absent: their second byte is an undefined CP1252
    * position, so their mojibake form is decoder-dependent and repairing a
    * guess would corrupt. */
  private val Targets: Seq[Char] =
    "’‘“–—…€áàâäãçéèêëíìîïñóòôöõúùûüýßÀÄÉÈÓÖÚÜÑ «»°·¿¡".toSeq

  /** (marker, repaired) pairs, marker = UTF-8 bytes of the target decoded
    * as CP1252 — longest markers first so no marker is applied inside a
    * longer one's match. */
  val pairs: Seq[(String, String)] = {
    val undefined = Set('\u0081', '\u008d', '\u008f', '\u0090', '\u009d')
    Targets.map { c =>
      val marker = new String(c.toString.getBytes(StandardCharsets.UTF_8), Cp1252)
      require(!marker.exists(undefined), s"target U+${c.toInt.toHexString} " +
        "crosses an undefined CP1252 byte — excluded by design")
      require(marker.length >= 2, s"target U+${c.toInt.toHexString} is not mojibake-visible")
      (marker, c.toString)
    }.sortBy { case (m, _) => (-m.length, m) }
  }

  /** Occurrence count of `marker` in `c` — (len − len(removed)) div
    * len(marker), exact integer arithmetic, measured on the untouched
    * input. Exact because no marker is a substring of another (2-char
    * markers start Ã/Â, 3-char markers start â and continue €/‚ — disjoint
    * alphabets), so matches never nest or overlap. */
  private def countOf(c: Column, marker: String): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          (length(c) - length(replace(c, lit(marker), lit("")))).cast("long")),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          lit(marker.length.toLong))))

  /** Adds `repairedCol` (the text with every marker pair un-corrupted, in
    * table order) and `countCol` (total marker occurrences in the INPUT —
    * the mojibake-damage score; 0 ⇒ repairedCol === textCol). */
  def fixMojibake(df: DataFrame, textCol: String,
                  repairedCol: String = "repaired",
                  countCol: String = "n_fixed"): DataFrame = {
    val t = col(textCol)
    val repaired = pairs.foldLeft(t) { case (acc, (m, r)) =>
      replace(acc, lit(m), lit(r))
    }
    val n = pairs.map { case (m, _) => countOf(t, m) }
      .reduce(_ + _).cast("long")
    df.withColumn(repairedCol, repaired).withColumn(countCol, n)
  }

  /** The same chained repair as DuckDB SQL over `inner` (an expression
    * yielding the text), for oracle generation — single-quote-escaped,
    * identical pair order. */
  def repairSql(inner: String): String =
    pairs.foldLeft(inner) { case (acc, (m, r)) =>
      s"replace($acc, '${esc(m)}', '${esc(r)}')"
    }

  /** Matching count expression: Σ (len − len(marker-stripped)) // len. */
  def countSql(inner: String): String =
    pairs.map { case (m, _) =>
      s"((len($inner) - len(replace($inner, '${esc(m)}', ''))) // ${m.length})"
    }.mkString("(", " + ", ")::BIGINT")

  private def esc(s: String): String = s.replace("'", "''")

  /** The corruption itself (UTF-8 bytes read as CP1252) — for fixture
    * synthesis and round-trip tests. */
  def corrupt(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), Cp1252)
}
