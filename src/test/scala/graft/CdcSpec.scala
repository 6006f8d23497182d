package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CdcExpressions

/** Content-defined chunking (c4): the property it exists for — boundary
  * stability under edits — plus losslessness, the maxLen backstop, and
  * short-input contracts. The c4 oracle proves engine-replay; this proves
  * the SEMANTICS. */
class CdcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def chunksOf(s: String, maxLen: Int = 192): Seq[String] =
    Seq(Tuple1(s)).toDF("t")
      .select(CdcExpressions.cdc_chunks(col("t"), 5, 64L, maxLen))
      .head().getSeq[String](0)

  private val rnd = new scala.util.Random(11)
  private val words = Seq("spark", "table", "join", "scan", "merge", "row",
    "fast", "batch", "value", "key", "agg", "window")
  private val base = Seq.fill(400)(words(rnd.nextInt(words.length))).mkString(" ")

  test("chunks re-concatenate to the original text, every chunk within maxLen") {
    val ch = chunksOf(base)
    assert(ch.mkString == base, "CDC is a lossless partition")
    assert(ch.forall(_.length <= 192), "maxLen backstop respected")
    assert(ch.length > 5, s"fixture should split into many chunks (got ${ch.length})")
  }

  test("an edit near the front leaves downstream boundaries in place (the CDC property)") {
    val edited = base.substring(0, 25) + "INSERTED EDIT " + base.substring(25)
    val a = chunksOf(base).toSet
    val b = chunksOf(edited).toSet
    val sharedCdc = (a intersect b).size
    // fixed-width chunking of the same pair shares almost nothing: every
    // boundary after the insertion shifts by the edit length
    def fixed(s: String) = s.grouped(64).toSet
    val sharedFixed = (fixed(base) intersect fixed(edited)).size
    assert(sharedCdc >= a.size / 2,
      s"CDC must preserve most chunks across the edit ($sharedCdc of ${a.size})")
    assert(sharedCdc > sharedFixed,
      s"CDC ($sharedCdc) must beat fixed-width ($sharedFixed) on shared chunks")
  }

  test("short inputs: empty -> no chunks; below-k text -> one chunk") {
    assert(chunksOf("").isEmpty)
    assert(chunksOf("ab") == Seq("ab"))
  }

  test("boundary-free runs split at exact maxLen offsets") {
    // a 5-char period-1 run has ONE distinct k-gram hash; if it is not
    // ≡ 0 (mod 64) the whole run is boundary-free and only the backstop
    // cuts — verify the premise from the kernel's own constants, then
    // the exact-width consequence
    val gram = ("q" * 5).codePoints.toArray.foldLeft(0L)((a, c) =>
      (a * graft.functions.WinnowExpressions.HashBase + c) %
        graft.functions.WinnowExpressions.HashMod)
    assume(gram % 64 != 0, "fixture char collides with the divisor")
    val ch = chunksOf("q" * 1000, maxLen = 100)
    assert(ch.length == 10 && ch.forall(_.length == 100))
  }

  test("callable from SQL via the extension registry") {
    // the GraftExtensionsSpec session dance: new session on the SHARED
    // context (never stop it), active/default restored after
    spark // force the shared context
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = ext.sql("SELECT cdc_chunks('hello world, hello graft', 5, 64, 192) AS c")
        .head().getSeq[String](0)
      assert(got.mkString == "hello world, hello graft")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
