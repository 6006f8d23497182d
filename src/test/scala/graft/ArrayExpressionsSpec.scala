package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ArrayExpressions
import graft.operators.Dedup

/** Properties of the codegen'd two-pointer position-removal expression that
  * [[Dedup.removeDupSpans]] rebuilds documents with — equivalence against
  * the naive array-membership HOF it replaced, codegen compilation under
  * CODEGEN_ONLY, and the long-doc shape the HOF was quadratic in. */
class ArrayExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("equivalent to the naive membership filter on random inputs") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).map { i =>
      val n = rnd.nextInt(40)
      val toks = Seq.fill(n)(rnd.alphanumeric.take(3).mkString)
      // random covered set: sorted, may be empty, may include duplicates
      // and out-of-range entries (both must be tolerated/ignored)
      val pos = Seq.fill(rnd.nextInt(20))(rnd.nextInt(n + 5).toLong)
        .sorted
      (i.toLong, toks, pos)
    }
    val df = rows.toDF("id", "tk", "covered")
    val got = df.select(col("id"),
      ArrayExpressions.removeAtSortedPositions(col("tk"), col("covered")).as("kept"))
      .as[(Long, Seq[String])].collect().toMap
    rows.foreach { case (id, toks, pos) =>
      val want = toks.zipWithIndex.collect { case (t, j) if !pos.contains(j.toLong) => t }
      assert(got(id) == want, s"row $id diverged from the naive filter")
    }
  }

  test("null-strict: null tokens array or null positions array -> null") {
    val df = Seq(
      (1L, Some(Seq("a", "b")), None: Option[Seq[Long]]),
      (2L, None: Option[Seq[String]], Some(Seq(0L)))
    ).toDF("id", "tk", "covered")
    val out = df.select(col("id"),
      ArrayExpressions.removeAtSortedPositions(col("tk"), col("covered")).as("kept"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> true, 2L -> true))
  }

  test("compiles under CODEGEN_ONLY (no silent interpreted fallback)") {
    // scoped to a child session so the forced factory mode can never leak
    // into suites sharing this JVM (the conf is session-local state)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s2.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    val df = s2.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        1L, Seq("a", "b", "c", "d"), Seq(1L, 3L))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id bigint, tk array<string>, covered array<bigint>")).repartition(1)
    val sel = df.select(
      ArrayExpressions.removeAtSortedPositions(col("tk"), col("covered")).as("kept"))
    assert(sel.queryExecution.executedPlan.toString.contains("remove_at_sorted_positions"),
      "projection was folded at optimization time - codegen never ran")
    assert(sel.as[Seq[String]].head() == Seq("a", "c"))
  }

  test("fully-covered 100k-token doc is linear, not quadratic") {
    // the replaced HOF was O(n_tokens x n_covered): at 100k tokens fully
    // covered that is 1e10 interpreted comparisons (minutes in one task);
    // the two-pointer sweep finishes in seconds even with generous slack
    val tok = (0 until 100000).map(i => s"t${i % 50}").mkString(" ")
    val docs = Seq((1L, tok), (2L, s"prefix $tok")).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = Dedup.removeDupSpans(docs, "doc_id", "text")
      .select("id", "n_removed").as[(Long, Long)].collect().toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out(2L) == 100000L, "non-owner loses every covered position")
    assert(out(1L) == 0L, "min-id owner untouched")
    assert(secs < 120.0, f"fully-covered long doc took $secs%.1f s - quadratic regression?")
  }
}
