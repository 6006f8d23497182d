package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Folders, Mutations, Padding, Serving}

/** Semantics specs for folder-tree ops (L7), upsert/delete (S13/S14),
  * padding grouping (Q9), and serving helpers. */
class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  def emptyFolders = Seq.empty[(String, String, String, String, Int)]
    .toDF("app_id", "full_path", "name", "parent_id", "depth")
    .withColumn("id", lit(null).cast("string"))
    .withColumn("document_ids", lit(null).cast("array<string>"))

  test("ensurePath creates all missing ancestors exactly once") {
    val f1 = Folders.ensurePath(emptyFolders, "app1", "/a/b/c")
    assert(f1.select("full_path").as[String].collect().sorted.toSeq ==
      Seq("/a", "/a/b", "/a/b/c"))
    // idempotent + sibling reuses ancestors
    val f2 = Folders.ensurePath(f1, "app1", "/a/b/d")
    assert(f2.count() == 4)
    val f3 = Folders.ensurePath(f2, "app2", "/a")
    assert(f3.filter($"app_id" === "app2").count() == 1) // app-scoped
  }

  test("moveSubtree re-paths descendants and recomputes depth; rename = move") {
    val f = Folders.ensurePath(emptyFolders, "a", "/x/y/z")
    val moved = Folders.moveSubtree(f, "a", "/x/y", "/q/y")
    val paths = moved.select("full_path").as[String].collect().toSet
    assert(paths == Set("/x", "/q/y", "/q/y/z"))
    val renamed = Folders.rename(f, "a", "/x/y", "w")
    assert(renamed.select("full_path").as[String].collect().toSet ==
      Set("/x", "/x/w", "/x/w/z"))
    val deleted = Folders.deleteSubtree(f, "a", "/x/y")
    assert(deleted.select("full_path").as[String].collect().toSeq == Seq("/x"))
  }

  test("add/removeDocument maintain the id list") {
    val f = Folders.ensurePath(emptyFolders, "a", "/x")
    val id = f.select("id").as[String].head()
    val added = Folders.addDocument(Folders.addDocument(f, id, "d1"), id, "d1")
    assert(added.select("document_ids").as[Seq[String]].head() == Seq("d1"))
    val removed = Folders.removeDocument(added, id, "d1")
    assert(removed.select("document_ids").as[Seq[String]].head().isEmpty)
  }

  test("upsert replaces matched keys and inserts new ones") {
    val base = Seq((1L, "old", "a"), (2L, "keep", "b")).toDF("id", "v", "w")
    val updates = Seq((1L, "new", "a2"), (3L, "ins", "c")).toDF("id", "v", "w")
    val out = Mutations.upsert(base, updates, "id")
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(out == Seq((1L, "new", "a2"), (2L, "keep", "b"), (3L, "ins", "c")))
  }

  test("mergeMetadata merges patch with patch-wins per key") {
    val docs = Seq((1L, Map("a" -> "1", "b" -> "2")), (2L, Map("a" -> "9")))
      .toDF("id", "metadata")
    val out = Mutations.mergeMetadata(docs, col("id") === 1L, Map("b" -> "20", "c" -> "3"))
      .orderBy("id").as[(Long, Map[String, String])].collect()
    assert(out(0)._2 == Map("a" -> "1", "b" -> "20", "c" -> "3"))
    assert(out(1)._2 == Map("a" -> "9"))
  }

  test("deleteCascade drops docs, chunks, and usage rows") {
    val docs = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "t")
    val chunks = Seq((1L, 0), (1L, 1), (2L, 0)).toDF("doc_id", "n")
    val usage = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "bytes")
    val r = Mutations.deleteCascade(docs, chunks, usage, Seq(1L))
    assert(r.documents.count() == 1 && r.chunks.count() == 1 && r.usage.count() == 1)
    assert(r.chunks.select("doc_id").as[Long].head() == 2L)
  }

  test("Padding.group: higher-scored main claims contested padding (reference order)") {
    val expanded = Seq(
      (1L, 2, 0.9, false), (1L, 4, 0.8, false), // mains at 2 and 4
      (1L, 1, 0.0, true), (1L, 3, 0.0, true), (1L, 5, 0.0, true)
    ).toDF("document_id", "chunk_number", "score", "is_padding")
    val g = Padding.group(expanded, padding = 1)
      .orderBy("main_chunk")
      .select("main_chunk", "member_chunks")
      .as[(Int, Seq[Int])].collect().toSeq
    // chunk 3 is reachable from both mains -> higher-scored main 2 claims it
    assert(g == Seq((2, Seq(1, 2, 3)), (4, Seq(4, 5))))
  }

  test("Padding.group claim order follows score, not distance (document_service.py:736)") {
    // mains at 2 (0.5) and 5 (0.9), padding 2: chunk 3 is NEARER to 2 but
    // the reference iterates mains in score order, so 5 claims it first
    val expanded = Seq(
      (1L, 2, 0.5, false), (1L, 5, 0.9, false),
      (1L, 3, 0.0, true), (1L, 4, 0.0, true), (1L, 6, 0.0, true), (1L, 1, 0.0, true)
    ).toDF("document_id", "chunk_number", "score", "is_padding")
    val g = Padding.group(expanded, padding = 2)
      .orderBy("main_chunk")
      .select("main_chunk", "member_chunks", "score")
      .as[(Int, Seq[Int], Double)].collect().toSeq
    assert(g == Seq((2, Seq(1, 2), 0.5), (5, Seq(3, 4, 5, 6), 0.9)))
  }

  test("Padding.isImageChunk: metadata flag wins over content sniff") {
    val rows = Seq(
      ("data:image/png;base64,x", Map.empty[String, String]),      // data URI -> image
      ("plain text", Map.empty[String, String]),                   // -> not
      ("plain text", Map("is_image" -> "true")),                   // flag wins
      ("data:image/png;base64,x", Map("is_image" -> "false"))      // flag wins
    ).toDF("content", "metadata")
    val out = rows.select(
      Padding.isImageChunk(col("content"), col("metadata")).as("img"))
      .as[Boolean].collect().toSeq
    assert(out == Seq(true, false, true, false))
  }

  test("oversample matches max(k, min(3k, 20))") {
    assert(Serving.oversample(3) == 9)
    assert(Serving.oversample(5) == 15)
    assert(Serving.oversample(10) == 20)
    assert(Serving.oversample(25) == 25)
  }

  test("contextualChunks prepends the doc-prefix context to every chunk") {
    val docs = Seq((1L, "abcdefghij" * 5)).toDF("doc_id", "text")  // 50 chars
    val rows = graft.operators.Chunker
      .contextualChunks(docs, "doc_id", "text", n = 20, overlap = 5, contextChars = 8)
      .orderBy("chunk_number")
      .select("chunk_number", "chunk").as[(Int, String)].collect().toSeq
    // stride 15, start bound len - overlap = 45: windows at 1, 16, 31
    assert(rows.map(_._1) == Seq(0, 1, 2))
    assert(rows.forall(_._2.startsWith("abcdefgh; ")))
    // chunk payload after the "ctx; " prefix is the raw window
    assert(rows.head._2 == "abcdefgh; " + ("abcdefghij" * 5).substring(0, 20))
    assert(rows.last._2 == "abcdefgh; " + ("abcdefghij" * 5).substring(30, 50))
  }

  test("saltedCollectList equals plain collect_list up to order, hot key split") {
    val df = ((1 to 500).map(i => ("hot", i)) ++ (1 to 5).map(i => ("cold", i)))
      .toDF("k", "v")
    val salted = graft.operators.Skew.saltedCollectList(df, Seq("k"), "v", salts = 8)
      .select("k", "values").as[(String, Seq[Int])].collect()
      .map { case (k, vs) => k -> vs.sorted }.toMap
    assert(salted("hot") == (1 to 500).toSeq)
    assert(salted("cold") == (1 to 5).toSeq)
    // first stage really splits the hot key across salts
    val stage1 = df.withColumn("__salt",
      pmod(spark_partition_id() + hash(col("v")), lit(8)))
      .groupBy("k", "__salt").count()
    assert(stage1.filter(col("k") === "hot").count() > 1)
  }

  test("filenameSearch: each of the three FTS OR-branches matches independently") {
    val docs = Seq(
      (1L, "annual_reports_2026.txt"),   // english: "reports" stems to "report"
      (2L, "weekly report draft.txt"),   // simple + english: exact raw token
      (3L, "misc-thereportfile.bin"),    // substring-only: inside a token run
      (4L, "unrelated_notes.txt"))
      .toDF("doc_id", "filename")
    def ids(q: String) = Serving.filenameSearch(docs, "filename", "doc_id", q, 10)
      .select("doc_id").as[Long].collect().toSet
    // stem match (1, 2) plus raw substring hit inside "thereportfile" (3)
    assert(ids("report") == Set(1L, 2L, 3L))
    // multi-token AND semantics: both lexemes must be present
    assert(ids("weekly reports") == Set(2L))
    // leading stopword is dropped by the english config, kept by simple
    // (which then can't match) and breaks the substring — stem matches only
    assert(ids("the reports") == Set(1L, 2L))
  }

  test("filenameSearch ranks by tf-saturating score then updated_at then id") {
    val docs = Seq(
      (1L, "report_report_reports.txt", "2026-01-02 00:00:00"),
      (2L, "report_summary.txt", "2026-01-03 00:00:00"),
      (3L, "report_digest.txt", "2026-01-01 00:00:00"))
      .toDF("doc_id", "filename", "u")
      .withColumn("updated_at", col("u").cast("timestamp"))
    val out = Serving.filenameSearch(docs, "filename", "doc_id", "reports", 10,
      updatedAtCol = Some("updated_at"))
      .select("doc_id").as[Long].collect().toSeq
    // doc1 tf=3 -> 0.075 beats tf=1 -> 0.05; docs 2,3 tie on rank, newer first
    assert(out == Seq(1L, 2L, 3L))
  }

  test("lang_quality_fast equals the Column lang_id/quality_score forms exactly") {
    import graft.functions.text
    val docs = Seq(
      (1L, "the cat and the dog sat on it and that is that"), // en-heavy
      (2L, "der Hund und die Katze ist nicht ein zu"),        // de-heavy
      (3L, "zzz qqq www"),                                    // no stopwords -> und
      (4L, ""),                                               // empty -> und, n=0
      (5L, "de la le et est un"),                             // es/fr tie -> first in order
      (6L, "  spaced   out   THE   and  ")                    // normalize matters
    ).toDF("doc_id", "text")
    val p = text.lang_quality_fast(text.normalize(col("text")))
    val fast = docs.select(col("doc_id"),
      p.getField("lang_guess").as("g"), p.getField("quality").as("q"))
      .as[(Long, String, Double)].collect().map { case (i, g, q) => i -> (g, q) }.toMap
    val slow = docs.select(col("doc_id"),
      text.lang_id(col("text")).as("g"), text.quality_score(col("text")).as("q"))
      .as[(Long, String, Double)].collect().map { case (i, g, q) => i -> (g, q) }.toMap
    // bit-exact: same stopword tables, same tie order, same double op order
    assert(fast == slow)
    assert(fast(3L)._1 == "und" && fast(4L)._1 == "und")
  }

  test("word_shingles_multi equals per-rung word_shingles exactly (one tokenize)") {
    import graft.functions.text
    val rungs = Seq(4, 8, 16, 32)
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),   // 16 tokens: rungs 4/8/16
      (2L, "x y z"),                              // shorter than every rung
      (3L, ""),                                   // empty
      (4L, "  Mixed   CASE  a b c d e f g h i j k l m n o p q r s t u v w x y z a2 b2 c2 d2 e2 f2")
    ).toDF("doc_id", "text")
    val multi = docs.select(col("doc_id"),
        explode(text.word_shingles_multi(col("text"), rungs)).as("rg"))
      .select(col("doc_id"), col("rg.rung"), col("rg.gs"))
      .as[(Long, Long, Seq[String])].collect()
      .map { case (d, r, gs) => (d, r) -> gs }.toMap
    rungs.foreach { n =>
      val single = docs.select(col("doc_id"),
          text.word_shingles(col("text"), n).as("gs"))
        .as[(Long, Seq[String])].collect().toMap
      single.foreach { case (d, gs) =>
        assert(multi((d, n.toLong)) == gs, s"doc $d rung $n diverges")
      }
    }
  }

  test("migrateIngest: skip keeps existing rows, fail throws on conflict (migrate.py)") {
    import graft.operators.Mutations
    val existing = Seq((1L, "old one"), (2L, "old two")).toDF("doc_id", "text")
    val incoming = Seq((2L, "migrated two"), (3L, "migrated three")).toDF("doc_id", "text")
    val (state, status) = Mutations.migrateIngest(existing, incoming, "doc_id")
    val st = status.as[(Long, String)].collect().toMap
    assert(st == Map(2L -> "skipped", 3L -> "created"))
    val texts = state.as[(Long, String)].collect().toMap
    assert(texts(2L) == "old two", "skip preserves the existing document")
    assert(texts(3L) == "migrated three")
    val ex = intercept[IllegalStateException] {
      Mutations.migrateIngest(existing, incoming, "doc_id", onConflict = "fail")
    }
    assert(ex.getMessage.contains("2"))
  }

  test("migrateIngest collapses within-batch duplicate ids: one row, one status") {
    import graft.operators.Mutations
    val existing = Seq((1L, "old")).toDF("doc_id", "text")
    val incoming = Seq((5L, "a"), (5L, "b"), (1L, "x"), (1L, "y"))
      .toDF("doc_id", "text")
    val (state, status) = Mutations.migrateIngest(existing, incoming, "doc_id")
    assert(state.filter($"doc_id" === 5L).count() == 1,
      "preserve-source-ids invariant holds for a duplicated incoming id")
    val st = status.as[(Long, String)].collect().toSeq.sorted
    assert(st.map(_._1) == Seq(1L, 5L), "exactly one status row per id")
    assert(st == Seq((1L, "skipped"), (5L, "created")))
  }

  test("trgm: pg_trgm trigram set matches the documented show_trgm example") {
    // Postgres docs: show_trgm('cat') = {"  c"," ca","at ","cat"}
    assert(Serving.trgmSet("cat") == Set("  c", " ca", "cat", "at "))
    // multi-word, punctuation-split, case-folded, de-duplicated
    assert(Serving.trgmSet("Cat-CAT") == Set("  c", " ca", "cat", "at "))
    // Column form agrees with the driver mirror on a mixed fixture
    val rows = Seq("Report_Q3-final.txt", "cat", "", "a")
      .toDF("s")
      .select(graft.operators.Serving.trgmColumn($"s").as("tg"))
      .as[Seq[String]].collect()
    assert(rows(0).toSet == Serving.trgmSet("Report_Q3-final.txt"))
    assert(rows(1).toSet == Serving.trgmSet("cat"))
    assert(rows(2).isEmpty)
    assert(rows(3).toSet == Serving.trgmSet("a"))
  }

  test("trgmSimilaritySearch: typo'd query ranks the near-name first; no-overlap docs absent") {
    val docs = Seq(
      (1L, "quarterly_report_2024.pdf"),
      (2L, "quartely_reprot_2024.pdf"), // two typos of doc 1's name
      (3L, "zzz_unrelated_xyz.bin"))
      .toDF("doc_id", "filename")
    val out = Serving.trgmSimilaritySearch(docs, "filename", "doc_id",
      "quarterly report 2024", k = 10)
      .select("id", "similarity").as[(Long, Double)].collect().toSeq
    assert(out.map(_._1).take(2) == Seq(1L, 2L),
      s"exact-ish name first, typo'd second: $out")
    assert(out.head._2 > out(1)._2 && out(1)._2 > 0.3)
    assert(!out.map(_._1).contains(3L), "zero-overlap doc never surfaces")
  }
}
