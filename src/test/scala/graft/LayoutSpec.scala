package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order layout properties: the Morton fold matches a reference bit
  * interleave, and bucketing actually bounds BOTH dimensions per bucket
  * (the pruning geometry the operator exists for). */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    }

  test("zkey2 equals the reference interleave over a key grid") {
    val grid = for (a <- 0L to 20L; b <- 0L to 20L) yield (a, b)
    val out = grid.toDF("a", "b")
      .withColumn("z", Layout.zkey2(col("a"), col("b"), 8))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, z) => assert(z == mortonRef(a, b, 8), s"($a,$b)") }
  }

  test("zkey2 is monotone-compatible: equal keys collide, neighbors stay close") {
    val z00 = mortonRef(0, 0, 8); val z11 = mortonRef(1, 1, 8)
    assert(z00 == 0 && z11 == 3, "low keys produce low z-keys")
  }

  test("byteRank maps min->0, max->255, and stays within byte range") {
    val out = Seq(7L, 100L, 1000L, 2007L).toDF("x")
      .withColumn("r", Layout.byteRank("x", 7L, 2007L))
      .select("r").as[Long].collect().toSeq
    assert(out.head == 0L && out.last == 255L)
    assert(out.forall(r => r >= 0 && r <= 255))
  }

  test("zorderBuckets bounds both dimensions within every bucket") {
    val rows = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val stats = Layout.zorderBuckets(rows.toDF("a", "b"), "a", "b",
        bits = 6, log2Buckets = 4)
      .groupBy("bucket")
      .agg(min("a").as("amin"), max("a").as("amax"),
        min("b").as("bmin"), max("b").as("bmax"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(stats.length == 16)
    // 16 buckets over a 64x64 grid -> each bucket spans a 16x16 quadrant
    stats.foreach { case (_, amin, amax, bmin, bmax) =>
      assert(amax - amin <= 15 && bmax - bmin <= 15)
    }
  }

  test("hilbert index is a bijection on the full grid") {
    val bits = 4 // 16x16 grid, 256 cells
    val grid = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val ds = grid.toDF("a", "b")
      .withColumn("h", Layout.hilbertKey2(col("a"), col("b"), bits))
      .as[(Long, Long, Long)].collect()
    assert(ds.map(_._3).toSet == (0L until 256L).toSet, "not a bijection")
  }

  test("hilbert consecutive indices are ALWAYS grid-adjacent (Morton is not)") {
    val bits = 4
    val grid = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    def walk(key: (Long, Long) => Long): Seq[(Long, Long)] =
      grid.map { case (a, b) => (key(a, b), a, b) }.sortBy(_._1).map(t => (t._2, t._3))
    val hWalk = walk((a, b) => graft.functions.LayoutExpressions.hilbertXy2d(a, b, bits))
    val hJumps = hWalk.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1 }
    assert(hJumps == 0, s"hilbert walk has $hJumps non-adjacent steps")
    val mWalk = walk((a, b) => mortonRef(a, b, bits))
    val mJumps = mWalk.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1 }
    assert(mJumps > 0, "morton should seam-jump somewhere — sanity of the comparison")
  }

  test("hilbert buckets bound at least as tightly as morton on clustered data") {
    // the locality claim, measured: total per-bucket bbox area over a
    // correlated key distribution (the layout operator's target workload)
    val rnd = new scala.util.Random(31)
    val rows = (1 to 4000).map { _ =>
      val a = rnd.nextInt(256).toLong
      val b = math.min(255L, math.max(0L, a + rnd.nextInt(41) - 20))
      (a, b)
    }
    val df = rows.toDF("a", "b")
    def area(frame: org.apache.spark.sql.DataFrame): Long =
      frame.groupBy("bucket")
        .agg(((max("a") - min("a") + 1) * (max("b") - min("b") + 1)).as("ar"))
        .agg(sum("ar")).as[Long].collect().head
    val hil = area(Layout.hilbertBuckets(df, "a", "b", bits = 8, log2Buckets = 4))
    val mor = area(Layout.zorderBuckets(df, "a", "b", bits = 8, log2Buckets = 4))
    assert(hil <= mor, s"hilbert bbox area $hil should be <= morton $mor")
  }

  test("round-8 kernel expressions compile under CODEGEN_ONLY (no silent fallback)") {
    // same guard as VectorExpressionsSpec: Janino errors in doGenCode must
    // FAIL here, not degrade silently to interpreted eval
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s2.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    locally {
      import s2.implicits._
      val df = Seq((3L, 5L, "abcdefghij klmno")).toDF("a", "b", "t").repartition(1)
      val out = df.select(
        Layout.hilbertKey2(col("a"), col("b"), 8).as("h"),
        graft.functions.WinnowExpressions.winnowFingerprints(col("t"), 5, 16).as("w"))
        .as[(Long, Seq[Long])].collect().head
      assert(out._1 == graft.functions.LayoutExpressions.hilbertXy2d(3L, 5L, 8))
      assert(out._2.nonEmpty)
    }
  }

  test("compactionPlan: hand-traced FFD groups; singleton group reverts " +
    "to keep; big files keep with NULL group; guards are loud") {
    val files = Seq(
      // p1, threshold 100 / target 120: FFD desc = 90→b0, 80→b1,
      // 30→b0 (120), 25→b1 (105) — two 2-file rewrite groups
      ("p1", 1L, 90L), ("p1", 2L, 80L), ("p1", 3L, 30L), ("p1", 4L, 25L),
      ("p2", 5L, 60L),   // alone in its bin: pointless rewrite, keeps
      ("p1", 6L, 150L)   // already compacted tier
    ).toDF("part", "file_id", "bytes")
    val out = graft.operators.Layout
      .compactionPlan(files, "part", "file_id", "bytes",
        targetBytes = 120L, smallBytes = 100L)
      .as[(String, Long, Long, String, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._2 -> r).toMap
    assert(out(1L) == (("p1", 1L, 90L, "compact", Some(0L), Some(2L), Some(120L))))
    assert(out(3L) == (("p1", 3L, 30L, "compact", Some(0L), Some(2L), Some(120L))))
    assert(out(2L) == (("p1", 2L, 80L, "compact", Some(1L), Some(2L), Some(105L))))
    assert(out(4L) == (("p1", 4L, 25L, "compact", Some(1L), Some(2L), Some(105L))))
    assert(out(5L) == (("p2", 5L, 60L, "keep", None, None, None)),
      "singleton rewrite group reverted to keep")
    assert(out(6L) == (("p1", 6L, 150L, "keep", None, None, None)))
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Layout.compactionPlan(files, "part", "file_id",
        "bytes", targetBytes = 100L, smallBytes = 200L)
    }
    assert(e1.getMessage.contains("smallBytes <= targetBytes"))
    val e2 = intercept[Exception] {
      graft.operators.Layout.compactionPlan(
        Seq(("p", 1L, 0.5)).toDF("part", "file_id", "bytes"),
        "part", "file_id", "bytes", 120L, 100L)
    }
    assert(e2.getMessage.contains("integral"))
  }

  test("gcPlan: all six statuses by hand; manifest wins over a stray " +
    "tombstone (re-add); duplicate actions collapse; only expired+orphan " +
    "reclaim") {
    // cutoff = 100. Files:
    //  1 live (listed+manifest), 2 expired (tomb 90), 3 retained (tomb
    //  110), 4 orphan (no logs, modified 80), 5 grace (modified 120),
    //  6 missing (manifest only), 7 re-add (manifest + stray tomb 50 ->
    //  live), 8 duplicate tombs (40, 110) -> latest wins -> retained
    val listing = Seq((1L, 10L, 50L), (2L, 20L, 50L), (3L, 30L, 50L),
      (4L, 40L, 80L), (5L, 50L, 120L), (7L, 70L, 50L), (8L, 80L, 50L))
      .toDF("file_id", "bytes", "modified_s")
    val manifest = Seq(1L, 6L, 7L, 1L).toDF("file_id") // dup 1 collapses
    val tombs = Seq((2L, 90L), (3L, 110L), (7L, 50L), (8L, 40L),
      (8L, 110L)).toDF("file_id", "removed_s")
    val out = graft.operators.Layout.gcPlan(listing, manifest, tombs,
        "file_id", "bytes", "modified_s", "removed_s", cutoffEpochS = 100L)
      .as[(Long, Option[Long], Option[Long], Option[Long], String, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.size == 8, "one plan row per listed-or-manifest file")
    assert(out(1L)._5 == "live" && !out(1L)._6)
    assert(out(2L)._5 == "expired" && out(2L)._6)
    assert(out(3L)._5 == "retained" && !out(3L)._6)
    assert(out(4L)._5 == "orphan" && out(4L)._6)
    assert(out(5L)._5 == "grace" && !out(5L)._6)
    assert(out(6L) == ((6L, None, None, None, "missing", false)),
      "manifest corruption surfaces as a loud undeletable row")
    assert(out(7L)._5 == "live" && !out(7L)._6,
      "re-added file stays live despite the stray tombstone")
    assert(out(8L)._4.contains(110L) && out(8L)._5 == "retained",
      "latest remove action wins")
    val bad = intercept[Exception] {
      graft.operators.Layout.gcPlan(
        Seq((1L, 0.5, 1L)).toDF("file_id", "bytes", "modified_s"),
        manifest, tombs, "file_id", "bytes", "modified_s", "removed_s", 1L)
    }
    assert(bad.getMessage.contains("integral"))
  }
}
