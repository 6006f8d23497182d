package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering

/** Behavioral properties of the replayable Lloyd k-means + SemDeDup: the
  * oracle (k1/k2/k3) proves engine-equivalence; this proves the clustering
  * actually clusters and the dedup actually drops the planted duplicates. */
class ClusteringSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // Two tight blobs far apart + ids interleaved so the seeds (lowest ids)
  // start one-per-blob, plus a planted near-identical pair inside blob A.
  private def blob(center: Float, ids: Seq[Long]): Seq[(Long, Array[Float])] =
    ids.zipWithIndex.map { case (id, i) =>
      (id, Array.tabulate(8)(j => center + (if (j == i % 8) 0.01f else 0f)))
    }
  private def corpus = (blob(1f, Seq(0L, 2L, 4L, 6L)) ++ blob(-1f, Seq(1L, 3L, 5L, 7L)) ++
    Seq((8L, Array.fill(8)(1f)), (9L, Array.fill(8)(1.0001f))))
    .toDF("vec_id", "embedding")

  test("fit + assign separates the blobs and is deterministic") {
    val m = Clustering.fit(corpus, "embedding", "vec_id", k = 2, iters = 2)
    val a = Clustering.assign(corpus, "embedding", m)
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    val blobA = Seq(0L, 2L, 4L, 6L, 8L, 9L).map(a)
    val blobB = Seq(1L, 3L, 5L, 7L).map(a)
    assert(blobA.distinct.size == 1, "blob A lands in one cluster")
    assert(blobB.distinct.size == 1, "blob B lands in one cluster")
    assert(blobA.head != blobB.head, "blobs get different clusters")
    val m2 = Clustering.fit(corpus, "embedding", "vec_id", k = 2, iters = 2)
    assert(m.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("assign breaks exact-tie distances toward the lower centroid index") {
    val m = Clustering.Model(Array(Array.fill(8)(0.5), Array.fill(8)(0.5)))
    val ids = Clustering.assign(corpus, "embedding", m)
      .select("cluster_id").distinct().as[Long].collect().toSeq
    assert(ids == Seq(0L))
  }

  test("an empty cluster keeps its previous centroid through fit") {
    // ALL vectors identical: both seeds coincide, every point is distance 0
    // to both centroids and tie-breaks to cluster 0 — cluster 1 is
    // genuinely empty in EVERY round (the mean of identical vectors is
    // exact, so centroid 0 never moves and nothing re-attracts to 1), and
    // only the keep-previous-centroid fallback can leave centroid 1
    // well-formed.
    val shared = Array.tabulate(8)(j => 1f + 0.02f * j)
    val df = Seq.tabulate(4)(i => (i.toLong, shared)).toDF("vec_id", "embedding")
    val m = Clustering.fit(df, "embedding", "vec_id", k = 2, iters = 2)
    assert(m.centroids(1).forall(v => !v.isNaN), "no NaN from an empty mean")
    assert(m.centroids(1).toSeq == shared.map(_.toDouble).toSeq,
      "empty cluster keeps its seed centroid verbatim")
    // and nothing was ever assigned to it
    val a = Clustering.assign(df, "embedding", m)
      .select("cluster_id").distinct().as[Long].collect().toSeq
    assert(a == Seq(0L))
  }

  test("semDedup drops the planted near-identical vector, keeps the rest") {
    val m = Clustering.fit(corpus, "embedding", "vec_id", k = 2, iters = 2)
    val flags = Clustering.semDedup(Clustering.assign(corpus, "embedding", m),
      "embedding", "vec_id", threshold = 0.9999999)
      .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(flags(9L), "higher-id twin is the duplicate")
    assert(!flags(8L), "lower-id twin is the keeper")
    assert(Seq(0L, 1L, 2L, 3L).forall(id => !flags(id)))
  }

  test("assign at k=512: plan size is O(1) in k, result matches brute force") {
    // the SemDeDup operating point is k ∝ n (the paper runs k=50k); the
    // broadcast-codebook expression must keep the PLAN constant-sized as k
    // grows — a literal-per-centroid plan is multi-MB at k=512 and stops
    // Janino-compiling long before 50k
    val rnd = new scala.util.Random(7)
    val dim = 16
    val cents = Array.fill(512)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val vecs = Seq.tabulate(200)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val assigned = Clustering.assign(df, "embedding", Clustering.Model(cents))
    val planChars = assigned.queryExecution.executedPlan.toString.length
    assert(planChars < 20000, s"assign plan grew with k ($planChars chars)")
    val got = assigned.select("vec_id", "cluster_id", "dist")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    vecs.foreach { case (id, v) =>
      // same arithmetic the expression specifies: left-to-right double fold
      val dists = cents.map { c =>
        var s = 0.0; var j = 0
        while (j < dim) { val d = v(j).toDouble - c(j); s += d * d; j += 1 }
        s
      }
      val bi = dists.indices.minBy(i => (dists(i), i))
      assert(got(id) == ((bi.toLong, dists(bi))), s"row $id mismatch")
    }
  }

  test("the model owns ONE codebook broadcast: reused across assigns, revivable after destroy") {
    val m = Clustering.Model(Array(Array(0.0, 0.0), Array(10.0, 10.0)))
    val df = Seq((1L, Array(0.1f, 0.1f)), (2L, Array(9.9f, 9.9f))).toDF("vec_id", "embedding")
    def run() = Clustering.assign(df, "embedding", m)
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(run() == Map(1L -> 0L, 2L -> 1L))
    val first = m.codebook(df)
    run()
    assert(m.codebook(df) eq first,
      "a second assign must reuse the same broadcast block, not accumulate another")
    m.destroy()
    m.destroy() // idempotent
    assert(run() == Map(1L -> 0L, 2L -> 1L), "assign after destroy re-broadcasts lazily")
    assert(!(m.codebook(df) eq first))
    m.destroy()
  }

  test("semDedup never pairs across clusters") {
    // the two blobs are anti-parallel (cosine == -1 across, ~1 within), so a
    // low threshold flags everything above the min id WITHIN each cluster
    // but nothing across.
    val m = Clustering.fit(corpus, "embedding", "vec_id", k = 2, iters = 2)
    val flags = Clustering.semDedup(Clustering.assign(corpus, "embedding", m),
      "embedding", "vec_id", threshold = 0.5)
      .select("vec_id", "cluster_id", "is_dup").as[(Long, Long, Boolean)].collect()
    val keepers = flags.filter(!_._3).map(_._1).sorted.toSeq
    assert(keepers == Seq(0L, 1L), "one keeper per cluster: the min id")
  }

  test("Davies-Bouldin pieces: hand-computed scatter and ratio on planted separated clusters") {
    // cluster A: (±1, 0, ...) around centroid (0,0,...); cluster B the
    // same shape shifted by +10 on dim 0 -> scatter 1.0 each, centroid
    // distance 10, DB ratio (1+1)/10 = 0.2 for BOTH clusters, exactly.
    def v(x: Float): Array[Float] = x +: Array.fill(7)(0f)
    val pts = Seq((1L, v(1f)), (2L, v(-1f)), (3L, v(11f)), (4L, v(9f)))
      .toDF("vec_id", "embedding")
    val m = Clustering.fit(pts, "embedding", "vec_id", k = 2, iters = 2)
    val s = Clustering.assign(pts, "embedding", m)
      .groupBy("cluster_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("size"),
        org.apache.spark.sql.functions.avg(
          org.apache.spark.sql.functions.sqrt($"dist")).as("scatter"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(s.map(_._2).toSeq == Seq(2L, 2L), "two balanced clusters")
    assert(s.forall(r => math.abs(r._3 - 1.0) < 1e-9), s"unit scatter: ${s.toSeq}")
    val c = m.centroids
    val dij = math.sqrt(c(0).zip(c(1)).map { case (a, b) => (a - b) * (a - b) }.sum)
    assert(math.abs(dij - 10.0) < 1e-9, s"centroid distance 10: $dij")
    assert(math.abs((s(0)._3 + s(1)._3) / dij - 0.2) < 1e-9, "DB ratio 0.2")
  }

  test("dbscan: hand-planted chain + triangle at cos > 0.9, minPts 3 — " +
    "isolated core self-clusters, borders attach, noise reads -1") {
    // chain v1 - v2 - v3 (only v2 is core: the ends see one neighbor);
    // v4 orthogonal noise; v5/v6/v7 a tight core triangle
    val vs = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.95f, 0.312f)), (3L, Seq(0.81f, 0.586f)),
      (4L, Seq(0f, 1f)),
      (5L, Seq(-1f, 0f)), (6L, Seq(-1f, 0.02f)), (7L, Seq(-0.99f, -0.02f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.dbscan(vs, "vec_id", "embedding",
        simThreshold = 0.9, minPts = 3)
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(2L) == ((2L, "core", 2L)),
      "chain middle: core with NO core neighbor -> singleton cluster id 2")
    assert(out(1L) == ((1L, "border", 2L)))
    assert(out(3L) == ((1L, "border", 2L)))
    assert(out(4L) == ((0L, "noise", -1L)))
    Seq(5L, 6L, 7L).foreach { v =>
      assert(out(v) == ((2L, "core", 5L)),
        s"triangle member $v: core, min-id cluster 5")
    }
    // the scale arm: a covering candidate list (here: all pairs, as an
    // LSH blocker would over-supply) reproduces the exact clustering
    val cand = (1L to 7L).flatMap(a => (1L to 7L).map(b => (a, b)))
      .filter(p => p._1 < p._2).toDF("id_a", "id_b")
    val blocked = Clustering.dbscan(vs, "vec_id", "embedding",
        simThreshold = 0.9, minPts = 3, candidates = Some(cand))
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(blocked == out, "covering candidates == exact all-pairs arm")

    // r13 ADVICE regression: an LSH-style blocker emits the same pair
    // from several bands and in EITHER orientation — duplicates must not
    // inflate degrees (wrongly promoting points to core) and
    // (bigger, smaller) pairs must not be dropped. Feed every pair
    // reversed AND duplicated: the clustering must be identical.
    val messy = (1L to 7L).flatMap(a => (1L to 7L).map(b => (a, b)))
      .filter(p => p._1 != p._2)
    val dirty = (messy ++ messy ++ messy.map(p => (p._2, p._1)))
      .toDF("id_a", "id_b")
    val fromDirty = Clustering.dbscan(vs, "vec_id", "embedding",
        simThreshold = 0.9, minPts = 3, candidates = Some(dirty))
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(fromDirty == out,
      "duplicated/reversed candidates must normalize to the same clustering")
  }

  test("ivfCandidates: probes = k is a guaranteed covering (blocked dbscan " +
    "== exact); probes = 1 cores are a subset (degree monotonicity)") {
    // two tight triangles on opposite sides + one orthogonal outlier —
    // Voronoi cells at k=2 separate the triangles cleanly
    val vs = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0.99f, 0.1f, 0f)), (3L, Seq(0.99f, -0.1f, 0f)),
      (4L, Seq(-1f, 0f, 0f)), (5L, Seq(-0.99f, 0.1f, 0f)), (6L, Seq(-0.99f, -0.1f, 0f)),
      (7L, Seq(0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val exact = Clustering.dbscan(vs, "vec_id", "embedding",
        simThreshold = 0.9, minPts = 3)
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(exact(1L)._2 == "core" && exact(4L)._2 == "core" &&
      exact(7L)._2 == "noise" && exact(1L)._3 != exact(4L)._3,
      s"fixture sanity: two separate core triangles + noise: $exact")
    // probes = k: every point joins every list -> all pairs co-occur
    val covering = Clustering.ivfCandidates(vs, "vec_id", "embedding",
      k = 2, iters = 1, probes = 2, simThreshold = 0.9)
    val blocked = Clustering.dbscan(vs, "vec_id", "embedding",
        simThreshold = 0.9, minPts = 3, candidates = Some(covering))
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(blocked == exact, "probes = k covering must reproduce exact dbscan")
    // probes = 1: candidates are a subset of all pairs, so degrees can
    // only drop — every blocked core must also be an exact core
    val narrow = Clustering.ivfCandidates(vs, "vec_id", "embedding",
      k = 2, iters = 1, probes = 1, simThreshold = 0.9)
    val narrowed = Clustering.dbscan(vs, "vec_id", "embedding",
        simThreshold = 0.9, minPts = 3, candidates = Some(narrow))
      .as[(Long, Long, String, Long)].collect()
    narrowed.filter(_._3 == "core").foreach { r =>
      assert(exact(r._1)._2 == "core",
        s"blocked core ${r._1} is not an exact core — degrees inflated")
      assert(r._2 <= exact(r._1)._1,
        s"blocked degree of ${r._1} exceeds the exact degree")
    }
    // and on THIS fixture the two triangles are Voronoi-separated, so
    // probes = 1 already recovers the exact clustering
    assert(narrowed.map(r => r._1 -> ((r._2, r._3, r._4))).toMap == exact)
  }

  test("elbowReport: a genuinely 4-clustered corpus bends the curve at " +
    "k=4 and the second-difference rule finds it; ladder guards raise") {
    // 4 tight planted blobs at square corners, ids interleaved so the
    // k lowest-id seeds spread one-per-blob
    val pts = (0L until 40L).map { i =>
      val c = (i % 4).toInt
      val (cx, cy) = Seq((0f, 0f), (10f, 0f), (0f, 10f), (10f, 10f))(c)
      (i, Array(cx + 0.01f * (i / 4), cy - 0.01f * (i / 4)))
    }.toDF("vec_id", "embedding")
    val out = graft.operators.Clustering
      .elbowReport(pts, "embedding", "vec_id", ks = Seq(2, 4, 8), iters = 2)
      .as[(Long, Long, Option[Long], Option[Long], Boolean)]
      .collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(2L, 4L, 8L))
    val byK = out.map(r => r._1 -> r).toMap
    assert(byK(4L)._5, "the knee sits at the true cluster count")
    assert(!byK(2L)._5 && !byK(8L)._5)
    assert(byK(4L)._3.get > 100 * byK(8L)._3.get,
      "the k=2->4 drop dwarfs the k=4->8 drop: a real elbow")
    assert(byK(4L)._2 < byK(2L)._2 / 100,
      "at the true k the blobs collapse to near-zero inertia")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Clustering.elbowReport(pts, "embedding", "vec_id",
        ks = Seq(4, 2, 8), iters = 2)
    }
    assert(e1.getMessage.contains("sorted, distinct, positive"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Clustering.elbowReport(pts, "embedding", "vec_id",
        ks = Seq(2, 4), iters = 2)
    }
    assert(e2.getMessage.contains(">= 3 candidate ks"))
  }
}
